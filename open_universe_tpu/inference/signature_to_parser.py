"""Reflect model.enhance keyword arguments into argparse flags
(reference inference_utils/signature_to_parser.py)."""
from __future__ import annotations

import argparse
import typing

_SKIP = {"params", "mix", "key", "target", "return"}


def add_enhance_arguments(model, parser: argparse.ArgumentParser):
    if not (hasattr(model, "enhance") and callable(model.enhance)):
        raise ValueError("model does not have an `enhance` method")
    hints = typing.get_type_hints(model.enhance)
    defaults = getattr(model, "diff_kwargs", {}) or {}

    group = parser.add_argument_group("enhance", "Arguments of enhance function")
    for key, hint in hints.items():
        if key in _SKIP:
            continue
        types = typing.get_args(hint)
        cast = types[0] if types else hint
        if cast not in (int, float, str, bool):
            continue
        if cast is bool:
            group.add_argument(f"--{key}", default=defaults.get(key),
                               type=lambda s: s.lower() in ("1", "true", "yes"))
        else:
            group.add_argument(f"--{key}", default=defaults.get(key), type=cast)
    return parser
