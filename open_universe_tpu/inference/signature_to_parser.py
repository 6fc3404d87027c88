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


def parse_with_enhance_args(parser: argparse.ArgumentParser, argv,
                            load_model):
    """Two-stage CLI parse shared by bin/enhance and bin/serve.

    Stage 1 parses the known flags (ignoring --help) to learn --model,
    loads it, reflects its ``enhance`` kwargs into the parser, then stage 2
    parses for real (re-appending --help so it lists the reflected flags).
    Returns (args, model, params, enhance_kwargs) where enhance_kwargs are
    the reflected flags the user actually set.
    """
    argv = list(argv)
    want_help = "-h" in argv or "--help" in argv
    pre, _ = parser.parse_known_args([a for a in argv
                                      if a not in ("-h", "--help")])
    model, params = load_model(pre.model)
    add_enhance_arguments(model, parser)
    if want_help:
        argv.append("--help")
    args = parser.parse_args(argv)
    groups = [g for g in parser._action_groups if g.title == "enhance"]
    enhance_kwargs = {}
    if groups:
        enhance_kwargs = {a.dest: getattr(args, a.dest)
                          for a in groups[0]._group_actions
                          if getattr(args, a.dest) is not None}
    return args, model, params, enhance_kwargs
