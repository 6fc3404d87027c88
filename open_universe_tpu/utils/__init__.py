"""Core utilities (reference open_universe/utils/__init__.py surface).

``AutoClipper``/``FixedClipper``/``grad_norm`` live in train/optim (they are
part of the optimizer plumbing here) and are re-exported lazily to avoid a
package import cycle.
"""
from .norm import denormalize_batch, normalize_batch  # noqa: F401
from .params import (  # noqa: F401
    at_least_f32,
    count_parameters,
    count_parameters_per_level,
    pad_dim_right,
    to_device,
)
from .random import center_truncated_normal  # noqa: F401
from .stats import signal_median  # noqa: F401

_OPTIM_NAMES = {"AutoClipper": "AutoClipper", "FixedClipper": "FixedClipper",
                "grad_norm": "global_norm"}


def __getattr__(name):
    if name in _OPTIM_NAMES:
        from ..train import optim

        return getattr(optim, _OPTIM_NAMES[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
