"""Minimal hydra stand-in: only ``hydra.utils.instantiate`` (see utils.py)."""
from . import utils  # noqa: F401
