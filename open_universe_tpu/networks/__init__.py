"""API-parity alias: open_universe_tpu.networks mirrors open_universe.networks."""
from . import universe  # noqa: F401
