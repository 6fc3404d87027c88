"""API-parity alias: open_universe_tpu.layers mirrors open_universe.layers
(reference layers/__init__.py exports the dyn_range_comp transforms)."""
from .models.transforms import (  # noqa: F401
    CompressedMagSTFT,
    CompressedMagSTFTPadded,
    IdentityTransform,
)
