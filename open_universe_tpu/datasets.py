"""API-parity alias: open_universe_tpu.datasets mirrors open_universe.datasets."""
from .data.dataset import DataLoader, DataModule, NoisyDataset, collate  # noqa: F401
