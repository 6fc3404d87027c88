from .norm import denormalize_batch, normalize_batch  # noqa: F401
from .random import center_truncated_normal  # noqa: F401
from .stats import signal_median  # noqa: F401
