from .condition import ConditionerNetwork  # noqa: F401
from .score import ScoreNetwork  # noqa: F401
from .universe import Universe  # noqa: F401
from .universe_gan import UniverseGAN  # noqa: F401
from .presets import universe_original, universepp  # noqa: F401
