from .module import (  # noqa: F401
    Module,
    ModuleDict,
    ModuleList,
    buffer_mask,
    count_parameters,
)
from .layers import GRU, Conv1d, ConvTranspose1d, LayerNorm, Linear, PReLU  # noqa: F401
from .blocks import (  # noqa: F401
    BinomialAntiAlias,
    ConvBlock,
    LinearProj,
    PReLUConv,
    binomial_filter,
    film,
)
from .sigma import SigmaBlock, SimpleTimeEmbedding  # noqa: F401
from .snake import AliasFreeSnake, Snake, resample  # noqa: F401
