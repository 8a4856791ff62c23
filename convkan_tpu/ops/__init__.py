from .conv import conv_nd, same_padding  # noqa: F401
from .std_conv import Conv, StdConvBlock  # noqa: F401
from .pooling import (  # noqa: F401
    FuzzyPooling, adaptive_avg_pool, avg_pool, fuzzy_pool, max_pool,
)
from .layers import DropPath, Linear, SqueezeExcitation  # noqa: F401
from .unfold_conv import unfold2d, unfold_conv2d  # noqa: F401
