from .conv import conv_nd, same_padding  # noqa: F401
from .std_conv import Conv, StdConvBlock  # noqa: F401
