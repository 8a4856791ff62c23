from .kan_conv import (  # noqa: F401
    FAMILIES,
    KanConvND,
    make_kan_conv,
    KANConv1DLayer, KANConv2DLayer, KANConv3DLayer,
    FastKANConv1DLayer, FastKANConv2DLayer, FastKANConv3DLayer,
    ChebyKANConv1DLayer, ChebyKANConv2DLayer, ChebyKANConv3DLayer,
    LegendreKANConv1DLayer, LegendreKANConv2DLayer, LegendreKANConv3DLayer,
    GRAMKANConv1DLayer, GRAMKANConv2DLayer, GRAMKANConv3DLayer,
    JacobiKANConv1DLayer, JacobiKANConv2DLayer, JacobiKANConv3DLayer,
    BersnsteinKANConv1DLayer, BersnsteinKANConv2DLayer, BersnsteinKANConv3DLayer,
    BesselKANConv1DLayer, BesselKANConv2DLayer, BesselKANConv3DLayer,
    FibonacciKANConv1DLayer, FibonacciKANConv2DLayer, FibonacciKANConv3DLayer,
    FourierKANConv1DLayer, FourierKANConv2DLayer, FourierKANConv3DLayer,
    GegenbauerKANConv1DLayer, GegenbauerKANConv2DLayer, GegenbauerKANConv3DLayer,
    HermiteKANConv1DLayer, HermiteKANConv2DLayer, HermiteKANConv3DLayer,
    LaguerreKANConv1DLayer, LaguerreKANConv2DLayer, LaguerreKANConv3DLayer,
    LucasKANConv1DLayer, LucasKANConv2DLayer, LucasKANConv3DLayer,
    ReLUKANConv1DLayer, ReLUKANConv2DLayer, ReLUKANConv3DLayer,
    TaylorKANConv1DLayer, TaylorKANConv2DLayer, TaylorKANConv3DLayer,
)
from .wav_conv import (  # noqa: F401
    WavKANConvND,
    WavKANConv1DLayer, WavKANConv2DLayer, WavKANConv3DLayer,
)
from .kan_linear import (  # noqa: F401
    KANLinear, FastKANLinear, ChebyKANLinear, LegendreKANLinear,
    GRAMKANLinear, JacobiKANLinear, BersnsteinKANLinear, BesselKANLinear,
    FibonacciKANLinear, FourierKANLinear, GegenbauerKANLinear,
    HermiteKANLinear, LaguerreKANLinear, LucasKANLinear, ReLUKANLinear,
    TaylorKANLinear, WavKANLinear,
)
from .mlp import KanMLP  # noqa: F401
