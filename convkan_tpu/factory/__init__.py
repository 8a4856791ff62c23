from .conv_factory import CONV_KAN_FACTORY, l1_decay_of  # noqa: F401
from .mlp_factory import MLP_KAN_FACTORY  # noqa: F401
