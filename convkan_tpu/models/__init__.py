from .vgg import VGGKAN, vggkan, cfgs  # noqa: F401
from .alexnet import AlexNetKAN, alexnet_kan  # noqa: F401
from .mobilenet import MobileNetV1KAN, mobilenet_v1_kan  # noqa: F401
from .mobilenetv2 import MobileNetV2KAN, mobilenet_v2_kan  # noqa: F401
from .mobilenetv3 import MobileNetV3KAN, mobilenet_v3_kan  # noqa: F401
from .efficientnet import efficientnet_kan, efficientnet_kan_small  # noqa: F401
from .efficientnetv2 import (  # noqa: F401
    EfficientNetV2KAN, efficientnetv2_kan, efficientnetv2_kan_small,
)
