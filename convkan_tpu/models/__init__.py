from .vgg import VGGKAN, vggkan, cfgs  # noqa: F401
