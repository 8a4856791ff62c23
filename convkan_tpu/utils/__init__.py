from . import (activations, hub, initializers, norms,  # noqa: F401
               regularization, torch_compat, torch_export)
from .activations import ACTIVATIONS, resolve_activation  # noqa: F401
from .norms import NORM_LAYERS, make_norm, resolve_norm  # noqa: F401
