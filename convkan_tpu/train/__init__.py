from .state import TrainState, create_train_state, make_optimizer, l1_penalty  # noqa: F401
from .metrics import (  # noqa: F401
    accuracy_from_cm, confusion_matrix, cross_entropy_loss, macro_prf1,
)
from .loop import (  # noqa: F401
    evaluate, make_eval_step, make_train_step, train_and_test_models,
    train_model_generic, write_results_csv,
)
from .checkpoint import (  # noqa: F401
    checkpoint_exists, restore_checkpoint, save_checkpoint,
)
from . import data  # noqa: F401
