"""
Training subsystem: optax/pjit loop, checkpoints, observability
(replaces the reference's Keras compile/fit path, SURVEY.md §2.5, §5).
"""
from .checkpoint import (  # noqa: F401
    get_best_checkpoint_path,
    initial_epoch_from_path,
    parse_checkpoint_value,
    restore_checkpoint,
    save_checkpoint,
)
from .loop import (  # noqa: F401
    Callback,
    EarlyStopping,
    LearningRateDateLogger,
    ModelCheckpoint,
    Trainer,
    TrainState,
    batches_from_dataset,
    signal_batches_from_dataset,
)
from .optimizers import optimizer_from_config, schedule_from_config  # noqa: F401
