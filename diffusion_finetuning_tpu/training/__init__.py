from .loss import loss_step  # noqa: F401
from .optim import (  # noqa: F401
    ParamGroup,
    adamw8bit,
    apply_ti_constraints,
    lr_schedule,
    multi_group_optimizer,
)
from .train_step import TrainablePartition, build_train_step, jit_train_step  # noqa: F401
