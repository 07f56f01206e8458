from emsanet_tpu.training.lr_schedule import onecycle_lr  # noqa: F401
from emsanet_tpu.training.optim import get_optimizer  # noqa: F401
from emsanet_tpu.training.step import (  # noqa: F401
    TrainState,
    compute_losses,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from emsanet_tpu.training.checkpoint import (  # noqa: F401
    CheckpointHelper,
    load_checkpoint,
    save_checkpoint,
)
from emsanet_tpu.training.csv_logger import CSVLogger  # noqa: F401
