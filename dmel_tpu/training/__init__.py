"""L3 — training: jitted steps, grouped optimizers, checkpoints."""

from dmel_tpu.training.optim import build_optimizer, param_labels  # noqa: F401
from dmel_tpu.training.train import (  # noqa: F401
    fit,
    predict,
    make_train_step,
    make_eval_step,
    bce_loss,
    ce_loss,
    current_lambd,
)
from dmel_tpu.training.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    import_panns_cnn6,
)
