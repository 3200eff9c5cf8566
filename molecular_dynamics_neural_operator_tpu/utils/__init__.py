from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    BestCheckpointer,
)
from molecular_dynamics_neural_operator_tpu.utils.metrics import (
    MetricLogger,
    format_epoch_line,
)

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "BestCheckpointer",
    "MetricLogger",
    "format_epoch_line",
]
