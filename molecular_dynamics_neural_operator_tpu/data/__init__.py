from molecular_dynamics_neural_operator_tpu.data.h5 import (
    TrajectoryData,
    load_trajectory,
    aminoacid_int_to_onehot,
)
from molecular_dynamics_neural_operator_tpu.data.windows import (
    WindowDataset,
    batch_iterator,
)
from molecular_dynamics_neural_operator_tpu.data.synthetic import (
    synthetic_trajectory,
    write_synthetic_h5,
    write_synthetic_h5_streamed,
)

__all__ = [
    "TrajectoryData",
    "load_trajectory",
    "aminoacid_int_to_onehot",
    "WindowDataset",
    "batch_iterator",
    "synthetic_trajectory",
    "write_synthetic_h5",
    "write_synthetic_h5_streamed",
]
