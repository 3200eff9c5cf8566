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
    langevin_trajectory,
    synthetic_trajectory,
    write_langevin_h5,
    write_synthetic_h5,
    write_synthetic_h5_streamed,
)
from molecular_dynamics_neural_operator_tpu.data.schema import (
    SchemaWarning,
    contact_maps_have_self_loops,
    detect_pointcloud_layout,
    normalize_amino_labels,
)

__all__ = [
    "TrajectoryData",
    "load_trajectory",
    "aminoacid_int_to_onehot",
    "WindowDataset",
    "batch_iterator",
    "langevin_trajectory",
    "synthetic_trajectory",
    "write_langevin_h5",
    "write_synthetic_h5",
    "write_synthetic_h5_streamed",
    "SchemaWarning",
    "contact_maps_have_self_loops",
    "detect_pointcloud_layout",
    "normalize_amino_labels",
]
