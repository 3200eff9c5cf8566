from molecular_dynamics_neural_operator_tpu.preprocess.electrostatics import (
    trajectory_to_electrostatic_grid,
    parallel_trajectory_to_electrostatic_grid,
    render_apbs_input,
)
from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (
    debye_huckel_grid,
    batched_debye_huckel_grids,
)

__all__ = [
    "trajectory_to_electrostatic_grid",
    "parallel_trajectory_to_electrostatic_grid",
    "render_apbs_input",
    "debye_huckel_grid",
    "batched_debye_huckel_grids",
]
