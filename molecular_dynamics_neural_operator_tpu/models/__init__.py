from molecular_dynamics_neural_operator_tpu.models.gkn import (
    DenseGraph,
    SparseGraph,
    GKNBatch,
    gkn_init,
    gkn_apply,
    gkn_apply_single,
)
from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel, lp_abs, mse

__all__ = [
    "DenseGraph",
    "SparseGraph",
    "GKNBatch",
    "gkn_init",
    "gkn_apply",
    "gkn_apply_single",
    "lp_rel",
    "lp_abs",
    "mse",
]
