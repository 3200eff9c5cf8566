from molecular_dynamics_neural_operator_tpu.ops.mlp import (
    mlp_init,
    mlp_apply,
    linear_init,
    linear_apply,
)
from molecular_dynamics_neural_operator_tpu.ops.lstm import (
    lstm_init,
    lstm_apply,
)
from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
    edge_conv_init,
    edge_kernel_matrices,
    edge_conv_dense,
    edge_conv_sparse,
    sparse_inv_degree,
)

__all__ = [
    "mlp_init",
    "mlp_apply",
    "linear_init",
    "linear_apply",
    "lstm_init",
    "lstm_apply",
    "edge_conv_init",
    "edge_kernel_matrices",
    "edge_conv_dense",
    "edge_conv_sparse",
    "sparse_inv_degree",
]
