from molecular_dynamics_neural_operator_tpu.ops.pallas.fused_gkn import (
    fused_edge_conv_stack,
    pallas_available,
)

__all__ = ["fused_edge_conv_stack", "pallas_available"]
