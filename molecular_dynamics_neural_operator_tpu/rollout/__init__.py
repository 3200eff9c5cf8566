from molecular_dynamics_neural_operator_tpu.rollout.scan import (
    rollout_scan,
    make_rollout_fn,
    rollout_python_loop,
    rollout_with_mse,
)

__all__ = [
    "rollout_scan",
    "make_rollout_fn",
    "rollout_python_loop",
    "rollout_with_mse",
]
