"""Serving subsystem: AOT-exported rollout bundles (serving/export.py) and
the continuous-batching online server (serving/server.py)."""

from molecular_dynamics_neural_operator_tpu.serving.export import (
    ServingBundle,
    export_rollout,
    load_bundle,
    save_bundle,
)
from molecular_dynamics_neural_operator_tpu.serving.server import (
    RolloutResult,
    RolloutServer,
)

__all__ = [
    "RolloutResult",
    "RolloutServer",
    "ServingBundle",
    "export_rollout",
    "load_bundle",
    "save_bundle",
]
