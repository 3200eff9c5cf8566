"""Serving subsystem: AOT-exported rollout bundles (see serving/export.py)."""

from molecular_dynamics_neural_operator_tpu.serving.export import (
    ServingBundle,
    export_rollout,
    load_bundle,
    save_bundle,
)

__all__ = [
    "ServingBundle",
    "export_rollout",
    "load_bundle",
    "save_bundle",
]
