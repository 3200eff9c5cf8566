"""Named system presets for the benchmark configs in BASELINE.json.

The operator is size-generic (any residue count / edge capacity); these
presets pin the shapes for the systems the benchmark suite names:

1. BBA / 1FME (28 residues) — the reference's system,
2. Trp-cage (20 residues) and villin HP35 (35 residues) — fast folders for
   the 100-step free-rollout curriculum config,
3. a ~10k-atom solvated-system scale point — sparse mode with segment
   aggregation and the edge axis shardable over the mesh
   (parallel/edge_sharded.py), electrostatic features from
   preprocess.grid_jax or the APBS pipeline.

Edge capacities are sized at ~2x the contact count expected at 8 A for a
compact fold (~6-8 contacts/residue incl. self-loops).
"""

from __future__ import annotations

import dataclasses

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig

BBA = ModelConfig(num_residues=28, max_edges=384, graph_mode="dense")

BBA_SPARSE = dataclasses.replace(BBA, graph_mode="sparse")

TRP_CAGE = ModelConfig(num_residues=20, max_edges=256, graph_mode="dense",
                       predict_delta=True)

VILLIN = ModelConfig(num_residues=35, max_edges=512, graph_mode="dense",
                     predict_delta=True)

# ~10k atoms: dense (R^2 = 1e8 pairs) is out of the question; padded
# neighbor lists with segment aggregation, and the (E, w, w) kernel tensor
# (~1.3 GB bf16 at this capacity) shards over the mesh's "model" axis.
SOLVATED_10K = ModelConfig(
    num_residues=10_000,
    max_edges=160_000,  # ~16 neighbors/atom at a typical cutoff
    graph_mode="sparse",
    predict_delta=True,
    window_size=4,
)

PRESETS = {
    "bba": BBA,
    "bba_sparse": BBA_SPARSE,
    "trp_cage": TRP_CAGE,
    "villin": VILLIN,
    "solvated_10k": SOLVATED_10K,
}
