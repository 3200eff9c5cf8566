"""TPU-native neural-operator framework for protein molecular dynamics.

A ground-up JAX / XLA / Pallas / pjit re-design of the capabilities of
``ramanathanlab/molecular_dynamics_neural_operator`` (reference mounted at
``/root/reference``): a graph kernel network (GKN) neural operator over
C-alpha contact-map graphs, an FNO spectral variant, jit-compiled
autoregressive rollout (``lax.scan``, zero host round-trips), sharded
data-parallel training over a TPU mesh, HDF5 trajectory ingestion, and the
electrostatics preprocessing pipeline.

Layer map (bottom-up), mirroring SURVEY.md section 7:

- ``geometry``   on-device featurization: pairwise distances, contact maps,
                 dense + padded-sparse graph forms (replaces scipy
                 ``distance_matrix``/``coo_matrix`` in the reference's
                 ``graph_kernel.py:362-393`` and the per-edge Python loops
                 in ``dataset.py:194-201``).
- ``ops``        edge-conditioned graph convolution, kernel MLP, LSTM cell,
                 plus Pallas TPU kernels for the hot message-passing path.
- ``models``     GKN (``graph_kernel.py:245-309`` parity) and FNO operator
                 families, relative-Lp losses (``graph_kernel.py:75-122``).
- ``data``       HDF5 readers matching the reference schema
                 (``dataset.py:56-227``), window batching, synthetic data.
- ``train``      jitted train/eval steps, optax Adam + StepLR parity,
                 train/valid splits (``graph_kernel.py:38-72,445-493``).
- ``rollout``    jit ``lax.scan`` autoregressive rollout — the signature
                 capability (``graph_kernel.py:396-413``).
- ``parallel``   ``jax.sharding.Mesh`` / NamedSharding / shard_map data and
                 edge parallelism (replaces PyG ``DataParallel``).
- ``utils``      checkpoint save/restore/best, JSONL metrics, movies,
                 latent-space visualization.
- ``preprocess`` electrostatics pipeline (pdb2pqr/APBS orchestration,
                 ``preprocess.py:18-131`` parity) plus a TPU-native
                 Debye-Hueckel grid featurizer.
"""

__version__ = "0.1.0"

from molecular_dynamics_neural_operator_tpu import configs  # noqa: F401
