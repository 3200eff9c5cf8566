"""Test configuration: force the host CPU backend with 8 virtual devices.

Must run before any jax import. The environment pins JAX_PLATFORMS=axon (a
tunnel to one real TPU chip); tests must not cross that tunnel — CPU with
``xla_force_host_platform_device_count=8`` exercises jit, scan, and the
multi-device mesh/shard_map paths deterministically (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"  # overrides the axon plugin pin
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize pre-imports jax at interpreter startup (before this
# conftest), so the env vars above can be too late — jax.config captured
# JAX_PLATFORMS=axon at import. Backend selection is still undecided until
# first device use, so force it here too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", (
    "tests must run on the CPU backend, got " + jax.devices()[0].platform
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_model_cfg():
    from molecular_dynamics_neural_operator_tpu.configs import ModelConfig

    return ModelConfig(
        width=16,
        ker_width=32,
        depth=2,
        window_size=4,
        num_residues=12,
        max_edges=160,
        compute_dtype="float32",
    )


@pytest.fixture(scope="session")
def tiny_traj():
    from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory

    return synthetic_trajectory(num_frames=64, num_residues=12, seed=3)
