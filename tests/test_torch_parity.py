"""Checkpoint-level behavioral parity with the reference architecture.

Builds a plain-torch replica of the reference ``KernelNN``
(``graph_kernel.py:245-309``: LSTM window encoder, embedding, shared-kernel
NNConv stacks with mean aggregation, implemented here without
torch_geometric), runs it on a tiny example, imports its state_dict through
``utils.torch_import``, and checks our JAX forward reproduces the output.

Single-example semantics are exact: with batch=1 the reference's quirky
LSTM indexing (scanning torch's seq axis over frames with residues as the
batch) coincides with our per-residue time scan.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig  # noqa: E402
from molecular_dynamics_neural_operator_tpu.geometry import (  # noqa: E402
    contact_map,
    dense_edge_features,
)
from molecular_dynamics_neural_operator_tpu.models import (  # noqa: E402
    DenseGraph,
    gkn_apply_single,
)
from molecular_dynamics_neural_operator_tpu.utils.torch_import import (  # noqa: E402
    import_reference_state_dict,
)


from tools.torch_replica import (  # noqa: E402
    TorchDenseNet,
    TorchKernelNN,
    TorchNNConv,
)


def test_forward_parity_with_reference_architecture():
    torch.manual_seed(0)
    width, ker_width, depth, t, r = 16, 32, 2, 4, 10
    model = TorchKernelNN(width, ker_width, depth, t, r).eval()

    rng = np.random.default_rng(0)
    window = rng.normal(size=(t, r, 3)).astype(np.float32) * 4
    aa = (rng.integers(0, 20, r)).astype(np.int64)

    adj = np.asarray(contact_map(jnp.asarray(window[-1]), 8.0))
    src, dst = np.nonzero(adj)
    edge_index = np.stack([src, dst])
    edge_attr = np.concatenate(
        [window[-1][src], window[-1][dst]], axis=1
    ).astype(np.float32)

    with torch.no_grad():
        ref = model(
            torch.tensor(window), torch.tensor(aa),
            torch.tensor(edge_index), torch.tensor(edge_attr),
        ).numpy()

    cfg = ModelConfig(width=width, ker_width=ker_width, depth=depth,
                      window_size=t, num_residues=r,
                      compute_dtype="float32")
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = import_reference_state_dict(sd, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    graph = DenseGraph(
        adj=jnp.asarray(adj),
        edge_feats=dense_edge_features(jnp.asarray(window[-1])),
    )
    ours = np.asarray(
        gkn_apply_single(params, cfg, jnp.asarray(aa), jnp.asarray(window),
                         graph)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_legacy_no_lstm_checkpoint_parity():
    """The OLDER reference KernelNN (bba_analysis.ipynb cell 8 — no LSTM,
    single conv stack, window_size=1): a scientist's old best.pt imports
    via import_legacy_state_dict and forwards identically through
    ModelConfig(legacy_no_lstm=True)."""
    from molecular_dynamics_neural_operator_tpu.utils.torch_import import (
        import_legacy_state_dict,
        is_legacy_state_dict,
    )
    from tools.torch_replica import TorchLegacyKernelNN

    torch.manual_seed(1)
    width, ker_width, depth, r = 16, 32, 3, 10
    model = TorchLegacyKernelNN(width, ker_width, depth).eval()

    rng = np.random.default_rng(1)
    frame = rng.normal(size=(r, 3)).astype(np.float32) * 4
    aa = (rng.integers(0, 20, r)).astype(np.int64)
    adj = np.asarray(contact_map(jnp.asarray(frame), 8.0))
    src, dst = np.nonzero(adj)
    edge_index = np.stack([src, dst])
    edge_attr = np.concatenate(
        [frame[src], frame[dst]], axis=1).astype(np.float32)
    with torch.no_grad():
        ref = model(
            torch.tensor(frame), torch.tensor(aa),
            torch.tensor(edge_index), torch.tensor(edge_attr),
        ).numpy()

    cfg = ModelConfig(width=width, ker_width=ker_width, depth=depth,
                      window_size=1, num_residues=r,
                      compute_dtype="float32", legacy_no_lstm=True)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    assert is_legacy_state_dict(sd)
    params = jax.tree_util.tree_map(
        jnp.asarray, import_legacy_state_dict(sd, cfg))
    assert set(params) == {"emb", "fc1", "fc2", "conv1", "edge_kernel"}
    graph = DenseGraph(
        adj=jnp.asarray(adj),
        edge_feats=dense_edge_features(jnp.asarray(frame)),
    )
    ours = np.asarray(
        gkn_apply_single(params, cfg, jnp.asarray(aa),
                         jnp.asarray(frame[None]), graph)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    # init produces the matching (LSTM-free, single-stack) pytree
    from molecular_dynamics_neural_operator_tpu.models import gkn_init as gi
    assert set(gi(jax.random.PRNGKey(0), cfg)) == set(params)
    # the full-layout importer refuses without the flag, with guidance
    import dataclasses

    import pytest

    with pytest.raises(ValueError, match="legacy_no_lstm"):
        import_legacy_state_dict(
            sd, dataclasses.replace(cfg, legacy_no_lstm=False))


def test_legacy_checkpoint_sparse_path_and_rollout():
    """Legacy variant on the padded-sparse path == dense path, and the
    rollout scan runs it (the notebook's propogate loop, cells 19-23)."""
    from molecular_dynamics_neural_operator_tpu.data import WindowDataset
    from molecular_dynamics_neural_operator_tpu.data.synthetic import (
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.models.gkn import gkn_apply
    from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        featurize_batch,
    )

    cfg_d = ModelConfig(width=16, ker_width=32, depth=2, window_size=1,
                        num_residues=12, compute_dtype="float32",
                        legacy_no_lstm=True, predict_delta=True)
    import dataclasses

    cfg_s = dataclasses.replace(cfg_d, graph_mode="sparse", max_edges=128)
    params = gkn_init(jax.random.PRNGKey(2), cfg_d)
    traj = synthetic_trajectory(num_frames=8, num_residues=12, seed=6)
    idx = np.array([0, 3])
    ds_d = WindowDataset(traj, window_size=1, graph_mode="dense")
    ds_s = WindowDataset(traj, window_size=1, graph_mode="sparse",
                         max_edges=128)
    out_d = gkn_apply(params, cfg_d,
                      featurize_batch(cfg_d, ds_d.get_batch(idx)))
    out_s = gkn_apply(params, cfg_s,
                      featurize_batch(cfg_s, ds_s.get_batch(idx)))
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=2e-5, atol=2e-6)
    coords, _, _ = rollout_scan(
        params, cfg_s, jnp.asarray(traj.aminoacids),
        jnp.asarray(traj.positions[:1]), 4, clip=100.0)
    assert coords.shape == (4, 12, 3)


def test_export_import_roundtrip():
    """torch_export is the exact inverse of torch_import: params survive a
    JAX -> reference-state_dict -> JAX round trip bit-for-bit."""
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.utils.torch_export import (
        export_reference_state_dict,
    )

    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=10, compute_dtype="float32")
    params = jax.tree_util.tree_map(
        np.asarray, gkn_init(jax.random.PRNGKey(3), cfg)
    )
    sd = export_reference_state_dict(params, cfg)
    back = import_reference_state_dict(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path])


def test_exported_state_dict_loads_into_torch_replica():
    """The exported dict load_state_dict()s cleanly (strict) and the torch
    replica reproduces our forward on the same weights."""
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.utils.torch_export import (
        export_reference_state_dict,
    )

    width, ker_width, depth, t, r = 16, 32, 2, 4, 10
    cfg = ModelConfig(width=width, ker_width=ker_width, depth=depth,
                      window_size=t, num_residues=r,
                      compute_dtype="float32")
    params = gkn_init(jax.random.PRNGKey(5), cfg)
    sd = export_reference_state_dict(
        jax.tree_util.tree_map(np.asarray, params), cfg
    )
    model = TorchKernelNN(width, ker_width, depth, t, r)
    model.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                          strict=True)
    model.eval()

    rng = np.random.default_rng(2)
    window = rng.normal(size=(t, r, 3)).astype(np.float32) * 4
    aa = rng.integers(0, 20, r).astype(np.int64)
    adj = np.asarray(contact_map(jnp.asarray(window[-1]), 8.0))
    src, dst = np.nonzero(adj)
    edge_attr = np.concatenate(
        [window[-1][src], window[-1][dst]], axis=1
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(
            torch.tensor(window), torch.tensor(aa),
            torch.tensor(np.stack([src, dst])), torch.tensor(edge_attr),
        ).numpy()
    graph = DenseGraph(
        adj=jnp.asarray(adj),
        edge_feats=dense_edge_features(jnp.asarray(window[-1])),
    )
    ours = np.asarray(
        gkn_apply_single(params, cfg, jnp.asarray(aa), jnp.asarray(window),
                         graph)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_rollout_parity_with_reference_loop():
    """Trajectory-level parity: our jitted lax.scan rollout tracks the
    reference's own host loop (scipy rebuild each step,
    graph_kernel.py:396-413) on identical weights."""
    from tools.torch_replica import torch_recursive_propagation

    from molecular_dynamics_neural_operator_tpu.data import (
        synthetic_trajectory,
    )
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )
    from molecular_dynamics_neural_operator_tpu.utils.torch_export import (
        export_reference_state_dict,
    )

    width, ker_width, depth, t, r = 16, 32, 2, 4, 12
    cfg = ModelConfig(width=width, ker_width=ker_width, depth=depth,
                      window_size=t, num_residues=r,
                      compute_dtype="float32", predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(7), cfg)
    sd = export_reference_state_dict(
        jax.tree_util.tree_map(np.asarray, params), cfg
    )
    replica = TorchKernelNN(width, ker_width, depth, t, r,
                            predict_delta=True)
    replica.load_state_dict({k: torch.tensor(v) for k, v in sd.items()},
                            strict=True)

    traj = synthetic_trajectory(num_frames=t + 2, num_residues=r, seed=9)
    w0 = traj.positions[:t]
    steps = 10
    roll = make_rollout_fn(cfg, num_steps=steps)
    coords_jax = np.asarray(
        roll(params, jnp.asarray(traj.aminoacids), jnp.asarray(w0))[0]
    )
    coords_ref = torch_recursive_propagation(replica, w0, traj.aminoacids,
                                             steps)
    np.testing.assert_allclose(coords_jax, coords_ref, rtol=1e-3, atol=1e-3)


def test_import_reference_checkpoint_file(tmp_path):
    """Load a reference-style best.pt ({model_state_dict: ...} with the
    DataParallel 'module.' prefix, graph_kernel.py:633-639) from disk."""
    from molecular_dynamics_neural_operator_tpu.utils.torch_import import (
        import_reference_checkpoint,
    )

    torch.manual_seed(1)
    model = TorchKernelNN(16, 32, 2, 4, 10)
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    path = tmp_path / "best.pt"
    torch.save({"epoch": 3, "model_state_dict": sd}, path)

    cfg = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                      num_residues=10, compute_dtype="float32")
    params = import_reference_checkpoint(path, cfg)
    np.testing.assert_allclose(
        params["fc2"]["w"],
        model.state_dict()["fc2.weight"].numpy().T,
    )
    np.testing.assert_allclose(
        params["edge_kernel"]["layer_2"]["b"],
        model.state_dict()["conv1.net.layers.4.bias"].numpy(),
    )
