"""int8 kernel-tensor serving quantization (ops/edge_conv.py, models/gkn.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.models.gkn import (
    SparseGraph,
    gkn_apply_single,
)
from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
    quantize_kernels_int8,
)


def _cfg(**kw):
    base = dict(width=8, ker_width=16, depth=2, window_size=4,
                num_residues=10, graph_mode="sparse", max_edges=64,
                compute_dtype="float32", predict_delta=True)
    base.update(kw)
    return ModelConfig(**base)


def _graph_inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    r, e = cfg.num_residues, cfg.max_edges
    window = jnp.asarray(rng.normal(size=(cfg.window_size, r, 3)) * 3.0,
                         jnp.float32)
    aa = jnp.asarray(rng.integers(0, 20, size=(r,)), jnp.int32)
    n_real = e - 9
    src = rng.integers(0, r, size=(e,)).astype(np.int32)
    dst = rng.integers(0, r, size=(e,)).astype(np.int32)
    mask = (np.arange(e) < n_real).astype(np.float32)
    edges = jnp.asarray(np.stack([src, dst]))
    frame = np.asarray(window[0])
    feats = np.concatenate([frame[src], frame[dst]], axis=1) * mask[:, None]
    graph = SparseGraph(edges=edges, mask=jnp.asarray(mask),
                        edge_feats=jnp.asarray(feats, jnp.float32))
    return aa, window, graph


def test_quantize_roundtrip_error_bound():
    """Dequantized values sit within half a quantization step of the
    original, per edge."""
    k = jax.random.normal(jax.random.PRNGKey(0), (17, 8, 8)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (17, 1, 1)))
    k8, scale = quantize_kernels_int8(k)
    assert k8.dtype == jnp.int8 and scale.shape == (17,)
    deq = k8.astype(jnp.float32) * scale[:, None, None]
    err = np.abs(np.asarray(deq - k))
    assert (err <= 0.5 * np.asarray(scale)[:, None, None] + 1e-7).all()
    # the max element of each edge hits 127 exactly (symmetric scaling)
    assert (np.abs(np.asarray(k8)).max(axis=(1, 2)) == 127).all()


def test_int8_forward_matches_fake_quant_oracle():
    """The int8 path == the normal path run on manually dequantized
    kernels (the scale-folded-into-mask trick changes float order only)."""
    cfg = _cfg(kernel_quant="int8")
    cfg_plain = dataclasses.replace(cfg, kernel_quant="none")
    params = gkn_init(jax.random.PRNGKey(2), cfg_plain)
    aa, window, graph = _graph_inputs(cfg)

    out_q = gkn_apply_single(params, cfg, aa, window, graph)

    # oracle: replace the edge-kernel MLP's output by its int8 dequant.
    # Same math via params is awkward (the MLP computes kernels inside),
    # so instead reconstruct: quantize the kernels the model would use and
    # run the conv loop through the plain path with a fake-quant MLP.
    from molecular_dynamics_neural_operator_tpu.ops.edge_conv import (
        edge_conv_sparse,
        edge_kernel_matrices,
        sparse_inv_degree,
    )
    from molecular_dynamics_neural_operator_tpu.models.gkn import (
        _encode_nodes,
    )
    from molecular_dynamics_neural_operator_tpu.ops.mlp import linear_apply

    x = _encode_nodes(params, cfg_plain, aa, window)
    kern = edge_kernel_matrices(params["edge_kernel"], graph.edge_feats,
                                cfg.width, compute_dtype=jnp.float32)
    k8, scale = quantize_kernels_int8(kern)
    deq = k8.astype(jnp.float32) * scale[:, None, None]
    inv_deg = sparse_inv_degree(graph.edges, graph.mask, cfg.num_residues,
                                "onehot")
    for _ in range(cfg.depth):
        x = jax.nn.relu(edge_conv_sparse(
            params["conv1"], x, deq, graph.edges, graph.mask, inv_deg,
            "onehot", jnp.float32))
    for _ in range(cfg.depth):
        x = jax.nn.relu(edge_conv_sparse(
            params["conv2"], x, deq, graph.edges, graph.mask, inv_deg,
            "onehot", jnp.float32))
    out_ref = linear_apply(params["fc2"], x) + window[-1]

    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_forward_close_to_unquantized():
    cfg_plain = _cfg()
    cfg_q = _cfg(kernel_quant="int8")
    params = gkn_init(jax.random.PRNGKey(3), cfg_plain)
    aa, window, graph = _graph_inputs(cfg_plain, seed=4)
    out = np.asarray(gkn_apply_single(params, cfg_plain, aa, window, graph))
    out_q = np.asarray(gkn_apply_single(params, cfg_q, aa, window, graph))
    # per-edge int8 keeps each kernel element within ~0.4% of its edge's
    # max; through 2*depth layers the output stays within a percent-ish
    denom = np.abs(out).max()
    assert np.abs(out_q - out).max() / denom < 2e-2
    assert not np.array_equal(out_q, out)  # it IS quantized


def test_int8_rollout_scan_runs_and_tracks():
    from molecular_dynamics_neural_operator_tpu.rollout import (
        make_rollout_fn,
    )

    cfg_plain = _cfg()
    cfg_q = _cfg(kernel_quant="int8")
    params = gkn_init(jax.random.PRNGKey(5), cfg_plain)
    aa, window, _ = _graph_inputs(cfg_plain, seed=6)
    c_plain = np.asarray(make_rollout_fn(cfg_plain, num_steps=5,
                                         clip=100.0)(params, aa, window)[0])
    c_q = np.asarray(make_rollout_fn(cfg_q, num_steps=5,
                                     clip=100.0)(params, aa, window)[0])
    assert np.isfinite(c_q).all()
    # same clip rail, same graph rebuild; quantization noise stays bounded
    assert np.abs(c_q - c_plain).max() < 0.5


def test_kernel_quant_guards():
    cfg_dense = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                            num_residues=10, graph_mode="dense",
                            compute_dtype="float32", kernel_quant="int8")
    params = gkn_init(jax.random.PRNGKey(0), cfg_dense)
    from molecular_dynamics_neural_operator_tpu.geometry import contact_map
    from molecular_dynamics_neural_operator_tpu.models.gkn import (
        DenseGraph,
    )
    from molecular_dynamics_neural_operator_tpu.train.loop import (
        dense_edge_features,
    )

    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.normal(size=(4, 10, 3)), jnp.float32)
    aa = jnp.asarray(rng.integers(0, 20, size=(10,)), jnp.int32)
    adj = contact_map(window[0][None], 8.0)[0].astype(jnp.float32)
    graph = DenseGraph(adj=adj, edge_feats=dense_edge_features(window[0]))
    with pytest.raises(ValueError, match="sparse XLA conv path"):
        gkn_apply_single(params, cfg_dense, aa, window, graph)

    cfg_bad = _cfg(kernel_quant="fp4")
    aa2, window2, graph2 = _graph_inputs(cfg_bad)
    params2 = gkn_init(jax.random.PRNGKey(0), _cfg())
    with pytest.raises(ValueError, match="unknown kernel_quant"):
        gkn_apply_single(params2, cfg_bad, aa2, window2, graph2)

    from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
        make_persistent_rollout_fn,
    )

    with pytest.raises(ValueError, match="persistent rollout"):
        make_persistent_rollout_fn(_cfg(kernel_quant="int8"), num_steps=3)
