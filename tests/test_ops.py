"""Edge-conditioned conv, MLP, and LSTM vs numpy oracles.

The oracle replicates PyG ``MessagePassing`` semantics with
``flow="source_to_target"`` and ``aggr="mean"`` exactly as the reference's
``NNConv_old`` uses them (``graph_kernel.py:125-214,272-273``): node i
aggregates mean_j x_j @ reshape(h(e_ji), w, w), plus root weight and bias.
"""

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.geometry import (
    contact_map,
    dense_edge_features,
    dense_to_padded_edges,
    degree_from_adjacency,
    edge_features_from_edges,
)
from molecular_dynamics_neural_operator_tpu.ops import (
    edge_conv_dense,
    edge_conv_init,
    edge_conv_sparse,
    edge_kernel_matrices,
    lstm_apply,
    lstm_init,
    mlp_apply,
    mlp_init,
    sparse_inv_degree,
)


def _np_mlp(params, x):
    n = len(params)
    for i in range(n):
        w, b = np.asarray(params[f"layer_{i}"]["w"]), np.asarray(params[f"layer_{i}"]["b"])
        x = x @ w + b
        if i != n - 1:
            x = np.maximum(x, 0)
    return x


def _oracle_nnconv(x, adj, edge_feats_dense, mlp_params, root, bias, width):
    """Per-edge Python-loop oracle of NNConv_old mean aggregation."""
    r = x.shape[0]
    out = np.zeros((r, width), np.float64)
    for i in range(r):
        msgs = []
        for j in range(r):
            if adj[j, i] > 0:
                kernel = _np_mlp(mlp_params, edge_feats_dense[j, i]).reshape(
                    width, width
                )
                msgs.append(x[j] @ kernel)
        if msgs:
            out[i] = np.mean(msgs, axis=0)
    return out + x @ np.asarray(root) + np.asarray(bias)


def test_mlp_matches_numpy(rng):
    params = mlp_init(jax.random.PRNGKey(0), [6, 32, 32, 64])
    x = rng.normal(size=(40, 6)).astype(np.float32)
    ours = np.asarray(mlp_apply(params, jnp.asarray(x)))
    ref = _np_mlp(params, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dense_and_sparse_conv_match_oracle(rng):
    r, w = 12, 8
    pos = (rng.normal(size=(r, 3)) * 4).astype(np.float32)
    x = rng.normal(size=(r, w)).astype(np.float32)
    adj = np.asarray(contact_map(jnp.asarray(pos), 8.0))
    ef_dense = np.asarray(dense_edge_features(jnp.asarray(pos)))

    mlp_params = mlp_init(jax.random.PRNGKey(1), [6, 16, w * w])
    conv = edge_conv_init(jax.random.PRNGKey(2), w)

    ref = _oracle_nnconv(
        x, adj, ef_dense, mlp_params, conv["root"], conv["bias"], w
    )

    kernels = edge_kernel_matrices(mlp_params, jnp.asarray(ef_dense), w)
    masked = kernels * jnp.asarray(adj)[..., None, None]
    inv_deg = 1.0 / degree_from_adjacency(jnp.asarray(adj))
    out_dense = np.asarray(edge_conv_dense(conv, jnp.asarray(x), masked, inv_deg))
    np.testing.assert_allclose(out_dense, ref, rtol=1e-4, atol=1e-4)

    edges, mask = dense_to_padded_edges(adj, 256)
    edges, mask = jnp.asarray(edges), jnp.asarray(mask)
    ef_sp = edge_features_from_edges(jnp.asarray(pos), edges)
    ks = edge_kernel_matrices(mlp_params, ef_sp, w)
    inv = sparse_inv_degree(edges, mask, r)
    for mode in ("onehot", "segment"):
        out_sp = np.asarray(
            edge_conv_sparse(conv, jnp.asarray(x), ks, edges, mask, inv, mode)
        )
        np.testing.assert_allclose(out_sp, ref, rtol=1e-4, atol=1e-4, err_msg=mode)


def test_lstm_matches_torch():
    torch = __import__("torch")
    t, b, d = 5, 6, 3
    params = lstm_init(jax.random.PRNGKey(3), d, d)
    xs = np.random.default_rng(1).normal(size=(t, b, d)).astype(np.float32)

    ref_lstm = torch.nn.LSTM(d, d)
    with torch.no_grad():
        # torch packs gates as (4h, in) row-major [i, f, g, o]
        ref_lstm.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        ref_lstm.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        ref_lstm.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        ref_lstm.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        ref_out, _ = ref_lstm(torch.tensor(xs))
    ours = np.asarray(lstm_apply(params, jnp.asarray(xs)))
    np.testing.assert_allclose(ours, ref_out[-1].numpy(), rtol=1e-4, atol=1e-5)


def test_mean_aggregation_handles_isolated_nodes():
    # a node with zero incoming edges must produce root+bias, not NaN
    r, w = 4, 8
    x = jnp.ones((r, w))
    adj = jnp.zeros((r, r))
    mlp_params = mlp_init(jax.random.PRNGKey(1), [6, 8, w * w])
    conv = edge_conv_init(jax.random.PRNGKey(2), w)
    ef = jnp.zeros((r, r, 6))
    kernels = edge_kernel_matrices(mlp_params, ef, w)
    masked = kernels * adj[..., None, None]
    inv_deg = 1.0 / degree_from_adjacency(adj)
    out = np.asarray(edge_conv_dense(conv, x, masked, inv_deg))
    assert np.isfinite(out).all()
    expected = np.asarray(x @ conv["root"] + conv["bias"])
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)
