"""Functional LSTM window encoder.

The reference feeds the ``window_size``-frame coordinate history through
``nn.LSTM(3, 3)`` one frame at a time and keeps only the final frame's
output (``/root/reference/graph_kernel.py:264,279-288``). Its exact indexing
is buggy — it hands the LSTM a (batch, residues, 3) tensor so torch scans
over the *batch* axis and carries hidden state across unrelated examples.

The TPU design fixes this knowingly (SURVEY.md section 7.3 "faithful quirk
handling"): a per-residue LSTM scanned over the *time* axis with
``lax.scan``, batched over (batch, residues). Gate order is torch's
(i, f, g, o) so reference checkpoints can be imported weight-for-weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_init(key, input_dim: int, hidden_dim: int, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(jnp.maximum(hidden_dim, 1)).astype(jnp.float32)
    shape_ih = (input_dim, 4 * hidden_dim)
    shape_hh = (hidden_dim, 4 * hidden_dim)
    return {
        "w_ih": jax.random.uniform(k1, shape_ih, dtype, -bound, bound),
        "w_hh": jax.random.uniform(k2, shape_hh, dtype, -bound, bound),
        "b_ih": jax.random.uniform(k3, (4 * hidden_dim,), dtype, -bound, bound),
        "b_hh": jax.random.uniform(k4, (4 * hidden_dim,), dtype, -bound, bound),
    }


def lstm_cell(params, x, h, c):
    """One LSTM step. x: (..., in), h/c: (..., hidden). Torch gate order."""
    hidden = h.shape[-1]
    gates = (
        jnp.dot(x, params["w_ih"], preferred_element_type=jnp.float32)
        + jnp.dot(h, params["w_hh"], preferred_element_type=jnp.float32)
        + params["b_ih"]
        + params["b_hh"]
    )
    i, f, g, o = (
        gates[..., :hidden],
        gates[..., hidden : 2 * hidden],
        gates[..., 2 * hidden : 3 * hidden],
        gates[..., 3 * hidden :],
    )
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_apply(params, xs):
    """Scan the LSTM over time; return the final step's hidden output.

    xs: (T, ..., input_dim) — leading axis is time, remaining leading axes
    are batch (e.g. (T, B, R, 3)). Returns (..., hidden_dim), the output at
    the last window frame (the reference keeps only the final frame too,
    graph_kernel.py:283-288).
    """
    hidden = params["w_hh"].shape[0]
    batch_shape = xs.shape[1:-1]
    # Tie the zero carry to xs (xs[0] * 0 broadcast) so its varying-axis
    # type matches under shard_map — a plain jnp.zeros is "unvarying" and
    # fails lax.scan's carry typing inside sharded regions.
    zero_like_xs = xs[0, ..., :1] * 0  # (..., 1), inherits vma from xs
    h0 = jnp.zeros(batch_shape + (hidden,), xs.dtype) + zero_like_xs
    c0 = jnp.zeros(batch_shape + (hidden,), xs.dtype) + zero_like_xs

    def step(carry, x):
        h, c = carry
        h, c = lstm_cell(params, x, h, c)
        return (h, c), None

    (h, _), _ = jax.lax.scan(step, (h0, c0), xs)
    return h
