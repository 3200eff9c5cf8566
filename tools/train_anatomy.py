"""Training-step anatomy: component isolation at DEVICE rate.

Each component runs inside a lax.scan so per-call dispatch (a ~0.4 s
tunnel round-trip under the dev harness) cancels out of the slope; run on
an OTHERWISE IDLE box (host contention skews slope timings in both
directions — measured 27x slow and 1.7x fast under a concurrent pytest).

Documented results (one v5e, B=128, E=256, bf16, Pallas conv stack) in
docs/PERFORMANCE.md: full step 15.2 ms (8,436 samples/s); featurize,
encoder+head grad and the optax update are all ~0; edge-MLP fwd+bwd
3.4 ms (MXU roofline); the conv-stack backward kernel ~9.8 ms dominates.

Usage: python tools/train_anatomy.py   (real TPU; ~10 min of compiles)
"""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import (
    ModelConfig, TrainConfig,
)
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.data.windows import WindowDataset
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.models.gkn import (
    GKNBatch, _encode_nodes,
)
from molecular_dynamics_neural_operator_tpu.ops import linear_apply
from molecular_dynamics_neural_operator_tpu.ops.mlp import mlp_apply
from molecular_dynamics_neural_operator_tpu.models.losses import lp_rel
from molecular_dynamics_neural_operator_tpu.train import (
    create_train_state, make_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.loop import (
    _loss_fn, featurize_batch,
)

print("device:", jax.devices()[0], file=sys.stderr)

B, E = 128, 256
cfg = ModelConfig(compute_dtype="bfloat16", graph_mode="sparse",
                  max_edges=E, train_conv_impl="pallas")
tcfg = TrainConfig(batch_size=B)
traj = synthetic_trajectory(num_frames=B + 16, num_residues=28, seed=0)
ds = WindowDataset(traj, window_size=cfg.window_size, horizon=1,
                   graph_mode="sparse", max_edges=E)
idx = np.arange(B)
batch_host = ds.get_batch(idx)
batch = {k: jnp.asarray(v) for k, v in batch_host.items()}
state, tx, _ = create_train_state(jax.random.PRNGKey(0), cfg, tcfg)
params = state.params


def scan_time(make_body, carry0, n1=20, n2=100):
    from tools.timing import min_time, slope_rate

    def run(n):
        @jax.jit
        def many(c):
            return jax.lax.scan(lambda c, _: (make_body(c), None), c,
                                None, length=n)[0]

        return min_time(many, carry0)

    return 1e3 / slope_rate(run, n1, n2)  # ms/iter


gb = featurize_batch(cfg, batch, "first")

# 1. full train step (loss+grads+optimizer)
def full_step(c):
    st = c
    gbatch = featurize_batch(cfg, batch, "first")
    (l2, _), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
        st.params, cfg, gbatch)
    updates, opt_state = tx.update(grads, st.opt_state, st.params)
    p = jax.tree_util.tree_map(lambda a, u: a + u, st.params, updates)
    return st._replace(params=p, opt_state=opt_state, step=st.step + 1)


ms = scan_time(full_step, state)
print(f"full step: {ms:.2f} ms ({B / ms * 1e3:,.0f} samples/s)", flush=True)

# 2. fwd-only loss
def fwd_only(c):
    gbatch = featurize_batch(cfg, batch, "first")
    l2, _ = _loss_fn(jax.tree_util.tree_map(lambda p: p + c * 0, params),
                     cfg, gbatch)
    return l2


print(f"fwd loss only: {scan_time(fwd_only, jnp.zeros(())):.2f} ms",
      flush=True)

# 3. featurize only
def feat_only(c):
    gbatch = featurize_batch(cfg, batch, "first")
    return c + jnp.sum(gbatch.graph.edge_feats[0, 0])


print(f"featurize only: {scan_time(feat_only, jnp.zeros(())):.2f} ms",
      flush=True)

# 4. encoder + head + loss + grad (no conv, no MLP)
def enc_loss(p, gbatch):
    x = jax.vmap(lambda w: _encode_nodes(p, cfg, gbatch.aa, w))(
        gbatch.window)
    out = jax.vmap(lambda xx: linear_apply(p["fc2"], xx))(
        x[..., : cfg.width])
    b = out.shape[0]
    return lp_rel(out.reshape(b, -1), gbatch.y.reshape(b, -1),
                  size_average=False)


def enc_step(c):
    gbatch = featurize_batch(cfg, batch, "first")
    l2, grads = jax.value_and_grad(enc_loss)(
        jax.tree_util.tree_map(lambda p: p + c * 0, params), gbatch)
    return l2 + jnp.sum(grads["fc1"]["w"])


print(f"encoder+head grad (no conv/MLP): "
      f"{scan_time(enc_step, jnp.zeros(())):.2f} ms", flush=True)

# 5. edge MLP fwd+bwd only (kt from edge feats)
def mlp_step(c):
    gbatch = featurize_batch(cfg, batch, "first")

    def f(p):
        kt = mlp_apply(p["edge_kernel"], gbatch.graph.edge_feats,
                       compute_dtype=jnp.bfloat16)
        return jnp.sum(kt * gbatch.graph.mask[..., None])

    v, grads = jax.value_and_grad(f)(
        jax.tree_util.tree_map(lambda p: p + c * 0, params))
    return v + jnp.sum(grads["edge_kernel"]["layer_2"]["w"])


print(f"edge-MLP fwd+bwd: {scan_time(mlp_step, jnp.zeros(())):.2f} ms",
      flush=True)

# 6. optimizer update only
(_, _), grads0 = jax.value_and_grad(_loss_fn, has_aux=True)(
    params, cfg, gb)
grads0 = jax.tree_util.tree_map(lambda g: g + 0.0, grads0)


def opt_step(c):
    st = c
    updates, opt_state = tx.update(grads0, st.opt_state, st.params)
    p = jax.tree_util.tree_map(lambda a, u: a + u, st.params, updates)
    return st._replace(params=p, opt_state=opt_state, step=st.step + 1)


print(f"optimizer only: {scan_time(opt_step, state):.2f} ms", flush=True)
