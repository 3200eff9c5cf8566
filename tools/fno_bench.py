"""FNO family throughput on one chip (BASELINE config 2, no reference
numbers exist): rollout steps/s (single + batched) and training samples/s."""

import sys as _sys
from pathlib import Path as _Path

# run-by-path support: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path; the package and `tools.` imports need the root
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import sys

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models.fno import (
    FNOBatch, distance_matrix_channels, fno_apply, fno_init,
    fno_rollout_scan, make_fno_train_step,
)
from molecular_dynamics_neural_operator_tpu.train.optim import (
    make_optimizer,
)
from molecular_dynamics_neural_operator_tpu.train.state import TrainState

print("device:", jax.devices()[0], file=sys.stderr)

cfg = FNOConfig()
params = fno_init(jax.random.PRNGKey(0), cfg)
traj = synthetic_trajectory(num_frames=200, num_residues=cfg.num_residues,
                            seed=0)
ch0 = distance_matrix_channels(jnp.asarray(traj.positions[:10]))


from tools.timing import min_time as minrun  # noqa: E402


# rollout: slope between 500 and 2500 steps
def roll_time(n):
    f = jax.jit(lambda p, c: fno_rollout_scan(p, cfg, c, n)[0])
    return minrun(f, params, ch0)


t1, t2 = roll_time(500), roll_time(2500)
rate = 2000 / max(t2 - t1, 1e-9)
print(f"FNO single-stream rollout: {rate:,.0f} steps/s", flush=True)

# batched rollout, 8 streams
ch8 = jnp.stack([distance_matrix_channels(
    jnp.asarray(traj.positions[i : i + 10])) for i in range(8)])


def roll8_time(n):
    f = jax.jit(jax.vmap(lambda c: fno_rollout_scan(params, cfg, c, n)[0]))
    return minrun(f, ch8)


t1, t2 = roll8_time(500), roll8_time(2500)
rate8 = 8 * 2000 / max(t2 - t1, 1e-9)
print(f"FNO 8-stream rollout: {rate8:,.0f} agg steps/s", flush=True)

# stream-scaling sweep (the FNO state is tiny — no kernel-tensor spill,
# so aggregate throughput keeps climbing as streams fill the small
# matmuls; docs/PERFORMANCE.md quotes this sweep)
import os
if os.environ.get("FNO_BENCH_SWEEP", "0") == "1":
    for s_cnt in (32, 64, 128):
        chs = jnp.stack([distance_matrix_channels(
            jnp.asarray(traj.positions[i % 100 : i % 100 + 10]))
            for i in range(s_cnt)])

        def rolls_time(n, chs=chs):
            f = jax.jit(jax.vmap(
                lambda c: fno_rollout_scan(params, cfg, c, n)[0]))
            return minrun(f, chs)

        t1, t2 = rolls_time(500), rolls_time(2500)
        rr = s_cnt * 2000 / max(t2 - t1, 1e-9)
        print(f"FNO {s_cnt}-stream rollout: {rr:,.0f} agg steps/s",
              flush=True)

# training step, B=128, in-scan device rate
B = 128
tx, _ = make_optimizer(lr=1e-3, weight_decay=0.0, scheduler_step=50,
                       scheduler_gamma=0.8, steps_per_epoch=1)
opt_state = tx.init(params)
state = TrainState(params, opt_state, jnp.zeros((), jnp.int32),
                   jax.random.PRNGKey(1))
x = jnp.stack([distance_matrix_channels(
    jnp.asarray(traj.positions[i : i + 10])) for i in range(B)])
y = jnp.stack([distance_matrix_channels(
    jnp.asarray(traj.positions[i + 10 : i + 11])) for i in range(B)])
fb = FNOBatch(x=x, y=y)
step = make_fno_train_step(cfg, tx)


def train_time(n):
    @jax.jit
    def many(st):
        return jax.lax.scan(lambda s, _: (step(s, fb)[0], None), st, None,
                            length=n)[0]

    return minrun(many, state)


t1, t2 = train_time(5), train_time(25)
ms = (t2 - t1) / 20 * 1e3
print(f"FNO train step B={B}: {ms:.2f} ms ({B / ms * 1e3:,.0f} samples/s)",
      flush=True)
