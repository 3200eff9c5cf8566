"""Serving-export bundles (serving/export.py + cli/export.py).

The exported artifact must be a faithful, self-contained stand-in for the
in-process jitted rollout: serialize -> deserialize -> call is bitwise
equal to ``jax.jit(make_rollout_fn(...))`` on the same inputs, for both
the single-stream and batched signatures, with weights hot-swappable as
data. No reference counterpart (the reference has no serving story).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import make_rollout_fn
from molecular_dynamics_neural_operator_tpu.serving import (
    export_rollout,
    load_bundle,
    save_bundle,
)

CFG = ModelConfig(width=16, ker_width=32, depth=2, window_size=4,
                  num_residues=12, graph_mode="sparse", max_edges=64,
                  compute_dtype="float32", predict_delta=True)


def _inputs(streams=0, seed=1):
    r, t = CFG.num_residues, CFG.window_size
    shape = (t, r, 3) if streams == 0 else (streams, t, r, 3)
    window = jax.random.normal(jax.random.PRNGKey(seed), shape,
                               jnp.float32) * 4.0
    aa = jnp.arange(r, dtype=jnp.int32) % CFG.num_embeddings
    return aa, window


def _assert_same(got, want):
    g, w = np.asarray(got), np.asarray(want)
    assert np.array_equal(np.isfinite(g), np.isfinite(w))
    fin = np.isfinite(g)
    assert np.array_equal(g[fin], w[fin])


def test_export_roundtrip_bitwise(tmp_path):
    params = gkn_init(jax.random.PRNGKey(0), CFG)
    aa, window = _inputs()
    n = 5
    path = save_bundle(tmp_path / "b", params, CFG, n, clip=100.0)
    bundle = load_bundle(path)

    want = jax.jit(make_rollout_fn(CFG, num_steps=n, clip=100.0))(
        params, aa, window
    )
    got = bundle(aa, window)
    _assert_same(got[0], want[0])  # collected coords
    _assert_same(got[1], want[1])  # final window
    assert bool(np.asarray(got[2]["edge_overflow"])) == bool(
        np.asarray(want[2]["edge_overflow"])
    )
    assert bundle.rollout["num_steps"] == n
    assert "cpu" in bundle.platforms


def test_export_batched_streams(tmp_path):
    params = gkn_init(jax.random.PRNGKey(0), CFG)
    s, n = 4, 3
    aa, window = _inputs(streams=s)
    path = save_bundle(tmp_path / "b", params, CFG, n, streams=s,
                       stream_chunk=2, clip=100.0)
    bundle = load_bundle(path)
    want = jax.jit(make_rollout_fn(CFG, num_steps=n, batched=True,
                                   stream_chunk=2, clip=100.0))(
        params, aa, window
    )
    got = bundle(aa, window)
    assert np.asarray(got[0]).shape == (s, n, CFG.num_residues, 3)
    _assert_same(got[0], want[0])


def test_params_hot_swap(tmp_path):
    params = gkn_init(jax.random.PRNGKey(0), CFG)
    other = gkn_init(jax.random.PRNGKey(7), CFG)
    aa, window = _inputs()
    path = save_bundle(tmp_path / "b", params, CFG, 3, clip=100.0)
    bundle = load_bundle(path)
    want = jax.jit(make_rollout_fn(CFG, num_steps=3, clip=100.0))(
        other, aa, window
    )
    got = bundle(aa, window, params=other)
    _assert_same(got[0], want[0])
    # and the bundled weights restored exactly
    for (pa, pb) in zip(jax.tree_util.tree_leaves(bundle.params),
                        jax.tree_util.tree_leaves(params)):
        assert np.array_equal(np.asarray(pa), np.asarray(pb))


def test_multi_platform_lowering():
    """A CPU host can lower FOR tpu (release-box flow); the artifact
    records both targets."""
    params = gkn_init(jax.random.PRNGKey(0), CFG)
    exp = export_rollout(params, CFG, 2, clip=100.0,
                         platforms=["tpu", "cpu"])
    assert set(exp.platforms) == {"tpu", "cpu"}
    blob = exp.serialize()
    from jax import export as jax_export

    re = jax_export.deserialize(bytearray(blob))
    aa, window = _inputs()
    want = jax.jit(make_rollout_fn(CFG, num_steps=2, clip=100.0))(
        params, aa, window
    )
    _assert_same(re.call(params, aa, window)[0], want[0])


def test_pallas_conv_impl_rejected():
    cfg = dataclasses.replace(CFG, conv_impl="pallas")
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="Mosaic"):
        export_rollout(params, cfg, 2)


def test_format_version_gate(tmp_path):
    params = gkn_init(jax.random.PRNGKey(0), CFG)
    path = save_bundle(tmp_path / "b", params, CFG, 2)
    meta_file = path / "bundle.json"
    meta = json.loads(meta_file.read_text())
    meta["format_version"] = 999
    meta_file.write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format_version"):
        load_bundle(path)


def test_fno_bundle_roundtrip(tmp_path):
    """The second operator family exports through the same bundle format:
    meta records operator='fno', load rebuilds FNOConfig + template, and
    the call signature is the (R, R, T) distance-channel window."""
    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.models.fno import (
        fno_init,
        fno_rollout_scan,
    )

    cfg = FNOConfig(width=8, modes1=4, modes2=4, depth=2, in_channels=3,
                    num_residues=12)
    params = fno_init(jax.random.PRNGKey(0), cfg)
    channels0 = jax.random.normal(
        jax.random.PRNGKey(2), (12, 12, 3), jnp.float32
    )
    n = 4
    path = save_bundle(tmp_path / "f", params, cfg, n)
    bundle = load_bundle(path)
    assert bundle.operator == "fno"
    assert bundle.cfg.modes1 == 4
    want = jax.jit(
        lambda p, c: fno_rollout_scan(p, cfg, c, n)
    )(params, channels0)
    got = bundle(channels0)
    _assert_same(got[0], want[0])
    _assert_same(got[1], want[1])


def test_fno_streams_rejected(tmp_path):
    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.models.fno import fno_init

    cfg = FNOConfig(width=8, modes1=4, modes2=4, depth=1, in_channels=3,
                    num_residues=12)
    params = fno_init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="single-stream"):
        export_rollout(params, cfg, 2, streams=2)


def test_export_cli_fno(tmp_path):
    """--operator fno: FNOConfig-default bundle from a bare checkpoint."""
    from molecular_dynamics_neural_operator_tpu.cli.export import main
    from molecular_dynamics_neural_operator_tpu.configs import FNOConfig
    from molecular_dynamics_neural_operator_tpu.models.fno import fno_init
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    cfg = FNOConfig(num_residues=28)
    params = fno_init(jax.random.PRNGKey(0), cfg)
    ckpt = tmp_path / "fno.npz"
    save_checkpoint(ckpt, params)
    out = tmp_path / "bundle"
    main(["--operator", "fno", "--checkpoint", str(ckpt),
          "--out", str(out), "--num_steps", "2", "--num_residues", "28"])
    bundle = load_bundle(out)
    assert bundle.operator == "fno"
    channels0 = jax.random.normal(jax.random.PRNGKey(2),
                                  (28, 28, cfg.in_channels), jnp.float32)
    preds = np.asarray(bundle(channels0)[0])
    assert preds.shape == (2, 28, 28)


def test_export_cli_end_to_end(tmp_path):
    """Checkpoint -> bundle -> selftest, via the CLI entry point."""
    from molecular_dynamics_neural_operator_tpu.cli.export import main
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        save_checkpoint,
    )

    params = gkn_init(jax.random.PRNGKey(3), CFG)
    ckpt = tmp_path / "ckpt.npz"
    save_checkpoint(ckpt, params)
    out = tmp_path / "bundle"
    main([
        "--checkpoint", str(ckpt), "--out", str(out),
        "--num_steps", "3", "--clip", "100.0",
        "--width", str(CFG.width), "--kernel_width", str(CFG.ker_width),
        "--depth", str(CFG.depth), "--window_size", str(CFG.window_size),
        "--num_residues", str(CFG.num_residues),
        "--graph_mode", "sparse", "--max_edges", str(CFG.max_edges),
        "--compute_dtype", "float32", "--predict_delta",
    ])  # raises SystemExit on selftest failure
    bundle = load_bundle(out)
    assert bundle.cfg.width == CFG.width
    aa, window = _inputs()
    out_arr = np.asarray(bundle(aa, window)[0])
    assert out_arr.shape == (3, CFG.num_residues, 3)
