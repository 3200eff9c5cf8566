"""Checkpoint/resume, metric sinks, movie/latent utilities."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig, TrainConfig
from molecular_dynamics_neural_operator_tpu.train import create_train_state
from molecular_dynamics_neural_operator_tpu.utils import (
    BestCheckpointer,
    MetricLogger,
    format_epoch_line,
    restore_checkpoint,
    save_checkpoint,
)
from molecular_dynamics_neural_operator_tpu.utils.metrics import parse_loss_log


def _state(cfg=None):
    cfg = cfg or ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                             num_residues=6)
    state, _, _ = create_train_state(jax.random.PRNGKey(0), cfg, TrainConfig())
    return state


def test_checkpoint_roundtrip(tmp_path):
    state = _state()
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, state, {"epoch": 7})
    template = _state()  # fresh init, different values
    restored, meta = restore_checkpoint(path, template)
    assert meta["epoch"] == 7
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_subtree_params_only(tmp_path):
    """Params-only restore from a checkpoint saved with a DIFFERENT
    optimizer chain than the template (the rollout-CLI decoupling)."""
    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=6)
    # Curriculum recipe: clip + apply_if_finite wraps the opt_state treedef.
    state, _, _ = create_train_state(
        jax.random.PRNGKey(0), cfg,
        TrainConfig(grad_clip_norm=1.0, skip_nonfinite_updates=True),
    )
    path = tmp_path / "curr.npz"
    save_checkpoint(path, state, {"epoch": 3})

    template = gkn_init(jax.random.PRNGKey(1), cfg)  # different values
    params, meta = restore_subtree(path, template, ".params")
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_checkpointer_tracks_improvement(tmp_path):
    state = _state()
    ck = BestCheckpointer(tmp_path)
    assert ck.update(0, 1.0, state) is True
    assert ck.update(1, 2.0, state) is False  # worse: no new best
    assert ck.update(2, 0.5, state) is True
    _, meta = restore_checkpoint(tmp_path / "best.npz", state)
    assert meta["epoch"] == 2
    assert (tmp_path / "last.npz").exists()


def test_best_checkpointer_survives_resume(tmp_path):
    # A fresh BestCheckpointer in the same run_dir (i.e. a resumed run)
    # must not let a worse epoch clobber the historic best.npz.
    state = _state()
    ck = BestCheckpointer(tmp_path)
    ck.update(0, 0.5, state)
    ck2 = BestCheckpointer(tmp_path, resume=True)  # simulated restart
    assert ck2.best_loss == 0.5
    assert ck2.update(1, 0.9, state) is False
    _, meta = restore_checkpoint(tmp_path / "best.npz", state)
    assert meta["epoch"] == 0 and meta["valid_loss"] == 0.5
    assert ck2.update(2, 0.4, state) is True


def test_best_checkpointer_fresh_run_ignores_stale_best(tmp_path):
    # WITHOUT the resume signal, a new run reusing a run_dir must treat a
    # stale best.npz as beatable — otherwise its own weights might never
    # be written and the new config.json would pair with the old run's
    # checkpoint.
    state = _state()
    BestCheckpointer(tmp_path).update(0, 0.01, state)
    ck = BestCheckpointer(tmp_path)  # fresh run, same dir, no resume
    assert ck.best_loss == float("inf")
    assert ck.update(0, 0.5, state) is True
    _, meta = restore_checkpoint(tmp_path / "best.npz", state)
    assert meta["valid_loss"] == 0.5


def test_epoch_line_roundtrip():
    line = format_epoch_line(3, 12.5, 0.25, 0.5)
    rows = parse_loss_log("junk\n" + line + "\nmore junk")
    assert rows == [{"epoch": 3, "time": 12.5, "train_loss": 0.25,
                     "valid_loss": 0.5}]


def test_metric_logger_jsonl(tmp_path, capsys):
    logger = MetricLogger(tmp_path)
    logger.log_epoch(0, 1.5, 0.9, 1.1)
    logger.close()
    out = capsys.readouterr().out
    assert out.startswith("Epoch: 0\tTime: 1.5")
    rows = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["avg_train_loss"] == 0.9


def test_latent_pca_and_viz(tmp_path):
    from molecular_dynamics_neural_operator_tpu.utils.latent import (
        log_latent_visualization,
        pca_embed,
    )

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(50, 16)).astype(np.float32)
    emb = pca_embed(latents)
    assert emb.shape == (50, 2)
    # PCA components are orthogonal directions of max variance
    assert emb[:, 0].var() >= emb[:, 1].var()
    paths = log_latent_visualization(
        latents, {"RMSD": rng.normal(size=50)}, tmp_path, epoch=0,
        method="PCA",
    )
    assert (tmp_path / "latent_space_epoch0.npy").exists()
    for p in paths.values():
        assert p.exists()


def test_latent_degenerate_input_is_skipped_not_fatal(tmp_path):
    """Non-finite or constant latents (an early/diverged model) must skip
    the embedding instead of crashing: np.linalg.svd raises on NaN and
    sklearn's Barnes-Hut t-SNE SEGFAULTS on the NaN init it derives from
    zero-variance input (observed killing the 1.1M-frame run of record at
    its epoch-0 latent plot)."""
    from molecular_dynamics_neural_operator_tpu.utils.latent import (
        degenerate_latents_reason,
        log_latent_visualization,
        tsne_embed,
    )

    nan_latents = np.full((40, 8), np.nan, np.float32)
    const_latents = np.ones((40, 8), np.float32)
    # every FRAME identical but features differ: global ptp is nonzero yet
    # PCA columns are exactly zero-variance — the t-SNE init still
    # divides by 0 (the collapsed-model case the whole-array check missed)
    tiled_latents = np.tile(
        np.arange(8, dtype=np.float32)[None], (40, 1))
    ok_latents = np.random.default_rng(0).normal(size=(40, 8)).astype(
        np.float32)
    assert degenerate_latents_reason(nan_latents) is not None
    assert degenerate_latents_reason(const_latents) is not None
    assert degenerate_latents_reason(tiled_latents) is not None
    assert degenerate_latents_reason(ok_latents) is None
    assert tsne_embed(nan_latents) is None
    assert tsne_embed(const_latents) is None
    assert tsne_embed(tiled_latents) is None
    for bad in (nan_latents, const_latents):
        for method in ("PCA", "TSNE"):
            paths = log_latent_visualization(
                bad, {"RMSD": np.zeros(40)}, tmp_path, epoch=1,
                method=method,
            )
            assert paths == {}
    # the raw latents are still saved for post-mortem
    assert (tmp_path / "latent_space_epoch1.npy").exists()


def test_latent_html_artifact(tmp_path):
    """log_latent_visualization emits a standalone HTML page embedding the
    scatter PNGs (the wandb.Html artifact, graph_kernel.py:609-621 parity)."""
    pytest_skip_without_mpl()
    from molecular_dynamics_neural_operator_tpu.utils.latent import (
        log_latent_visualization,
    )

    latents = np.random.default_rng(0).normal(size=(32, 12)).astype(np.float32)
    colors = {"RMSD": np.linspace(0, 1, 32)}
    paths = log_latent_visualization(latents, colors, tmp_path, 0, "PCA")
    assert "html" in paths
    html = paths["html"].read_text()
    assert "data:image/png;base64," in html and "RMSD" in html


def pytest_skip_without_mpl():
    import pytest

    try:
        import matplotlib  # noqa: F401
    except Exception:
        pytest.skip("matplotlib unavailable")


def test_metric_logger_rich_wandb_artifacts(tmp_path):
    """Movie paths go to wandb as Video, PNGs as Image, HTML as Html —
    scalar dicts alone lose the reference's visual diagnostics."""
    (tmp_path / "m.gif").write_bytes(b"GIF89a")
    (tmp_path / "p.png").write_bytes(b"\x89PNG\r\n")
    (tmp_path / "l.html").write_text("<html></html>")

    class StubMedia:
        def __init__(self, src):
            self.src = src

    class StubWandb:
        Video = type("Video", (StubMedia,), {})
        Image = type("Image", (StubMedia,), {})
        Html = type("Html", (StubMedia,), {})

        def __init__(self):
            self.logged = []

        def log(self, metrics, step=None):
            self.logged.append((step, metrics))

        def finish(self):
            pass

    logger = MetricLogger(tmp_path, use_wandb=False)
    stub = StubWandb()
    logger._wandb = stub
    logger.log_epoch(0, 1.0, 0.5, 0.4, {
        "movie": str(tmp_path / "m.gif"),
        "plot": str(tmp_path / "p.png"),
        "latents": str(tmp_path / "l.html"),
        "scalar": 3.0,
    })
    logger.close()
    _, metrics = stub.logged[0]
    assert isinstance(metrics["movie"], StubWandb.Video)
    assert isinstance(metrics["plot"], StubWandb.Image)
    assert isinstance(metrics["latents"], StubWandb.Html)
    assert metrics["scalar"] == 3.0
    # JSONL keeps plain strings
    rows = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["movie"].endswith("m.gif")


def test_backbone_3d_render(tmp_path):
    """3-D backbone renderer (notebook cell 31 parity): per-frame PNGs,
    stitched movie, embeddable HTML."""
    from molecular_dynamics_neural_operator_tpu.utils.backbone import (
        render_backbone_trajectory,
    )

    rng = np.random.default_rng(2)
    chain = np.cumsum(rng.normal(size=(5, 14, 3)), axis=1).astype(np.float32)
    out = render_backbone_trajectory(tmp_path, list(chain), list(chain))
    assert len(out["frames"]) == 5
    if out["frames"][0].suffix == ".png":  # matplotlib present
        assert "html" in out
        assert "data:image/png;base64," in out["html"].read_text()
        assert out["movie"].suffix in (".gif", ".mp4")


def test_movie_renders(tmp_path):
    from molecular_dynamics_neural_operator_tpu.utils.movie import (
        render_propagation_movie,
        select_starting_points,
    )

    rng = np.random.default_rng(0)
    maps = [(rng.random((12, 12)) > 0.5).astype(np.float32) for _ in range(4)]
    out = render_propagation_movie(tmp_path, 0, maps, maps)
    assert out.exists()
    pts = select_starting_points(200, 10)
    assert len(pts) == 3 and pts[0] == 0 and pts[1] > 0 and pts[2] > pts[1]


def test_restore_subtree_names_shape_mismatch(tmp_path):
    """A config-mismatched checkpoint restore fails with an error naming
    the leaf (not an opaque jit shape error)."""
    import dataclasses

    import pytest

    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=6, electrostatics="dh")
    state, _, _ = create_train_state(jax.random.PRNGKey(0), cfg,
                                     TrainConfig())
    path = tmp_path / "dh.npz"
    save_checkpoint(path, state, {})
    wrong = gkn_init(jax.random.PRNGKey(0),
                     dataclasses.replace(cfg, electrostatics="none"))
    with pytest.raises(ValueError, match=r"fc1.*electrostatics"):
        restore_subtree(path, wrong, ".params")


def test_data_parallel_put_guard():
    import pytest

    from molecular_dynamics_neural_operator_tpu.parallel.mesh import (
        data_parallel_put,
    )

    n = len(jax.devices())
    mesh, put = data_parallel_put(n * 2)  # divisible: ok
    assert mesh.devices.size == n
    with pytest.raises(ValueError, match="divisible"):
        data_parallel_put(n * 2 + 1)


def test_restore_subtree_bare_params_npz(tmp_path):
    """Checkpoints that store the bare params pytree (no '.params/' key
    prefix — e.g. tools/bench_ckpt.npz, written via np.savez of the flat
    params dict) load through the same restore_subtree call."""
    import numpy as np

    from molecular_dynamics_neural_operator_tpu.models import gkn_init
    from molecular_dynamics_neural_operator_tpu.utils.checkpoint import (
        restore_subtree,
    )

    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=3,
                      num_residues=6)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    path = tmp_path / "bare.npz"
    np.savez(path, **{
        "/".join(str(k.key) for k in p): np.asarray(v) for p, v in flat
    })  # no sidecar .json either
    template = gkn_init(jax.random.PRNGKey(1), cfg)
    restored, meta = restore_subtree(path, template, ".params")
    assert meta == {}
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
