"""Continuous-batching rollout server: stitched multi-segment results match
a dedicated single-stream rollout, requests batch mid-flight, the persistent
impl slots in, and the TCP front end serves the wire protocol."""

import dataclasses
import json
import socket
import threading

import jax
import numpy as np
import pytest

from molecular_dynamics_neural_operator_tpu.configs import ModelConfig
from molecular_dynamics_neural_operator_tpu.data import synthetic_trajectory
from molecular_dynamics_neural_operator_tpu.models import gkn_init
from molecular_dynamics_neural_operator_tpu.rollout import rollout_scan
from molecular_dynamics_neural_operator_tpu.serving import RolloutServer


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(width=8, ker_width=16, depth=1, window_size=4,
                      num_residues=10, max_edges=128,
                      compute_dtype="float32", predict_delta=True)
    params = gkn_init(jax.random.PRNGKey(0), cfg)
    traj = synthetic_trajectory(num_frames=64, num_residues=10, seed=5)
    return cfg, params, traj


def _direct(params, cfg, aa, w0, n):
    coords, final, diag = rollout_scan(
        params, cfg, np.asarray(aa, np.int32),
        np.asarray(w0, np.float32), n,
    )
    return np.asarray(coords), np.asarray(final)


def test_single_request_matches_direct_rollout(setup):
    cfg, params, traj = setup
    aa = traj.aminoacids
    w0 = traj.positions[:4]
    with RolloutServer(params, cfg, segment_steps=5, max_streams=4) as srv:
        res = srv.rollout(aa, w0, 12)  # 2 full segments + tail of 2
    want, want_final = _direct(params, cfg, aa, w0, 12)
    np.testing.assert_array_equal(res.coords, want)
    np.testing.assert_array_equal(res.final_window, want_final)
    assert res.coords.shape == (12, 10, 3)


def test_tail_shorter_than_window(setup):
    # num_steps=2 < window_size=4: the tail-carry re-derivation path
    cfg, params, traj = setup
    aa, w0 = traj.aminoacids, traj.positions[:4]
    with RolloutServer(params, cfg, segment_steps=8, max_streams=2) as srv:
        res = srv.rollout(aa, w0, 2)
    want, want_final = _direct(params, cfg, aa, w0, 2)
    np.testing.assert_array_equal(res.coords, want)
    np.testing.assert_array_equal(res.final_window, want_final)


def test_concurrent_requests_each_match(setup):
    cfg, params, traj = setup
    aa = traj.aminoacids
    reqs = [(traj.positions[i : i + 4], 3 + 4 * i) for i in range(5)]
    with RolloutServer(params, cfg, segment_steps=4, max_streams=4) as srv:
        futs = [srv.submit(aa, w0, n) for w0, n in reqs]
        results = [f.result(timeout=120) for f in futs]
        stats = srv.stats
    for (w0, n), res in zip(reqs, results):
        want, _ = _direct(params, cfg, aa, w0, n)
        np.testing.assert_allclose(res.coords, want, rtol=1e-4, atol=1e-5)
    assert stats["requests_completed"] == 5
    assert stats["steps_served"] == sum(n for _, n in reqs)
    assert 0 < stats["occupancy"] <= 1


def test_requests_join_mid_flight(setup):
    # a long request is in flight; a short one submitted later must still
    # complete (it joins at a segment boundary) and be correct
    cfg, params, traj = setup
    aa = traj.aminoacids
    with RolloutServer(params, cfg, segment_steps=3, max_streams=4) as srv:
        import time

        long_f = srv.submit(aa, traj.positions[:4], 30)
        # wait until at least one segment ran, then join
        while srv.stats["segments_run"] == 0:
            time.sleep(0.01)
        short_f = srv.submit(aa, traj.positions[8:12], 4)
        short = short_f.result(timeout=120)
        long = long_f.result(timeout=120)
    want_s, _ = _direct(params, cfg, aa, traj.positions[8:12], 4)
    want_l, _ = _direct(params, cfg, aa, traj.positions[:4], 30)
    np.testing.assert_allclose(short.coords, want_s, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(long.coords, want_l, rtol=1e-4, atol=1e-5)


def test_per_request_amino_acid_sequences(setup):
    cfg, params, traj = setup
    rng = np.random.default_rng(3)
    aas = [traj.aminoacids, rng.integers(0, 20, size=10).astype(np.int32)]
    w0 = traj.positions[:4]
    with RolloutServer(params, cfg, segment_steps=4, max_streams=2) as srv:
        futs = [srv.submit(a, w0, 6) for a in aas]
        results = [f.result(timeout=120) for f in futs]
    for a, res in zip(aas, results):
        want, _ = _direct(params, cfg, a, w0, 6)
        np.testing.assert_allclose(res.coords, want, rtol=1e-4, atol=1e-5)


def test_more_requests_than_streams(setup):
    cfg, params, traj = setup
    aa = traj.aminoacids
    with RolloutServer(params, cfg, segment_steps=4, max_streams=2) as srv:
        futs = [srv.submit(aa, traj.positions[i : i + 4], 5)
                for i in range(6)]
        results = [f.result(timeout=120) for f in futs]
    for i, res in enumerate(results):
        want, _ = _direct(params, cfg, aa, traj.positions[i : i + 4], 5)
        np.testing.assert_allclose(res.coords, want, rtol=1e-4, atol=1e-5)


def test_mesh_sharded_serving(setup):
    # multi-chip serving on the 8-device virtual mesh: per-request aa,
    # mixed lengths, results match dedicated rollouts
    cfg, params, traj = setup
    from molecular_dynamics_neural_operator_tpu.configs import MeshConfig
    from molecular_dynamics_neural_operator_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=4, model=2))
    rng = np.random.default_rng(7)
    reqs = [(rng.integers(0, 20, size=10).astype(np.int32),
             traj.positions[i : i + 4], 3 + 2 * i) for i in range(6)]
    with RolloutServer(params, cfg, segment_steps=4, max_streams=8,
                       mesh=mesh) as srv:
        futs = [srv.submit(a, w, n) for a, w, n in reqs]
        results = [f.result(timeout=120) for f in futs]
        stats = srv.stats
    for (a, w, n), res in zip(reqs, results):
        want, _ = _direct(params, cfg, a, w, n)
        np.testing.assert_allclose(res.coords, want, rtol=1e-4, atol=1e-5)
    assert stats["requests_completed"] == 6
    # batch sizes quantize to mesh-size multiples: 6 active -> 8 streams
    assert stats["steps_computed"] % 4 == 0


def test_mesh_requires_divisible_max_streams(setup):
    cfg, params, _ = setup
    from molecular_dynamics_neural_operator_tpu.configs import MeshConfig
    from molecular_dynamics_neural_operator_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=4, model=2))
    with pytest.raises(ValueError, match="divisible"):
        RolloutServer(params, cfg, max_streams=6, mesh=mesh)
    with pytest.raises(ValueError, match="per-chip program"):
        RolloutServer(params, cfg, max_streams=8, mesh=mesh,
                      impl="persistent", aa=np.zeros(10, np.int32))


def test_submit_validation(setup):
    cfg, params, traj = setup
    srv = RolloutServer(params, cfg, segment_steps=4, max_streams=2)
    try:
        with pytest.raises(ValueError, match="aa must be"):
            srv.submit(np.zeros(7, np.int32), traj.positions[:4], 3)
        with pytest.raises(ValueError, match="window must be"):
            srv.submit(traj.aminoacids, traj.positions[:3], 3)
        with pytest.raises(ValueError, match="num_steps"):
            srv.submit(traj.aminoacids, traj.positions[:4], 0)
    finally:
        srv.close()
    with pytest.raises(RuntimeError, match="shut down"):
        srv.submit(traj.aminoacids, traj.positions[:4], 3)


def test_persistent_impl_interpret(setup):
    # interpret-mode Pallas on CPU; shared-aa constraint enforced
    cfg, params, traj = setup
    cfg_p = dataclasses.replace(cfg, graph_mode="sparse")
    aa = np.asarray(traj.aminoacids, np.int32)
    w0 = traj.positions[:4]
    with RolloutServer(params, cfg_p, segment_steps=4, max_streams=2,
                       impl="persistent", aa=aa) as srv:
        other = (aa + 1) % 20
        with pytest.raises(ValueError, match="one amino-acid sequence"):
            srv.submit(other, w0, 3)
        res = srv.rollout(aa, w0, 6)
    from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
        make_persistent_rollout_fn,
    )

    want, want_final, _ = make_persistent_rollout_fn(cfg_p, 6)(
        params, aa, np.asarray(w0, np.float32)
    )
    np.testing.assert_allclose(res.coords, np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_persistent_impl_requires_aa(setup):
    cfg, params, _ = setup
    with pytest.raises(ValueError, match="pass it as aa="):
        RolloutServer(params, cfg, impl="persistent")


def test_warmup_and_stats(setup):
    cfg, params, traj = setup
    with RolloutServer(params, cfg, segment_steps=2, max_streams=4) as srv:
        srv.warmup()
        res = srv.rollout(traj.aminoacids, traj.positions[:4], 2)
        stats = srv.stats
    assert res.coords.shape == (2, 10, 3)
    assert stats["segments_run"] == 1  # warmup doesn't count
    assert stats["occupancy"] == 1.0  # one stream, no pad, no tail waste


def test_close_without_drain_cancels(setup):
    cfg, params, traj = setup
    srv = RolloutServer(params, cfg, segment_steps=2, max_streams=2)
    futs = [srv.submit(traj.aminoacids, traj.positions[:4], 10_000)
            for _ in range(3)]
    srv.close(drain=False)
    for f in futs:
        # either it finished a result already or it was cancelled
        try:
            f.result(timeout=5)
        except RuntimeError as e:
            assert "shut down" in str(e)


def test_tcp_server_end_to_end(setup):
    cfg, params, traj = setup
    from molecular_dynamics_neural_operator_tpu.cli import serve as serve_cli

    args = serve_cli.parse_args(["--port", "0", "--segment_steps", "4",
                                 "--max_streams", "4"])
    ready = {"event": threading.Event()}
    t = threading.Thread(
        target=serve_cli.serve, args=(params, cfg, args),
        kwargs={"ready": ready}, daemon=True,
    )
    t.start()
    assert ready["event"].wait(timeout=60)
    port = ready["port"]
    aa = traj.aminoacids
    w0 = traj.positions[:4]
    with socket.create_connection(("127.0.0.1", port), timeout=60) as s:
        f = s.makefile("rwb")
        req = {"id": "r1", "aa": np.asarray(aa).tolist(),
               "window": np.asarray(w0, np.float32).tolist(),
               "num_steps": 6}
        f.write(json.dumps(req).encode() + b"\n")
        f.flush()
        resp = json.loads(f.readline())
        assert resp["id"] == "r1"
        assert "error" not in resp
        want, want_final = _direct(params, cfg, aa, w0, 6)
        np.testing.assert_array_equal(
            np.asarray(resp["coords"], np.float32), want
        )
        assert resp["edge_overflow"] is False
        # error path keeps the connection alive
        bad = {"id": "r2", "aa": [0], "window": [[0.0]], "num_steps": 1}
        f.write(json.dumps(bad).encode() + b"\n")
        f.flush()
        resp2 = json.loads(f.readline())
        assert resp2["id"] == "r2" and "error" in resp2
        # stats op
        f.write(json.dumps({"op": "stats", "id": "r3"}).encode() + b"\n")
        f.flush()
        resp3 = json.loads(f.readline())
        assert resp3["stats"]["requests_completed"] >= 1
    ready["tcp"].shutdown()
    t.join(timeout=30)
