"""Continuous-batching rollout server: many concurrent trajectories, one chip.

The reference has no online-serving story — inference is a notebook cell
re-running ``recursive_propagation`` one trajectory at a time
(``/root/reference/bba_analysis.ipynb`` cells 12-20,
``/root/reference/graph_kernel.py:396-413``). On TPU the economics are
different: the per-chip rollout throughput is ~flat in the stream count
(HBM-bound, see docs/PERFORMANCE.md "Multi-stream serving"), so a serving
host wants to batch every concurrent request onto the stream axis of ONE
compiled program rather than queue them end to end.

XLA wants static shapes; requests arrive whenever they like and ask for
whatever horizon they like. The bridge is the same iteration-level
scheduling trick LLM serving uses, at rollout-segment granularity:

- The server compiles ONE segment program per (quantized) stream count:
  ``vmap``-over-streams of the jitted ``rollout_scan`` for a fixed
  ``segment_steps`` horizon, returning each stream's collected coordinates
  AND its final window (the autoregressive carry).
- A scheduler thread packs all in-flight requests onto the stream axis,
  runs one segment, scatters the results, and re-packs. Requests join and
  leave at segment boundaries — a 10,000-step request and a 100-step
  request share the chip instead of the short one waiting behind the long
  one.
- Stream counts are quantized to powers of two (pad slots replay a live
  window and are discarded), so the compile cache holds at most
  ``log2(max_streams) + 1`` programs no matter the traffic pattern.

Segment chaining is exact: ``lax.scan`` over 64 steps then 36 from the
carried window runs the identical op sequence as one 100-step scan, so a
request's stitched trajectory is bitwise what a dedicated single-stream
rollout would have produced (pinned in tests/test_serving_server.py).

``impl="persistent"`` swaps the segment program for the grid-over-steps
Pallas kernel (``ops/pallas/persistent_rollout.py``) whose in-kernel
stream loop keeps weights VMEM-resident; it requires every request to
share one amino-acid sequence (the kernel embeds it once), which matches
the deployment it exists for — many concurrent forecasts of one protein.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import Future
from typing import Optional

import numpy as np

__all__ = ["RolloutResult", "RolloutServer"]


@dataclasses.dataclass(frozen=True)
class RolloutResult:
    """What a completed request resolves to."""

    coords: np.ndarray  # (num_steps, R, 3) float32 predicted coordinates
    final_window: np.ndarray  # (T, R, 3) — resubmit to continue the stream
    # A graph rebuild hit a static capacity en route. CONSERVATIVE on the
    # final (tail) segment: the program always runs the full segment
    # quantum, and the flag ORs over all of it, so an overflow occurring
    # only in the discarded overhang steps (beyond the request's last
    # served step) still flags the request. False therefore proves every
    # served step was overflow-free; True may be a false positive from the
    # overhang of the last partial segment.
    edge_overflow: bool


@dataclasses.dataclass
class _Request:
    aa: np.ndarray  # (R,) int32
    window: object  # (T, R, 3) carry: host np at submit, device after
    remaining: int
    chunks: list  # device handles, (take_i, R, 3) each, read at completion
    overflow: object  # None, then a device bool scalar OR'd per segment
    future: Future


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _pad_size(n: int, max_streams: int, shards: int) -> int:
    """Quantized stream count for a batch of n requests: shards x a power
    of two (so each device gets an identical local shard), capped at
    max_streams. Bounds the compile cache at log2(max/shards)+1 programs."""
    return min(shards * _next_pow2(-(-n // shards)), max_streams)


@dataclasses.dataclass
class _SegmentMarker:
    """Pacing token: the reader device_gets it, which (a) bounds how far
    the scheduler can dispatch ahead of the chip (the read queue is
    bounded) and (b) overlaps result transfers with the next segment's
    compute instead of serializing them."""

    handle: object


class _Glue:
    """Jitted scheduler glue. Eager ``jnp`` ops pay a per-dispatch RPC on
    remote-attached backends (~14 ms each on the axon tunnel, measured),
    and the scheduler issues ~4 per active request per segment — which at
    segment_steps=256 cost MORE than the segment's compute. Jitted calls
    dispatch in ~0.06 ms, so every per-segment device op goes through one
    of these (one tiny compile per array shape, batch sizes are quantized
    so the cache stays small)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        self.stack = jax.jit(lambda ws: jnp.stack(ws))
        # python-int index traces as a weak scalar: ONE compile serves
        # every slot index of a given array shape.
        self.index = jax.jit(
            lambda a, i: jax.lax.dynamic_index_in_dim(a, i, 0, False)
        )
        self.or_ = jax.jit(lambda a, b: a | b)


class RolloutServer:
    """Batches concurrent autoregressive-rollout requests onto one chip.

    ``submit(aa, window, num_steps)`` returns a ``concurrent.futures.
    Future`` resolving to a :class:`RolloutResult`. Any number of threads
    (or socket handlers — see ``cli/serve.py``) may submit concurrently;
    everything in flight shares each compiled segment.

    Knobs:

    - ``segment_steps``: scheduling quantum. Joins/leaves happen at segment
      boundaries, and a request's tail segment computes the full quantum
      with the overhang discarded host-side — so small values cut both
      join latency and tail waste, large values amortize the per-segment
      host round-trip. 64 is a good default on the tunnel-attached chip.
    - ``max_streams``: stream-axis capacity per segment. Per-chip rollout
      throughput is ~flat in streams, so this bounds VMEM/HBM pressure and
      per-request latency spread, not aggregate speed.
    - ``impl``: "scan" (XLA, per-request amino-acid sequences) or
      "persistent" (Pallas kernel, one shared sequence passed as ``aa``).
    - ``mesh``: shard the batch's stream axis over a device mesh's
      ``data_axis`` (impl="scan") — multi-chip serving from one front
      door. Streams are independent, so aggregate capacity is
      chips x per-chip rate with zero inter-chip traffic during the
      segment; batch sizes quantize to mesh-size x powers of two.

    Pipelining: the scheduler thread only dispatches (XLA dispatch is
    async; each request's carry window stays on device as a lazy slice of
    the previous segment's outputs), while a reader thread materializes
    finished requests — host transfers overlap the next segment's
    compute, and a bounded queue caps dispatch-ahead at ~8 segments.
    Cost: a request's predicted coordinates stay resident on device until
    it completes (num_steps x R x 3 floats per request). For huge-system
    x long-horizon requests where that matters, split the horizon
    client-side — ``final_window`` is designed to be resubmitted.
    """

    def __init__(
        self,
        params,
        cfg,
        *,
        segment_steps: int = 64,
        max_streams: int = 8,
        threshold: float = 8.0,
        clip: Optional[float] = None,
        impl: str = "scan",
        aa: Optional[np.ndarray] = None,
        stream_chunk: Optional[int] = None,
        mesh=None,
        data_axis: str = "data",
    ):
        if segment_steps < 1:
            raise ValueError("segment_steps must be >= 1")
        if max_streams < 1:
            raise ValueError("max_streams must be >= 1")
        if impl not in ("scan", "persistent"):
            raise ValueError(f"unknown impl: {impl!r}")
        if impl == "persistent" and aa is None:
            raise ValueError(
                "impl='persistent' embeds one amino-acid sequence in the "
                "kernel; pass it as aa= (every request must match it)"
            )
        if stream_chunk is not None and impl != "scan":
            raise ValueError("stream_chunk applies to impl='scan' only")
        if mesh is not None:
            if impl != "scan":
                raise ValueError(
                    "mesh sharding applies to impl='scan' (the persistent "
                    "kernel is a per-chip program; run one server per chip)"
                )
            n = mesh.shape[data_axis]
            if max_streams % n:
                raise ValueError(
                    f"max_streams {max_streams} must be divisible by the "
                    f"'{data_axis}' axis size {n}"
                )
        self._mesh = mesh
        self._data_axis = data_axis
        self._shards = 1 if mesh is None else int(mesh.shape[data_axis])
        self._params = params
        self._cfg = cfg
        self._segment_steps = int(segment_steps)
        self._max_streams = int(max_streams)
        self._threshold = float(threshold)
        self._clip = clip
        self._impl = impl
        self._stream_chunk = stream_chunk
        self._server_aa = None if aa is None else np.asarray(aa, np.int32)

        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._active: list[_Request] = []
        self._stats_lock = threading.Lock()
        self._stats = {
            "segments_run": 0,
            "steps_computed": 0,  # segment_steps x padded stream count
            "steps_served": 0,  # steps that landed in a request's output
            "requests_completed": 0,
        }
        self._stopping = False
        self._cancel = False
        self._fatal: Optional[BaseException] = None
        self._glue = _Glue()
        self._segment = self._build_segment()
        # Software pipeline: the scheduler thread only DISPATCHES segments
        # (XLA dispatch is async; request carries stay on device as lazy
        # slices of the previous segment's outputs), and this reader thread
        # materializes finished requests — so host transfers overlap the
        # next segment's compute. The bounded queue is the back-pressure:
        # at most maxsize dispatched-but-unread segments in flight.
        self._read_queue: "queue.Queue" = queue.Queue(maxsize=8)
        self._reader = threading.Thread(
            target=self._reader_loop, name="rollout-server-reader",
            daemon=True,
        )
        self._reader.start()
        self._thread = threading.Thread(
            target=self._scheduler_loop, name="rollout-server", daemon=True
        )
        self._thread.start()

    # -- compiled segment -------------------------------------------------

    def _build_segment(self):
        import jax

        cfg = self._cfg
        if self._impl == "persistent":
            from molecular_dynamics_neural_operator_tpu.ops.pallas.persistent_rollout import (  # noqa: E501
                make_persistent_rollout_fn,
            )

            roll = make_persistent_rollout_fn(
                cfg, self._segment_steps, self._threshold, clip=self._clip
            )
            aa_dev = jax.numpy.asarray(self._server_aa)

            def run(params, aa_b, win_b):
                # aa_b is validated identical across the batch at submit
                # time; the kernel takes the single shared sequence.
                return roll(params, aa_dev, win_b)

            return run

        from molecular_dynamics_neural_operator_tpu.rollout.scan import (
            rollout_scan,
        )

        def one(params, a, w):
            return rollout_scan(
                params, cfg, a, w, self._segment_steps, self._threshold,
                "last", "coords", self._clip,
            )

        if self._mesh is not None:
            # Multi-chip serving: the batch's stream axis (and each
            # request's amino-acid sequence) shards over the mesh; every
            # device runs the segment scan on its local streams with zero
            # inter-chip traffic (streams are independent; the per-stream
            # overflow diagnostic stays sharded too).
            from functools import partial

            from jax.sharding import PartitionSpec as P

            def local(params, aa_b, win_b):
                return jax.vmap(lambda a, w: one(params, a, w))(aa_b, win_b)

            # check_vma=False for the same reason as rollout_sharded.py:
            # the scan's overflow carry starts device-invariant and turns
            # device-varying mid-scan, which the checker rejects.
            sh = P(self._data_axis)
            return jax.jit(partial(
                jax.shard_map,
                mesh=self._mesh,
                in_specs=(P(), sh, sh),
                out_specs=((sh, sh, {"edge_overflow": sh})),
                check_vma=False,
            )(local))

        def segment(params, aa_b, win_b):
            run = jax.vmap(lambda a, w: one(params, a, w))
            if self._stream_chunk is None:
                return run(aa_b, win_b)
            s = aa_b.shape[0]
            c = self._stream_chunk
            if s % c:  # pad sizes are powers of two; enforced in __init__
                return run(aa_b, win_b)
            resh = lambda x: x.reshape((s // c, c) + x.shape[1:])  # noqa: E731
            out = jax.lax.map(lambda ab: run(*ab), (resh(aa_b), resh(win_b)))
            return jax.tree_util.tree_map(
                lambda x: x.reshape((s,) + x.shape[2:]), out
            )

        return jax.jit(segment)

    # -- public API --------------------------------------------------------

    def submit(self, aa, window, num_steps: int) -> Future:
        """Enqueue one rollout request; returns a Future[RolloutResult]."""
        cfg = self._cfg
        if self._stopping:
            raise RuntimeError("server is shut down")
        if self._fatal is not None:
            raise RuntimeError(
                "server scheduler died"
            ) from self._fatal
        aa = np.asarray(aa, np.int32)
        window = np.asarray(window, np.float32)
        r, t = cfg.num_residues, cfg.window_size
        if aa.shape != (r,):
            raise ValueError(f"aa must be ({r},), got {aa.shape}")
        if window.shape != (t, r, 3):
            raise ValueError(
                f"window must be ({t}, {r}, 3), got {window.shape}"
            )
        if int(num_steps) < 1:
            raise ValueError("num_steps must be >= 1")
        if self._server_aa is not None and not np.array_equal(
            aa, self._server_aa
        ):
            raise ValueError(
                "impl='persistent' serves one amino-acid sequence; the "
                "request's aa differs from the server's"
            )
        req = _Request(aa=aa, window=window, remaining=int(num_steps),
                       chunks=[], overflow=None, future=Future())
        self._queue.put(req)
        return req.future

    def rollout(self, aa, window, num_steps: int,
                timeout: Optional[float] = None) -> RolloutResult:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(aa, window, num_steps).result(timeout=timeout)

    def warmup(self, batch_sizes=None) -> None:
        """Pre-compile segment programs so first requests don't pay the
        trace+compile. Default: every quantized size up to max_streams."""
        import jax

        cfg = self._cfg
        if batch_sizes is None:
            batch_sizes, s = [], self._shards
            while s <= self._max_streams:
                batch_sizes.append(s)
                s *= 2
            # The doubling sequence can skip the live full-load size when
            # max_streams is not shards * 2^k (e.g. shards=4, max=12 warms
            # 4 and 8, but _pad_size can emit 12) — warm it explicitly.
            if batch_sizes[-1] != self._max_streams:
                batch_sizes.append(self._max_streams)
        r, t = cfg.num_residues, cfg.window_size
        aa = (np.zeros((r,), np.int32) if self._server_aa is None
              else self._server_aa)
        win = np.zeros((t, r, 3), np.float32)
        for s in batch_sizes:
            coords, final_w, diags = self._segment(
                self._params,
                np.broadcast_to(aa, (s, r)).copy(),
                np.broadcast_to(win, (s, t, r, 3)).copy(),
            )
            # pre-trace the scheduler glue at this batch size too, so the
            # first live segment pays zero compiles
            over = diags["edge_overflow"]
            self._glue.index(coords, 0)
            w0 = self._glue.index(final_w, 0)
            if getattr(over, "ndim", 0):
                ov = self._glue.index(over, 0)
                self._glue.or_(ov, ov)
            out = self._glue.stack([w0] * s)
            jax.block_until_ready(out)

    @property
    def stats(self) -> dict:
        with self._stats_lock:
            out = dict(self._stats)
        out["occupancy"] = (
            out["steps_served"] / out["steps_computed"]
            if out["steps_computed"] else 0.0
        )
        return out

    def close(self, drain: bool = True) -> None:
        """Stop the scheduler. ``drain=True`` serves everything already
        submitted first; ``drain=False`` cancels queued+active requests."""
        self._stopping = True
        self._cancel = not drain  # the scheduler thread does the dropping
        self._queue.put(None)  # wake the scheduler
        self._thread.join()
        self._read_queue.put(None)  # scheduler is done enqueueing reads
        self._reader.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close(drain=exc == (None, None, None))

    # -- scheduler ---------------------------------------------------------

    def _drop_pending(self, err: BaseException) -> None:
        for req in self._active:
            req.future.set_exception(err)
        self._active = []
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req is not None:
                req.future.set_exception(err)

    def _admit(self) -> bool:
        """Move queued requests into the active set. Blocks when idle.
        Returns False when the server should exit."""
        block = not self._active
        while len(self._active) < self._max_streams:
            try:
                req = self._queue.get(timeout=0.05 if block else 0)
            except queue.Empty:
                if not block:
                    return True
                if self._stopping:
                    return False
                continue
            if req is None:  # close() sentinel
                if self._stopping and not self._active \
                        and self._queue.empty():
                    return False
                continue
            self._active.append(req)
            block = False
        return True

    def _scheduler_loop(self) -> None:
        import jax.numpy as jnp

        seg = self._segment_steps
        t_len = self._cfg.window_size
        try:
            while True:
                if self._cancel:
                    self._drop_pending(RuntimeError("server shut down"))
                    return
                if not self._admit():
                    return
                if not self._active:
                    continue
                batch = self._active
                s_pad = _pad_size(len(batch), self._max_streams,
                                  self._shards)
                aa_b = np.stack(
                    [batch[i % len(batch)].aa for i in range(s_pad)]
                )
                wins = [batch[i % len(batch)].window for i in range(s_pad)]
                win_b = (np.stack(wins)
                         if all(isinstance(w, np.ndarray) for w in wins)
                         else self._glue.stack(
                             [np.asarray(w, np.float32)
                              if isinstance(w, np.ndarray) else w
                              for w in wins]))
                # async dispatch: nothing below reads a device value
                coords, final_w, diags = self._segment(
                    self._params, aa_b, win_b
                )
                over = diags["edge_overflow"]
                over_scalar = getattr(over, "ndim", 0) == 0
                served = 0
                still_active, completed = [], []
                for i, req in enumerate(batch):
                    take = min(req.remaining, seg)
                    full = self._glue.index(coords, i)
                    chunk = full if take == seg else full[:take]
                    req.chunks.append(chunk)
                    if take == seg:
                        req.window = self._glue.index(final_w, i)
                    else:
                        # tail segment: the program ran the full quantum;
                        # re-derive the carry after only `take` steps
                        req.window = jnp.concatenate(
                            [jnp.asarray(req.window, jnp.float32), chunk],
                            axis=0,
                        )[-t_len:]
                    ov = over if over_scalar else self._glue.index(over, i)
                    req.overflow = (ov if req.overflow is None
                                    else self._glue.or_(req.overflow, ov))
                    req.remaining -= take
                    served += take
                    (still_active if req.remaining
                     else completed).append(req)
                self._active = still_active
                with self._stats_lock:
                    self._stats["segments_run"] += 1
                    self._stats["steps_computed"] += s_pad * seg
                    self._stats["steps_served"] += served
                for req in completed:
                    self._read_queue.put(req)
                # Pacing marker every 8th segment (not every segment): a
                # marker read costs one device round trip (~0.4 s on the
                # tunnel) REGARDLESS of data size, and with a marker per
                # segment the bounded read queue paces dispatch at that
                # round trip — slower than the segment's own compute.
                # Every 8th bounds dispatch-ahead at ~64 segments (a few
                # tens of MB of resident coords) while the pacing cost
                # amortizes to ~50 ms/segment; completed-request reads
                # provide the fine-grained sync under real traffic.
                if self._stats["segments_run"] % 8 == 0:
                    self._read_queue.put(_SegmentMarker(over))
        except BaseException as e:  # noqa: BLE001 — fail every waiter
            self._fatal = e
            self._drop_pending(e)

    def _reader_loop(self) -> None:
        import jax

        while True:
            item = self._read_queue.get()
            if item is None:
                return
            if isinstance(item, _SegmentMarker):
                try:
                    jax.device_get(item.handle)  # sync to that segment
                except Exception:  # noqa: BLE001 — scheduler reports it
                    pass
                continue
            req = item
            try:
                import jax.numpy as jnp

                # Coalesce the request's per-segment chunks ON DEVICE so
                # completion costs one transfer, not one per segment —
                # the mixed-traffic scenario of tools/serving_server_bench
                # measured 13.3 -> 4.4 s end-to-end on the tunnel-attached
                # chip; on a PCIe-attached host it still saves the
                # per-array transfer overhead.
                coords_dev = (req.chunks[0] if len(req.chunks) == 1
                              else jnp.concatenate(
                                  [jnp.asarray(c) for c in req.chunks],
                                  axis=0))
                coords, window, over = jax.device_get(
                    (coords_dev, req.window, req.overflow)
                )
                coords = np.asarray(coords, np.float32)
                with self._stats_lock:
                    self._stats["requests_completed"] += 1
                req.future.set_result(RolloutResult(
                    coords=coords,
                    final_window=np.asarray(window, np.float32),
                    edge_overflow=bool(np.asarray(over)),
                ))
            except BaseException as e:  # noqa: BLE001
                if not req.future.done():
                    req.future.set_exception(e)
