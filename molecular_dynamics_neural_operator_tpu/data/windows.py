"""Sliding-window dataset and batch assembly.

Replaces the reference's ``ContactMapDataset.__getitem__``
(``/root/reference/dataset.py:177-227``) and PyG's list-of-graphs batching.
Window/horizon indexing semantics are identical:

- ``len = N - window_size - horizon + 1`` (``dataset.py:177-178``),
- window = positions[idx : idx + window_size] (``dataset.py:185``),
- graph = contact map of frame ``idx`` — the FIRST window frame
  (``dataset.py:189``),
- target y = positions[idx + window_size + horizon - 1] (``dataset.py:182``).

Host-side work is fully vectorized: the ragged per-frame COO edge lists are
packed once into a CSR-like (concatenated edges + offsets) layout, and a
whole batch densifies with a single scatter — no per-edge Python loops
(the reference's ``dataset.py:194-201`` hot spot). Edge *features* are not
built on the host at all; they are computed on device from the window
coordinates (``geometry.dense_edge_features``), which also cuts host->HBM
traffic. A batch is a dict of numpy arrays ready for ``device_put``:

    {"aa": (R,), "window": (B, T, R, 3), "y": (B, R, 3),
     "adj": (B, R, R) f32}                          # dense mode
    {"aa", "window", "y", "edges": (B, 2, E), "mask": (B, E)}  # sparse mode
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np

from molecular_dynamics_neural_operator_tpu.data import packing
from molecular_dynamics_neural_operator_tpu.data.h5 import TrajectoryData


class WindowDataset:
    def __init__(
        self,
        traj: TrajectoryData,
        window_size: int = 10,
        horizon: int = 1,
        threshold: float = 8.0,
        graph_mode: str = "dense",  # "dense" | "sparse" | "none"
        max_edges: int = 384,
        use_stored_contact_maps: bool = True,
        use_native: bool = True,
        edge_layout: str = "csr",  # "csr" | "blocked"
    ):
        if traj.num_frames - window_size - horizon + 1 < 0:
            raise ValueError(
                "The sum of window_size and horizon is longer than the input data"
            )
        self.traj = traj
        self.window_size = window_size
        self.horizon = horizon
        self.threshold = threshold
        self.graph_mode = graph_mode
        self.max_edges = max_edges
        self.use_stored_contact_maps = use_stored_contact_maps
        # Native C++ packer (csrc/packing.cpp) with transparent numpy
        # fallback when the toolchain/library is unavailable.
        self.use_native = use_native and packing.available()
        self.num_residues = traj.num_residues
        if edge_layout not in ("csr", "blocked"):
            raise ValueError(f"unknown edge_layout: {edge_layout}")
        self.edge_layout = edge_layout
        if edge_layout == "blocked":
            # Cell-list block layout for TRAINING graphs: edge slot
            # n*max_degree + d targets node n, so the batched conv's
            # edges->nodes aggregation becomes a dense per-node reduction
            # (edge_conv.py scatter_mode="blocked") instead of a vmapped
            # segment_sum — the scatter-free win that previously covered
            # rollout only (geometry/cells.py layout).
            if graph_mode != "sparse":
                raise ValueError("edge_layout='blocked' requires sparse "
                                 "graph_mode")
            if max_edges % traj.num_residues:
                raise ValueError(
                    f"blocked layout needs max_edges divisible by "
                    f"num_residues; got {max_edges} % {traj.num_residues}"
                )
            self.max_degree = max_edges // traj.num_residues

        if use_stored_contact_maps:
            # CSR-like packing of the ragged COO lists (one concatenation,
            # O(1) slicing per frame). load_trajectory already delivers the
            # packed form; list-built TrajectoryData packs (and caches) here.
            self._edges_flat, self._offsets = traj.packed_edges()
            counts = np.diff(self._offsets)
            self._max_stored = int(counts.max()) if len(counts) else 0
            if graph_mode == "sparse" and self._max_stored > max_edges:
                raise ValueError(
                    f"stored edge count {self._max_stored} exceeds "
                    f"max_edges {max_edges}"
                )
            if edge_layout == "blocked":
                # Validate the binding per-node constraint up front: a
                # single high-degree frame would otherwise abort hours
                # into an epoch from inside the prefetch producer. One
                # chunked bincount pass over the packed edges, O(total).
                max_deg = self._max_stored_in_degree()
                if max_deg > self.max_degree:
                    raise ValueError(
                        f"stored max in-degree {max_deg} exceeds the "
                        f"blocked layout's max_degree {self.max_degree} "
                        f"(= max_edges {max_edges} / num_residues "
                        f"{traj.num_residues}); raise max_edges to at "
                        f"least {max_deg * traj.num_residues}"
                    )

    def _max_stored_in_degree(self, chunk: int | None = None) -> int:
        """Max per-(frame, target-node) in-degree over all stored edge
        lists, computed in bounded-memory chunks of frames. As a side
        effect fills ``self._slot_flat``: each stored edge's precomputed
        block-layout slot (dst * max_degree + within-group rank), so
        batch assembly is a pure gather + scatter — no per-batch argsort
        (the slot of an edge is frame-static)."""
        r = self.num_residues
        if chunk is None:
            # the grouping key array spans (chunk * r) values: bound the
            # pass at ~1 GB regardless of node count (131072 frames at
            # BBA's r=28, ~13k frames at r=10,000) instead of a fixed
            # frame count.
            chunk = max(1, (1 << 27) // max(r, 1))
        nf = len(self._offsets) - 1
        total = int(self._offsets[-1])
        self._slot_flat = np.zeros(total, np.int64)
        m = 0
        for i0 in range(0, nf, chunk):
            i1 = min(i0 + chunk, nf)
            s, e = int(self._offsets[i0]), int(self._offsets[i1])
            if e == s:
                continue
            dst = self._edges_flat[1, s:e].astype(np.int64)
            counts = np.diff(self._offsets[i0:i1 + 1])
            owner = np.repeat(np.arange(i1 - i0, dtype=np.int64), counts)
            key = owner * r + dst
            order = np.argsort(key, kind="stable")
            sk = key[order]
            change = np.ones(len(sk), bool)
            change[1:] = sk[1:] != sk[:-1]
            group_start = np.flatnonzero(change)
            group_id = np.cumsum(change) - 1
            rank = np.arange(len(sk)) - group_start[group_id]
            m = max(m, int(rank.max()) + 1)
            slot = np.empty(len(sk), np.int64)
            slot[order] = dst[order] * self.max_degree + rank
            self._slot_flat[s:e] = slot
        return m

    def __len__(self) -> int:
        return self.traj.num_frames - self.window_size - self.horizon + 1

    # -- batch assembly ----------------------------------------------------

    def _windows(self, idx: np.ndarray):
        t = self.window_size
        window = None
        if self.use_native:
            window = packing.gather_windows(self.traj.positions, idx, t)
        if window is None:
            gather = idx[:, None] + np.arange(t)[None, :]
            window = self.traj.positions[gather]  # (B, T, R, 3)
        y = self.traj.positions[idx + t + self.horizon - 1]
        return window.astype(np.float32, copy=False), y.astype(np.float32)

    def _dense_adj(self, idx: np.ndarray) -> np.ndarray:
        """Densify the stored contact maps of frames ``idx`` with one scatter."""
        b = len(idx)
        r = self.num_residues
        if self.use_stored_contact_maps:
            if self.use_native:
                out = packing.pack_dense_batch(
                    self._edges_flat, self._offsets, idx, r
                )
                if out is not None:
                    return out
            starts = self._offsets[idx]
            ends = self._offsets[idx + 1]
            counts = ends - starts
            # flat indices of every edge in the batch
            edge_slots = np.concatenate(
                [np.arange(s, e) for s, e in zip(starts, ends)]
            ) if b else np.zeros(0, np.int64)
            owner = np.repeat(np.arange(b), counts)
            src = self._edges_flat[0, edge_slots].astype(np.int64)
            dst = self._edges_flat[1, edge_slots].astype(np.int64)
            adj = np.zeros((b, r, r), np.float32)
            adj[owner, src, dst] = 1.0
            return adj
        # recompute from coordinates (first window frame)
        pos = self.traj.positions[idx]  # (B, R, 3)
        d2 = np.sum(
            (pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1
        )
        return (d2 < self.threshold**2).astype(np.float32)

    def _blocked_pack(self, owner, src, dst, b: int):
        """Pack batch COO (owner, src, dst) into the cell-list block
        layout: each target node n owns slots [n*max_degree,
        (n+1)*max_degree); its incoming edges fill them front-to-back.
        Fully vectorized (one stable argsort over the batch's edges)."""
        r = self.num_residues
        max_deg = self.max_degree
        # Rank of each edge within its (example, target-node) group.
        key = owner * r + dst
        order = np.argsort(key, kind="stable")
        sk = key[order]
        change = np.ones(len(sk), bool)
        change[1:] = sk[1:] != sk[:-1]
        group_start = np.flatnonzero(change)
        group_id = np.cumsum(change) - 1
        rank = np.arange(len(sk)) - group_start[group_id]
        if len(rank) and int(rank.max()) >= max_deg:
            raise ValueError(
                f"node in-degree {int(rank.max()) + 1} exceeds the blocked "
                f"layout's max_degree {max_deg} "
                f"(= max_edges {self.max_edges} / num_residues {r})"
            )

        slot = dst[order] * max_deg + rank
        ow = owner[order]
        edges = np.zeros((b, 2, self.max_edges), np.int32)
        mask = np.zeros((b, self.max_edges), np.float32)
        edges[ow, 0, slot] = src[order]
        edges[ow, 1, slot] = dst[order]
        mask[ow, slot] = 1.0
        return edges, mask

    def _sparse_edges_blocked(self, idx: np.ndarray):
        """(B, 2, E) + mask in the block layout, from the stored COO lists
        or (``use_stored_contact_maps=False``) from adjacency recomputed
        off the coordinates — BOTH paths emit the blocked layout, since a
        model configured with scatter_mode='blocked' reduces by slot
        position and would silently mis-aggregate CSR-packed edges."""
        b = len(idx)
        if not self.use_stored_contact_maps:
            ow, src, dst = np.nonzero(self._dense_adj(idx))
            return self._blocked_pack(ow, src.astype(np.int64),
                                      dst.astype(np.int64), b)
        # Stored path: slots were precomputed at construction
        # (``_slot_flat``), so a batch is one vectorized range-gather plus
        # a scatter — no per-batch argsort or Python per-frame loop (this
        # feeds the prefetch producer on a 1-core host).
        starts = self._offsets[idx].astype(np.int64)
        ends = self._offsets[idx + 1].astype(np.int64)
        counts = ends - starts
        live = counts > 0
        total = int(counts.sum())
        if total:
            st, en = starts[live], ends[live]
            jump = np.ones(total, np.int64)
            jump[0] = st[0]
            cs = np.cumsum(counts[live])
            jump[cs[:-1]] = st[1:] - en[:-1] + 1
            edge_slots = np.cumsum(jump)
        else:
            edge_slots = np.zeros(0, np.int64)
        owner = np.repeat(np.arange(b), counts)
        slot = self._slot_flat[edge_slots]
        edges = np.zeros((b, 2, self.max_edges), np.int32)
        mask = np.zeros((b, self.max_edges), np.float32)
        edges[owner, 0, slot] = self._edges_flat[0, edge_slots]
        edges[owner, 1, slot] = self._edges_flat[1, edge_slots]
        mask[owner, slot] = 1.0
        return edges, mask

    def _sparse_edges(self, idx: np.ndarray):
        """Padded edge lists (B, 2, E) + mask (B, E) from stored COO."""
        if self.edge_layout == "blocked":
            return self._sparse_edges_blocked(idx)
        b = len(idx)
        e_max = self.max_edges
        edges = np.zeros((b, 2, e_max), np.int32)
        mask = np.zeros((b, e_max), np.float32)
        if self.use_stored_contact_maps:
            if self.use_native:
                out = packing.pack_padded_batch(
                    self._edges_flat, self._offsets, idx, e_max
                )
                if out is not None:
                    return out
            starts = self._offsets[idx]
            ends = self._offsets[idx + 1]
            for i, (s, e) in enumerate(zip(starts, ends)):
                n = e - s
                edges[i, :, :n] = self._edges_flat[:, s:e]
                mask[i, :n] = 1.0
        else:
            adj = self._dense_adj(idx)
            for i in range(b):
                s, d = np.nonzero(adj[i])
                n = len(s)
                if n > e_max:
                    raise ValueError(f"edge count {n} exceeds max_edges {e_max}")
                edges[i, 0, :n] = s
                edges[i, 1, :n] = d
                mask[i, :n] = 1.0
        return edges, mask

    def dense_adj(self, frame_idx: int) -> np.ndarray:
        """Public single-frame dense adjacency (R, R) — e.g. the "real"
        contact map for movie rendering."""
        return self._dense_adj(np.asarray([frame_idx], np.int64))[0]

    def get_batch(self, idx: Sequence[int],
                  rollout_horizon: int = 0) -> dict:
        """Assemble a batch. With ``rollout_horizon=K > 0`` also attaches
        ``y_seq`` (B, K, R, 3): the K ground-truth frames following each
        window, for the multi-step rollout curriculum
        (train/curriculum.py). Indices must satisfy
        idx + window_size + K <= num_frames."""
        idx = np.asarray(idx, np.int64)
        window, y = self._windows(idx)
        out = {
            "aa": self.traj.aminoacids,
            "window": window,
            "y": y,
        }
        if rollout_horizon > 0:
            t = self.window_size
            gather = idx[:, None] + t + np.arange(rollout_horizon)[None, :]
            if gather.max() >= self.traj.num_frames:
                raise ValueError(
                    "rollout_horizon exceeds trajectory length for these "
                    "indices"
                )
            out["y_seq"] = self.traj.positions[gather].astype(np.float32)
        if self.graph_mode == "dense":
            out["adj"] = self._dense_adj(idx)
        elif self.graph_mode == "sparse":
            edges, mask = self._sparse_edges(idx)
            out["edges"] = edges
            out["mask"] = mask
        # graph_mode == "none": window/target only (e.g. the FNO path,
        # which featurizes distance matrices on device and never reads a
        # graph) — skips the host adjacency packing and transfer entirely.
        return out


def batch_iterator(
    dataset: WindowDataset,
    indices: Sequence[int],
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    epoch: int = 0,
    rollout_horizon: int = 0,
    pad_last: bool = False,
) -> Iterator[dict]:
    """Deterministic shuffled batch stream (epoch folds into the seed).
    With ``rollout_horizon=K``, indices whose K-step continuation would run
    past the trajectory are dropped and batches carry ``y_seq``.

    ``pad_last=True`` (with ``drop_last=False``) pads the remainder batch
    up to ``batch_size`` by repeating its last index and attaches a ``w``
    (B,) 0/1 weight vector — every batch then has the SAME static shape,
    so evaluation never recompiles for the remainder."""
    indices = np.asarray(indices, np.int64)
    if rollout_horizon > 0:
        limit = (
            dataset.traj.num_frames - dataset.window_size - rollout_horizon
        )
        indices = indices[indices <= limit]
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        indices = rng.permutation(indices)
    n = len(indices)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        idx = indices[i : i + batch_size]
        real = len(idx)
        if pad_last and real < batch_size and real > 0:
            idx = np.concatenate(
                [idx, np.full(batch_size - real, idx[-1], np.int64)]
            )
        batch = dataset.get_batch(idx, rollout_horizon=rollout_horizon)
        if pad_last:
            w = np.zeros((len(idx),), np.float32)
            w[:real] = 1.0
            batch["w"] = w
        yield batch
