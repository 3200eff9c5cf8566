"""Persistent grid-over-steps Pallas rollout: the WHOLE autoregressive
rollout as ONE kernel launch.

The XLA rollout (``rollout/scan.py``) re-streams the edge-kernel MLP
weights (~10.5 MB bf16 at reference size) from HBM every step of the scan
— ~13 us of the ~50 us step. Here the scan itself becomes the Pallas grid:
``grid=(num_steps,)`` with every weight bound via a constant index map, so
Mosaic loads them into VMEM once and the revolving-buffer pipeline skips
the re-copy on every subsequent step (TPU grids execute sequentially).
The coordinate window lives in VMEM scratch across grid steps; the only
per-step HBM traffic is the (S, R, 3) output block. Multi-stream serving
((S, T, R, 3) windows) runs a sequential in-kernel stream loop per grid
step — weights stay resident across BOTH loops and live memory is one
stream's intermediates at any S.

Each grid step runs the full reference step semantics
(``/root/reference/graph_kernel.py:396-413`` + ``:362-393``):

1. contact map of the window's LAST frame (broadcast squared distances),
2. padded-edge extraction WITHOUT gather/scatter, in native (R, R) matrix
   layout: per-row contact counts + an exclusive row-offset cumsum via a
   tiny (R, R) triangular matmul, intra-row ranks via a second (R, R)
   matmul, then the source incidence G (E, R) by interval comparison of
   slot ids against the row offsets and the target incidence D by matching
   intra-row ranks on G-gathered rows. Everything is O(R^3 + E*R^2) — the
   earlier flat formulation ranked all R^2 pairs against a (R^2, R^2)
   triangular constant, which cost ~5 us/step at R=28 and capped the
   kernel at 48 residues on VMEM,
3. per-residue LSTM over the window + embedding + fc1,
4. edge-kernel MLP on the MXU (weights resident),
5. 2*depth weight-tied conv layers with the per-edge matvec in REP/RED
   form — duplicate xs across lanes with a 0/1 REP matmul, elementwise
   multiply against the VMEM-resident kernel tensor, reduce groups with a
   0/1 RED matmul (both MXU, f32 accumulation),
6. fc2 head (+ optional delta/clip), window slide in scratch.

Pad residues are pinned at far-apart sentinel coordinates so they never
enter the contact graph; edge overflow (true edge count > capacity) is
accumulated into a diagnostic output. Exact vs the XLA path in f32
(tests/test_persistent_rollout.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from molecular_dynamics_neural_operator_tpu.ops.pallas.fused_gkn import (
    _PALLAS,
    pallas_available,
)

if _PALLAS:  # pragma: no branch
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu


def _hs(cfg) -> float:
    """head_scale, applied only under predict_delta (configs.ModelConfig)."""
    if not cfg.predict_delta:
        return 1.0
    return float(getattr(cfg, "head_scale", 1.0))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _static_mats(r_pad: int, width: int, dtype_str: str):
    """Constant matrices for the (R, R)-layout extraction: identity (the
    G/D layout-laundering matmul), STRICT lower-triangular ones
    (exclusive cumsum of per-row edge counts), upper-triangular ones
    incl. diagonal (inclusive intra-row cumsum: intra = C @ U), plus the
    conv-loop REP (w, w^2) / RED (w^2, w) forms. All f32 except REP/RED,
    which ride the compute dtype. (Transposes inside the kernel use
    native jnp.transpose — a transpose-by-identity-matmul is NOT exact on
    chip: Mosaic's f32 matmuls run at ~bf16-pass precision.)"""
    dt = np.float32
    eye = np.eye(r_pad, dtype=np.float32)
    strict_l = np.tril(np.ones((r_pad, r_pad), np.float32), k=-1)
    u_incl = np.triu(np.ones((r_pad, r_pad), np.float32))
    rep = np.zeros((width, width * width), np.float32)
    for wi in range(width):
        rep[wi, wi * width : (wi + 1) * width] = 1.0
    red = np.zeros((width * width, width), np.float32)
    red[np.arange(width * width), np.arange(width * width) % width] = 1.0
    # RED for the pltpu.repeat (np.tile semantics) layout: K' stores each
    # edge's matrix TRANSPOSED (index v*w + wi), so the tile-expanded xs
    # lines up and the reduction sums contiguous w-groups.
    red_t = np.kron(np.eye(width, dtype=np.float32),
                    np.ones((width, 1), np.float32))
    if dtype_str != "float32":
        import ml_dtypes

        dt = ml_dtypes.bfloat16
    return (eye, strict_l, u_incl, rep.astype(dt), red.astype(dt),
            red_t.astype(dt))


def _kernel(
    # inputs (all constant index maps -> VMEM-resident across steps)
    window0_ref, valid_ref, sentinel_ref, emb_aa_ref,
    lstm_wih_ref, lstm_whh_ref, lstm_b_ref, lfc_w_ref, lfc_b_ref,
    fc1a_ref, fc1b_ref, fc1_b_ref,
    w1a_ref, w1b_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    root1_ref, bias1_ref, root2_ref, bias2_ref,
    fc2_w_ref, fc2_b_ref,
    eye_ref, strictl_ref, u_ref, rep_ref, red_ref, slots_ref, ones_r_ref,
    ones_e_ref, pair_valid_ref, charges_ref, fc1c_ref, phi_pair_ref,
    # outputs
    coords_ref, overflow_ref,
    # scratch
    window_ref, k_ref,
    *,
    t_len: int,
    r_pad: int,
    e_cap: int,
    width: int,
    depth: int,
    thr2: float,
    clip: float,
    predict_delta: bool,
    extrapolate_prior: bool,
    prior_gamma: float,
    compute_dtype: str,
    use_repeat: bool = False,
    use_dh: bool = False,
    dh_kappa: float = 0.0,
    dh_lb: float = 0.0,
    dh_min_dist: float = 1.0,
    streams: int = 1,
):
    step = pl.program_id(0)
    f32 = jnp.float32
    cd = f32 if compute_dtype == "float32" else jnp.bfloat16

    @pl.when(step == 0)
    def _init():
        window_ref[:] = window0_ref[:]
        overflow_ref[:, :] = jnp.zeros((1, 1), f32)

    eye = eye_ref[:]                                         # (R, R) f32
    slots = slots_ref[:]                                     # (E, 1) 1..E
    valid = valid_ref[:]                                     # (R, 1)

    def stream_step(s, carry):
        """One rollout step for stream ``s`` (python int 0 when streams==1,
        traced loop index otherwise — refs index dynamically either way)."""
        pos = window_ref[s, t_len - 1]  # (R_pad, 3); pads at far sentinels

        # ---- 1+2. contact test + edge extraction, in native (R, R)
        # matrix layout (rows = source i, cols = target j; row-major edge
        # order — identical to padded_edges_device,
        # geometry/contact.py:124-160).
        # NATIVE transpose, not a dot against identity: Mosaic lowers
        # in-kernel f32 matmuls at bf16-pass precision, so a "selection"
        # transpose-by-matmul ROUNDS the coordinates (measured 3e-2 error
        # on chip) and flips borderline contacts vs the XLA scan.
        # jnp.transpose is exact (verified on chip).
        pos_t = jnp.transpose(pos)                           # (3, R)
        d2 = None
        for axis in range(3):
            dc = pos[:, axis : axis + 1] - pos_t[axis : axis + 1, :]
            d2 = dc * dc if d2 is None else d2 + dc * dc     # (R, R)
        # pair_valid zeroes every pair touching a pad residue — without it
        # the pad SELF-pairs (distance 0) would become real unmasked edges
        # whose kernel values blow up over the conv layers.
        cmat = jnp.where(d2 < thr2, 1.0, 0.0) * pair_valid_ref[:]  # (R, R)
        hi = jax.lax.Precision.HIGHEST
        rowcount = jnp.dot(cmat, ones_r_ref[:],
                           preferred_element_type=f32)       # (R, 1)
        # HIGHEST on the count-CARRYING operands: rowcount/intra hold
        # integers up to R, which exceed Mosaic's default bf16-operand
        # exact range (256) for large systems. 0/1-operand matmuls
        # (rowcount, c_row, deg, laundering) are exact at any precision.
        row_off = jnp.dot(strictl_ref[:], rowcount,
                          preferred_element_type=f32,
                          precision=hi)                      # (R, 1) excl.
        intra = jnp.dot(cmat, u_ref[:],
                        preferred_element_type=f32)          # (R, R)
        count = jnp.sum(rowcount)
        # native transposes: row_off holds integers up to count (> 256 at
        # larger capacities), beyond bf16's exact-integer range — a
        # transpose-by-matmul would round them (see pos_t note).
        ro_t = jnp.transpose(row_off)                        # (1, R)
        rc_t = jnp.transpose(rowcount)                       # (1, R)
        # Source incidence: row-major rank order means slot e's source is
        # the unique i with row_off[i] < e <= row_off[i] + rowcount[i]
        # (row counts partition 1..count into consecutive intervals);
        # slots past the real count match no interval -> all-zero row.
        g = jnp.where(
            (slots > ro_t) & (slots <= ro_t + rc_t), 1.0, 0.0
        )                                                    # (E, R) f32
        # Target incidence: gather slot e's source row of C / intra with G
        # and match its intra-row rank l = e - row_off[src]. HIGHEST
        # precision: row_off's integers exceed 256 at larger capacities
        # and intra's exceed it for R > 256; Mosaic's default bf16-pass
        # matmul would round those operands.
        l_intra = slots - jnp.dot(g, row_off,
                                  preferred_element_type=f32,
                                  precision=hi)
        c_row = jnp.dot(g, cmat, preferred_element_type=f32)  # (E, R)
        intra_row = jnp.dot(g, intra, preferred_element_type=f32,
                            precision=hi)                    # (E, R)
        d = c_row * jnp.where(intra_row == l_intra, 1.0, 0.0)  # (E, R)
        # Layout laundering: G came off the VPU (broadcast compares) and D
        # off an elementwise multiply; both feed 2*depth+2 matmuls below.
        # One identity matmul each re-materializes them in MXU-native
        # layout — measured +1k steps/s (31.4k vs 30.5k) on the chip,
        # exact (0/1 times identity in f32).
        g = jnp.dot(g, eye, preferred_element_type=f32)
        d = jnp.dot(d, eye, preferred_element_type=f32)
        mask = jnp.where(slots <= count, 1.0, 0.0)           # (E, 1)
        deg_col = jax.lax.dot_general(                       # (R, 1)
            d, ones_e_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        inv_deg = 1.0 / jnp.maximum(deg_col, 1.0)            # (R, 1)

        # ---- 3. LSTM window encoder + embedding + fc1
        h = jnp.zeros((r_pad, 3), f32)
        c = jnp.zeros((r_pad, 3), f32)
        for t in range(t_len):
            x_t = window_ref[s, t]
            gates = (
                jnp.dot(x_t, lstm_wih_ref[:], preferred_element_type=f32)
                + jnp.dot(h, lstm_whh_ref[:], preferred_element_type=f32)
                + lstm_b_ref[:]
            )
            i_g = jax.nn.sigmoid(gates[:, 0:3])
            f_g = jax.nn.sigmoid(gates[:, 3:6])
            g_g = jnp.tanh(gates[:, 6:9])
            o_g = jax.nn.sigmoid(gates[:, 9:12])
            c = f_g * c + i_g * g_g
            h = o_g * jnp.tanh(c)
        h = (jnp.dot(h, lfc_w_ref[:], preferred_element_type=f32)
             + lfc_b_ref[:])
        x = (
            jnp.dot(emb_aa_ref[:], fc1a_ref[:], preferred_element_type=f32)
            + jnp.dot(h, fc1b_ref[:], preferred_element_type=f32)
            + fc1_b_ref[:]
        )
        if use_dh:
            # Debye-Hueckel node potential from the SAME (R, R) pair
            # distances the contact test used: per-pair screened-Coulomb
            # contribution (self/pad pairs masked by phi_pair), summed
            # over targets with a ones matvec — no gathers, no extra
            # distance pass.
            dist = jnp.sqrt(jnp.maximum(d2, dh_min_dist * dh_min_dist))
            q_t = jnp.transpose(charges_ref[:])              # (1, R) exact
            contrib = (
                dh_lb * q_t * jnp.exp(-dh_kappa * dist) / dist
            ) * phi_pair_ref[:]                              # (R, R)
            phi = jnp.dot(contrib, ones_r_ref[:],
                          preferred_element_type=f32)        # (R, 1)
            x = x + phi * fc1c_ref[:]                        # (R,1)x(1,w)
        x = jnp.maximum(x, 0.0)                              # (R, w)

        # ---- 4. edge-kernel MLP (weights resident); split first layer so
        # the [pos_src ; pos_dst] concat never materializes
        gp = jnp.dot(g.astype(cd), pos.astype(cd),
                     preferred_element_type=f32)
        dp = jnp.dot(d.astype(cd), pos.astype(cd),
                     preferred_element_type=f32)
        h1 = (
            jnp.dot(gp.astype(cd), w1a_ref[:], preferred_element_type=f32)
            + jnp.dot(dp.astype(cd), w1b_ref[:],
                      preferred_element_type=f32)
            + b1_ref[:]
        )
        h1 = jnp.maximum(h1, 0.0).astype(cd)
        h2 = jnp.dot(h1, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
        h2 = jnp.maximum(h2, 0.0).astype(cd)
        kt = jnp.dot(h2, w3_ref[:], preferred_element_type=f32) + b3_ref[:]
        k_ref[:] = (kt * mask).astype(cd)                    # (E, w^2)

        # ---- 5. 2*depth weight-tied conv layers.
        # Per-edge matvec in REP/RED form with the reduction REORDERED:
        #   agg = D^T @ ((xs @ REP) * K) @ RED  ==  (D^T @ prod) @ RED
        # so the big contractions run at R rows (32) instead of E rows
        # (256), and the (E, w) message tensor never materializes. REP is
        # a selection matmul (one nonzero per output) so bf16 accumulation
        # is exact — no f32 round-trip cast passes over the (E, w^2)
        # tensors.
        g_cd = g.astype(cd)
        d_cd = d.astype(cd)
        kt_res = k_ref[:]
        for layer in range(2 * depth):
            root = root1_ref[:] if layer < depth else root2_ref[:]
            bias = bias1_ref[:] if layer < depth else bias2_ref[:]
            # (Mosaic requires 32-bit matmul accumulators; selection
            # matmuls are exact regardless, the casts back to cd are
            # cheap VPU passes.)
            xs = jnp.dot(
                g_cd, x.astype(cd), preferred_element_type=f32
            ).astype(cd)                                     # (E, w)
            if use_repeat:
                rep = pltpu.repeat(xs, width, axis=1)        # (E, w^2)
            else:
                rep = jnp.dot(
                    xs, rep_ref[:], preferred_element_type=f32
                ).astype(cd)
            prod = rep * kt_res                              # (E, w^2) cd
            node_prod = jax.lax.dot_general(                 # (R, w^2)
                d_cd, prod,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            agg = jnp.dot(
                node_prod.astype(cd), red_ref[:],
                preferred_element_type=f32,
            )                                                # (R, w)
            agg = agg * inv_deg
            rootx = jnp.dot(x.astype(cd), root,
                            preferred_element_type=f32)
            x = jnp.maximum(agg + rootx + bias, 0.0)

        # ---- 6. head, safety rail, window slide
        out = jnp.dot(x.astype(cd), fc2_w_ref[:],
                      preferred_element_type=f32)
        out = out + fc2_b_ref[:]
        if predict_delta:
            out = out + pos
            if extrapolate_prior:
                # (damped) constant-velocity prior (residual_prior,
                # models/gkn.py): read the previous frame BEFORE the
                # slide below.
                out = out + prior_gamma * (pos - window_ref[s, t_len - 2])
        if clip > 0:
            out = jnp.clip(out, -clip, clip)
        # where, not arithmetic mixing: 0 * inf from a saturated pad row
        # would inject NaN into the window.
        out = jnp.where(valid > 0.0, out, sentinel_ref[:])

        for t in range(t_len - 1):
            window_ref[s, t] = window_ref[s, t + 1]
        window_ref[s, t_len - 1] = out
        coords_ref[0, s] = out
        overflow_ref[:, :] = jnp.maximum(
            overflow_ref[:, :],
            jnp.where(count > e_cap, 1.0, 0.0).reshape(1, 1),
        )
        return carry

    if streams == 1:
        stream_step(0, 0)
    else:
        # Sequential streams per grid step: weights and constants stay
        # resident across BOTH loops; live intermediates are one stream's.
        jax.lax.fori_loop(0, streams, stream_step, 0)


def persistent_rollout(
    params,
    cfg,
    aa,
    window0,
    num_steps: int,
    threshold: float = 8.0,
    clip: float | None = None,
    interpret: bool = False,
    use_repeat: bool = False,
):
    """Roll the GKN forward ``num_steps`` steps in one kernel launch.

    Matches ``rollout_scan(..., graph_frame="last", collect="coords")``
    semantics on the sparse path with ``max_edges=cfg.max_edges``,
    including ``electrostatics="dh"`` (the screened-Coulomb node feature
    recomputes in-kernel from the (R, R) pair distances each step).
    Requires ``tie_edge_kernel``.

    ``window0``: (T, R, 3) for one stream -> (coords (num_steps, R, 3),
    diags), or (S, T, R, 3) for S streams of the same protein -> (coords
    (S, num_steps, R, 3), diags) — the multi-stream serving form: the
    grid still walks steps, and a sequential in-kernel loop walks streams
    with ALL weights resident across both loops, so per-chip throughput
    stays near the single-stream rate times S without the (S, E, w, w)
    HBM spill the batched XLA scan hits past ~32 streams.
    """
    if not cfg.tie_edge_kernel:
        raise ValueError("persistent rollout requires tie_edge_kernel=True")
    if getattr(cfg, "legacy_no_lstm", False):
        raise ValueError("persistent rollout does not implement the "
                         "legacy no-LSTM variant — use impl='scan'")
    if getattr(cfg, "window_diff", False):
        # The in-kernel LSTM consumes raw window frames; silently ignoring
        # the velocity-form encoding would break parity with rollout_scan.
        raise ValueError("persistent rollout does not implement "
                         "window_diff=True — use impl='scan'")
    r = int(aa.shape[0])
    t_len, width, kw = cfg.window_size, cfg.width, cfg.ker_width
    e_cap = cfg.max_edges
    if (cfg.predict_delta and t_len < 2
            and getattr(cfg, "predict_prior", "last") == "extrapolate"):
        raise ValueError(
            "predict_prior='extrapolate' needs window_size >= 2, got "
            f"{t_len}")
    window0 = jnp.asarray(window0, jnp.float32)
    batched = window0.ndim == 4
    streams = int(window0.shape[0]) if batched else 1
    # VMEM budget guard: the kernel-tensor scratch plus the two (E, w^2)
    # conv-loop intermediates plus the resident MLP weights must fit the
    # ~100 MB VMEM window. (The (R, R)-layout extraction itself is O(R^2)
    # and never binds first — the old flat formulation's (R^2, R^2)
    # ranking constant capped the kernel at 48 residues.)
    cd_bytes = 4 if cfg.compute_dtype == "float32" else 2
    vmem_est = (
        3 * e_cap * width * width * cd_bytes
        + (kw * width * width + kw * kw) * cd_bytes
        + 4 * _round_up(r, 8) ** 2 * 4
        + 2 * streams * (t_len + 1) * _round_up(r, 8) * 3 * 4
    )
    if vmem_est > 90 * 1024 * 1024:
        raise ValueError(
            f"persistent rollout working set ~{vmem_est / 2**20:.0f} MB "
            f"exceeds the VMEM budget (max_edges={e_cap}, width={width}, "
            f"ker_width={kw}); use rollout/scan.py for larger systems"
        )
    r_pad = _round_up(r, 8)
    cd_str = cfg.compute_dtype
    cd = jnp.float32 if cd_str == "float32" else jnp.bfloat16

    # pad residues parked far apart: pad row k at (BIG * (k + 1), 0, 0)
    sentinel = np.zeros((r_pad, 3), np.float32)
    for k in range(r, r_pad):
        sentinel[k, 0] = 1e7 * (k - r + 1)
    valid = np.zeros((r_pad, 1), np.float32)
    valid[:r] = 1.0

    w0 = window0 if batched else window0[None]  # (S, T, R, 3)
    if r_pad > r:
        w0 = jnp.concatenate(
            [w0, jnp.broadcast_to(jnp.asarray(sentinel[r:]),
                                  (streams, t_len, r_pad - r, 3))], axis=2
        )

    emb_aa = jnp.zeros((r_pad, cfg.embedding_dim), jnp.float32)
    emb_aa = emb_aa.at[:r].set(params["emb"][aa])

    mlp = params["edge_kernel"]
    w1 = mlp["layer_0"]["w"]  # (6, kw)
    w3 = mlp["layer_2"]["w"]  # (kw, w^2)
    b3 = mlp["layer_2"]["b"]
    lstm = params["lstm"]

    use_rep_eff = use_repeat and not interpret
    eye, strict_l, u_incl, rep, red, red_t = _static_mats(
        r_pad, width, cd_str
    )
    if use_rep_eff:
        # tile-layout kernel tensor: permute W3's columns so K' holds each
        # edge's matrix transposed (index v*w + wi), matching pltpu.repeat.
        # ONE definition of this layout-critical permutation lives in
        # train_conv.kernel_permutation — shared with the training kernel.
        from molecular_dynamics_neural_operator_tpu.ops.pallas.train_conv import (  # noqa: E501
            kernel_permutation,
        )

        perm = kernel_permutation(width)
        w3 = w3[:, perm]
        b3 = b3[perm]
        red = red_t
    slots = np.arange(1, e_cap + 1, dtype=np.float32)[:, None]  # (E, 1)
    ones_r = np.ones((r_pad, 1), np.float32)
    ones_e = np.ones((e_cap, 1), np.float32)
    pair_valid = (valid.reshape(-1, 1) * valid.reshape(1, -1)).astype(
        np.float32
    )  # (R_pad, R_pad)

    # Debye-Hueckel node feature (cfg.electrostatics == "dh"): per-residue
    # charges, the extra fc1 row, and the pair mask excluding self pairs.
    use_dh = cfg.electrostatics == "dh"
    fc1_w = params["fc1"]["w"]
    dh_kappa = dh_lb = dh_min = 0.0
    if use_dh:
        from molecular_dynamics_neural_operator_tpu.preprocess.grid_jax import (  # noqa: E501
            _BJERRUM_A_K,
            AMINO_ACID_CHARGES,
            DH_MIN_DIST,
            debye_kappa,
        )

        # jnp ops only: aa may be a tracer when the wrapper is jitted
        charges = jnp.zeros((r_pad, 1), jnp.float32).at[:r, 0].set(
            jnp.asarray(AMINO_ACID_CHARGES)[aa % 20]
        )
        dh_kappa = debye_kappa(cfg.ionic_strength, cfg.eps_solvent,
                               cfg.temperature)
        dh_lb = _BJERRUM_A_K / (cfg.eps_solvent * cfg.temperature)
        dh_min = DH_MIN_DIST
        # the phi row (fc1 input layout: [emb ; lstm ; phi])
        fc1c = fc1_w[cfg.node_features : cfg.node_features + 1]
        phi_pair = pair_valid * (
            1.0 - np.eye(r_pad, dtype=np.float32)
        )  # (R_pad, R_pad): self pairs excluded
    else:
        # (1, 1) placeholders: no dead VMEM residency on the default path
        charges = jnp.zeros((1, 1), jnp.float32)
        fc1c = jnp.zeros((1, 1), jnp.float32)
        phi_pair = np.zeros((1, 1), np.float32)

    kernel = functools.partial(
        _kernel, t_len=t_len, r_pad=r_pad, e_cap=e_cap, width=width,
        depth=cfg.depth, thr2=float(threshold) ** 2,
        clip=float(clip) if clip is not None else 0.0,
        predict_delta=cfg.predict_delta,
        extrapolate_prior=(
            getattr(cfg, "predict_prior", "last") == "extrapolate"),
        prior_gamma=float(getattr(cfg, "prior_damping", 1.0)),
        compute_dtype=cd_str,
        use_repeat=use_rep_eff, use_dh=use_dh,
        dh_kappa=float(dh_kappa), dh_lb=float(dh_lb),
        dh_min_dist=float(dh_min), streams=streams,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    inputs = [
        w0, jnp.asarray(valid), jnp.asarray(sentinel), emb_aa,
        lstm["w_ih"], lstm["w_hh"],
        (lstm["b_ih"] + lstm["b_hh"])[None, :],
        params["lstm_fc"]["w"], params["lstm_fc"]["b"][None, :],
        fc1_w[: cfg.embedding_dim],
        fc1_w[cfg.embedding_dim : cfg.embedding_dim + cfg.x_position_dim],
        params["fc1"]["b"][None, :],
        w1[:3].astype(cd), w1[3:6].astype(cd),
        mlp["layer_0"]["b"][None, :],
        mlp["layer_1"]["w"].astype(cd), mlp["layer_1"]["b"][None, :],
        w3.astype(cd), b3[None, :],
        params["conv1"]["root"].astype(cd),
        params["conv1"]["bias"][None, :],
        params["conv2"]["root"].astype(cd),
        params["conv2"]["bias"][None, :],
        # head_scale folds into fc2 exactly (linear head, inference-only
        # kernel): scale*(Wx+b) == (sW)x + (sb). Only read under
        # predict_delta, matching models/gkn.py.
        (params["fc2"]["w"] * _hs(cfg)).astype(cd),
        (params["fc2"]["b"] * _hs(cfg))[None, :],
        jnp.asarray(eye), jnp.asarray(strict_l), jnp.asarray(u_incl),
        jnp.asarray(rep), jnp.asarray(red), jnp.asarray(slots),
        jnp.asarray(ones_r), jnp.asarray(ones_e), jnp.asarray(pair_valid),
        jnp.asarray(charges), fc1c, jnp.asarray(phi_pair),
    ]
    in_specs = [const_spec(jnp.shape(x)) for x in inputs]

    coords, overflow = pl.pallas_call(
        kernel,
        grid=(num_steps,),
        out_shape=(
            jax.ShapeDtypeStruct((num_steps, streams, r_pad, 3),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, streams, r_pad, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((streams, t_len, r_pad, 3), jnp.float32),
            pltpu.VMEM((e_cap, width * width), cd),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*inputs)
    diags = {"edge_overflow": overflow[0, 0] > 0}
    if batched:
        # (num_steps, S, R, 3) -> (S, num_steps, R, 3): the batched XLA
        # rollout's stream-major convention (rollout/scan.py, vmap axis 0)
        return jnp.swapaxes(coords[:, :, :r], 0, 1), diags
    return coords[:, 0, :r], diags


def make_persistent_rollout_fn(cfg, num_steps: int, threshold: float = 8.0,
                               clip: float | None = None,
                               interpret: bool | None = None,
                               use_repeat: bool | None = None):
    """Jitted wrapper mirroring ``make_rollout_fn``'s call shape
    (params, aa, window0) -> (coords, final_window, diags).

    ``use_repeat`` defaults to True on real TPUs (the tile-layout kernel
    tensor + ``pltpu.repeat`` lane expansion: measured 28.0k steps/s vs
    21.8k for the REP-matmul form and 20.0k for the XLA scan on one v5e,
    bitwise-equal outputs) and False under interpret mode, whose repeat
    semantics are unverified."""
    if getattr(cfg, "kernel_quant", "none") != "none":
        # Silently running the bf16 kernel under a quantized config would
        # misreport what was measured (same guard class as window_diff).
        raise ValueError(
            "kernel_quant is not supported by the persistent rollout "
            "kernel (its kernel tensor is VMEM-resident, so int8 buys "
            "nothing there) — use impl='scan'"
        )
    if interpret is None:
        interpret = not pallas_available()
    if use_repeat is None:
        use_repeat = not interpret

    def fn(params, aa, window0):
        coords, diags = persistent_rollout(
            params, cfg, aa, window0, num_steps, threshold, clip,
            interpret=interpret, use_repeat=use_repeat,
        )
        t = cfg.window_size
        w0 = jnp.asarray(window0, jnp.float32)
        batched = w0.ndim == 4
        step_axis = 1 if batched else 0

        def last_t(x):
            return x[:, -t:] if batched else x[-t:]

        if num_steps >= t:
            final_window = last_t(coords)
        else:
            final_window = jnp.concatenate(
                [w0[:, num_steps:] if batched else w0[num_steps:], coords],
                axis=step_axis,
            )
        return coords, final_window, diags

    return jax.jit(fn)
