"""On-device electrostatic potential grids (screened Coulomb / Debye-Hueckel).

TPU-native replacement for the external pdb2pqr/APBS hop when electrostatic
*features* (not publication-grade PB solutions) are needed — BASELINE.json
config 5 ("~10k-atom solvated system with electrostatics features + on-device
neighbor-list rebuild"). The linearized PB equation with the reference's
``bcfl sdh`` boundary condition is exactly the superposition of per-charge
Debye-Hueckel potentials:

    phi(r) = sum_q  q_i * exp(-kappa * |r - r_i|) / (4 pi eps0 eps_s |r - r_i|)

evaluated here on a regular grid as one big (n_grid, n_atoms) distance
matrix -> matmul with the charge vector — embarrassingly MXU-friendly and
jit/vmap/scan-compatible, so grids can be generated inline with training
instead of as an offline preprocessing pass.

Units: coordinates in Angstrom, charges in elementary charge units, output
potential in kT/e at ``temperature`` (the APBS default unit), matching the
reference deck's 310 K / 0.15 M salt / eps_s 78 parameters.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# Bjerrum length prefactor: e^2 / (4 pi eps0 kB) in units of A * K.
_BJERRUM_A_K = 16712.2

# Minimum interaction distance (A) clamping the screened-Coulomb kernel —
# ONE definition shared by the on-device feature paths (this module and
# ops/pallas/persistent_rollout.py must agree or the rollout paths diverge
# for close contacts).
DH_MIN_DIST = 1.0


def debye_kappa(ionic_strength_M: float = 0.15, eps_s: float = 78.0,
                temperature: float = 310.0) -> float:
    """Inverse Debye length (1/A) for a 1:1 salt."""
    lb = _BJERRUM_A_K / (eps_s * temperature)  # Bjerrum length in A
    # kappa^2 = 8 pi lB n, n = ions/A^3 = N_A * I(mol/L) * 1e-27
    n = 6.02214076e23 * ionic_strength_M * 1e-27
    return math.sqrt(8.0 * math.pi * lb * n)


def make_grid(center, lengths, dime: Tuple[int, int, int]):
    """Regular grid points (prod(dime), 3) around ``center`` spanning
    ``lengths`` (the deck's fglen box)."""
    axes = [
        jnp.linspace(center[d] - lengths[d] / 2.0,
                     center[d] + lengths[d] / 2.0, dime[d])
        for d in range(3)
    ]
    gx, gy, gz = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)


def debye_huckel_grid(
    positions: jax.Array,
    charges: jax.Array,
    grid_points: jax.Array,
    eps_s: float = 78.0,
    temperature: float = 310.0,
    ionic_strength_M: float = 0.15,
    min_dist: float = 1.0,
    block: int = 4096,
) -> jax.Array:
    """Potential (kT/e) at each grid point from screened point charges.

    positions: (N, 3) A; charges: (N,); grid_points: (G, 3). The (G, N)
    distance computation is blocked over G via lax.map to bound memory for
    ~10k-atom x 400k-point grids.
    """
    kappa = debye_kappa(ionic_strength_M, eps_s, temperature)
    lb = _BJERRUM_A_K / (eps_s * temperature)  # A * (kT/e per unit charge)

    g = grid_points.shape[0]
    pad = (-g) % block
    gp = jnp.pad(grid_points, ((0, pad), (0, 0)))
    blocks = gp.reshape(-1, block, 3)

    def one_block(pts):
        d2 = jnp.sum(
            (pts[:, None, :] - positions[None, :, :]) ** 2, axis=-1
        )
        d = jnp.sqrt(jnp.maximum(d2, min_dist * min_dist))
        green = jnp.exp(-kappa * d) / d  # (block, N)
        return lb * jnp.dot(
            green, charges, preferred_element_type=jnp.float32
        )

    phi = jax.lax.map(one_block, blocks).reshape(-1)
    return phi[:g]


# Net side-chain charge (elementary units, pH 7) per amino-acid embedding
# index, alphabetical order (ALA ARG ASN ASP CYS GLN GLU GLY HIS ILE LEU
# LYS MET PHE PRO SER THR TRP TYR VAL): ARG/LYS +1, ASP/GLU -1, HIS +0.1.
# Plain numpy on purpose: this module may first be imported INSIDE a jit
# trace (models/gkn.py imports it lazily), and a module-level jnp constant
# created under an active trace leaks a tracer.
import numpy as _np

AMINO_ACID_CHARGES = _np.asarray(
    [0.0, 1.0, 0.0, -1.0, 0.0, 0.0, -1.0, 0.0, 0.1, 0.0,
     0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
    dtype=_np.float32,
)


def debye_huckel_at_atoms(
    positions: jax.Array,
    charges: jax.Array,
    eps_s: float = 78.0,
    temperature: float = 310.0,
    ionic_strength_M: float = 0.15,
    min_dist: float = DH_MIN_DIST,
) -> jax.Array:
    """Screened-Coulomb potential (kT/e) AT each atom site from all OTHER
    atoms (self-interaction excluded).

    The on-device electrostatic node feature for BASELINE config 5: pure
    function of (positions, charges), so it recomputes from *predicted*
    coordinates inside the jitted rollout scan — the feature path the
    reference computes grids for but never wires in
    (``/root/reference/preprocess.py:79-93``). positions (..., N, 3),
    charges (N,) -> (..., N).
    """
    kappa = debye_kappa(ionic_strength_M, eps_s, temperature)
    lb = _BJERRUM_A_K / (eps_s * temperature)
    d2 = jnp.sum(
        (positions[..., :, None, :] - positions[..., None, :, :]) ** 2,
        axis=-1,
    )
    d = jnp.sqrt(jnp.maximum(d2, min_dist * min_dist))
    green = jnp.exp(-kappa * d) / d
    n = positions.shape[-2]
    green = green * (1.0 - jnp.eye(n, dtype=green.dtype))  # no self term
    return lb * jnp.einsum(
        "...ij,j->...i", green, charges,
        preferred_element_type=jnp.float32,
    )


def sample_grid_trilinear(
    grid: jax.Array,
    origin: jax.Array,
    spacing: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Trilinear interpolation of a (gx, gy, gz) potential grid at atom
    positions (N, 3) — the on-device consumer for APBS ``.dx`` grids
    (``preprocess/electrostatics.py``'s parser emits grid+origin+delta).
    Positions outside the box clamp to the boundary."""
    shape = jnp.asarray(grid.shape, jnp.float32)
    f = (positions - origin) / spacing  # fractional grid coords (N, 3)
    f = jnp.clip(f, 0.0, shape - 1.0)
    f0 = jnp.floor(jnp.minimum(f, shape - 2.0))
    t = f - f0  # (N, 3) in [0, 1]
    i0 = f0.astype(jnp.int32)

    def corner(dx, dy, dz):
        idx = i0 + jnp.asarray([dx, dy, dz], jnp.int32)
        w = jnp.prod(
            jnp.where(jnp.asarray([dx, dy, dz]) == 1, t, 1.0 - t), axis=-1
        )
        return w * grid[idx[:, 0], idx[:, 1], idx[:, 2]]

    out = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                out = out + corner(dx, dy, dz)
    return out


def batched_debye_huckel_grids(
    trajectory_positions: jax.Array,
    charges: jax.Array,
    grid_points: jax.Array,
    **kwargs,
) -> jax.Array:
    """Grids for every frame of a (T, N, 3) trajectory via lax.map."""
    fn = lambda pos: debye_huckel_grid(pos, charges, grid_points, **kwargs)
    return jax.lax.map(fn, trajectory_positions)
