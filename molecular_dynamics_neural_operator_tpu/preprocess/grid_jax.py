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


def batched_debye_huckel_grids(
    trajectory_positions: jax.Array,
    charges: jax.Array,
    grid_points: jax.Array,
    **kwargs,
) -> jax.Array:
    """Grids for every frame of a (T, N, 3) trajectory via lax.map."""
    fn = lambda pos: debye_huckel_grid(pos, charges, grid_points, **kwargs)
    return jax.lax.map(fn, trajectory_positions)
