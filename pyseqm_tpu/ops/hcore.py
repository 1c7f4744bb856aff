"""Core Hamiltonian assembly.

Rebuild of the reference hcore (seqm/seqm_functions/hcore.py:6-167) on the
static (nmol, A, A) block grid: the reference's flat index_add_ scatters
become per-molecule scatter-adds with *static* pair indices, and the result
is a fully-symmetric block grid (no deferred triangle symmetrization).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..constants import Constants, OVERLAP_CUTOFF
from ..system import System
from .multipole import dd_qq, rho1_additive, rho2_additive
from .overlap import diatom_overlap
from .tetci import WPack, pair_w_pack


def atom_multipoles(const: Constants, species, p: Dict[str, jnp.ndarray]):
    """Per-atom multipole separations & Klopman additive terms.

    cf. two_elec_two_center_int.py:22-43.  Returns dict with dd, qq,
    rho0, rho1, rho2 arrays shaped like ``species``.
    """
    Z = species
    is_h = Z == 1
    is_x = Z > 2
    has_core = is_h | is_x

    qn0 = const.qn[Z]
    gss = p["g_ss"]
    hsp = p["h_sp"]
    hpp = 0.5 * (p["g_pp"] - p["g_p2"])

    zs = jnp.where(is_x, p["zeta_s"], 1.0)
    zp = jnp.where(is_x, p["zeta_p"], 1.0)
    dd, qq = dd_qq(jnp.where(is_x, qn0, 1.0), zs, zp)
    dd = jnp.where(is_x, dd, 0.0)
    qq = jnp.where(is_x, qq, 0.0)

    rho0 = jnp.where(has_core, 0.5 * jnp.asarray(27.21, gss.dtype)
                     / jnp.where(has_core, gss, 1.0), 0.0)
    rho1 = rho1_additive(hsp, dd, is_x)
    rho2 = rho2_additive(hpp, qq, is_x)
    return {"dd": dd, "qq": qq, "rho0": rho0, "rho1": rho1, "rho2": rho2}


def hcore(
    const: Constants,
    sys: System,
    p: Dict[str, jnp.ndarray],
    Kbeta: Optional[jnp.ndarray] = None,
    dense_grid: bool = False,
    precise_overlap: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assemble the core Hamiltonian block grid and two-electron integrals.

    Args:
      p: per-atom parameter dict, each entry (nmol, A).
      Kbeta: optional per-pair resonance scaling (nmol, NP, 4) — ML hook,
        cf. hcore.py:138-143.

    Returns:
      M: (nmol, A, A, 4, 4) symmetric core-Hamiltonian block grid (eV)
      w: WPack — compact two-electron integrals (ri (nmol, NP, 22),
         U (nmol, NP, 4, 4)); consumers rotate on the fly (see tetci.py)
    """
    nmol, A = sys.species.shape
    iu, ju = sys.pair_i, sys.pair_j
    dtype = sys.coordinates.dtype

    # ---- overlap x resonance (off-diagonal blocks) ----
    zeta = jnp.stack([p["zeta_s"], p["zeta_p"]], axis=-1)  # (nmol, A, 2)
    qn_i = const.qn_int[sys.zi]
    qn_j = const.qn_int[sys.zj]
    ov_mask = sys.pair_mask & (sys.rij <= OVERLAP_CUTOFF)
    di = diatom_overlap(qn_i, qn_j, sys.xij, sys.rij,
                        zeta[:, iu], zeta[:, ju], precise=precise_overlap)
    di = jnp.where(ov_mask[..., None, None], di, 0.0)

    bs_i, bp_i = p["beta_s"][:, iu], p["beta_p"][:, iu]
    bs_j, bp_j = p["beta_s"][:, ju], p["beta_p"][:, ju]
    # (beta_mu + beta_nu)/2 with s/p resolved per row/column
    bi = jnp.stack([bs_i, bp_i, bp_i, bp_i], axis=-1)  # (nmol, NP, 4)
    bj = jnp.stack([bs_j, bp_j, bp_j, bp_j], axis=-1)
    beta_pair = 0.5 * (bi[..., :, None] + bj[..., None, :])
    off = di * beta_pair
    if Kbeta is not None:
        scale = jnp.zeros(off.shape, dtype=dtype)
        scale = scale.at[..., 0, 0].set(Kbeta[..., 0])
        scale = scale.at[..., 0, 1:].set(Kbeta[..., 1, None])
        scale = scale.at[..., 1:, 0].set(Kbeta[..., 2, None])
        scale = scale.at[..., 1:, 1:].set(Kbeta[..., 3, None, None])
        off = off * scale

    # ---- two-electron two-center integrals (compact representation) ----
    mp = atom_multipoles(const, sys.species, p)
    w, e1b, e2a = pair_w_pack(
        sys.rij, sys.xij,
        const.tore[sys.zi], const.tore[sys.zj],
        mp["dd"][:, iu], mp["dd"][:, ju],
        mp["qq"][:, iu], mp["qq"][:, ju],
        mp["rho0"][:, iu], mp["rho0"][:, ju],
        mp["rho1"][:, iu], mp["rho1"][:, ju],
        mp["rho2"][:, iu], mp["rho2"][:, ju],
    )
    pm = sys.pair_mask
    w = WPack(ri=jnp.where(pm[..., None], w.ri, 0.0), U=w.U)
    e1b = jnp.where(pm[..., None, None], e1b, 0.0)
    e2a = jnp.where(pm[..., None, None], e2a, 0.0)

    # ---- diagonal blocks: U_ss/U_pp + summed electron-core attraction ----
    dblk = jnp.zeros((nmol, A, 4, 4), dtype=dtype)
    dblk = dblk.at[..., 0, 0].set(jnp.where(sys.atom_mask, p["U_ss"], 0.0))
    upp = jnp.where(sys.atom_mask, p["U_pp"], 0.0)
    for k in (1, 2, 3):
        dblk = dblk.at[..., k, k].set(upp)
    dblk = dblk.at[:, iu].add(e1b)
    dblk = dblk.at[:, ju].add(e2a)

    # ---- assemble the symmetric grid ----
    M = jnp.zeros((nmol, A, A, 4, 4), dtype=dtype)
    idx = jnp.arange(A)
    M = M.at[:, idx, idx].set(dblk)
    M = M.at[:, iu, ju].set(off)
    M = M.at[:, ju, iu].set(jnp.swapaxes(off, -1, -2))
    if dense_grid:
        # grid-resident integrals: pay the placement once here so every
        # Fock build in the SCF loop is scatter/gather-free (tetci.py)
        from .tetci import to_grid
        return M, to_grid(w, A, iu, ju)
    return M, w
