"""Core Hamiltonian assembly.

Rebuild of the reference hcore (seqm/seqm_functions/hcore.py:6-167) on the
static (nmol, A, A) block grid: the reference's flat index_add_ scatters
become per-molecule scatter-adds with *static* pair indices, and the result
is a fully-symmetric block grid (no deferred triangle symmetrization).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from ..constants import Constants, LENGTH_CONVERSION_FACTOR, OVERLAP_CUTOFF
from ..system import System, pair_segment_sizes
from .matrix import assemble_packed_mat
from .multipole import dd_qq, rho1_additive, rho2_additive
from .overlap import diatom_overlap, diatom_overlap_hh, diatom_overlap_xh
from .tetci import (WPack, WPackGrid, WPackGridSplit, WPackSplit,
                    _core_block_unrolled, _u_rows, frame_matrix,
                    local_frame_integrals, local_frame_integrals_hh,
                    pair_w_pack, pair_w_xh)


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
    row3: bool = False,
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
    # evaluate masked-out pairs at a harmless rij: beyond the cutoff the
    # S-combination prefactors (~r^5) times the clamped B integrals
    # (~e^85) overflow f32 in the *backward* (the A-integral cotangent is
    # B * r^5-prefactor > 3.4e38 once rij > ~215 Bohr), and inf * dA(=0)
    # turns the zero cotangent the where() sends here into NaN forces
    rij_ov = jnp.where(ov_mask, sys.rij, jnp.asarray(1.0, dtype))
    di = diatom_overlap(qn_i, qn_j, sys.xij, rij_ov,
                        zeta[:, iu], zeta[:, ju], precise=precise_overlap,
                        row3=row3)
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


def hcore_split(
    const: Constants,
    sys: System,
    p: Dict[str, jnp.ndarray],
    K: int,
    Kbeta: Optional[jnp.ndarray] = None,
    precise_overlap: bool = True,
    row3: bool = False,
) -> Tuple[jnp.ndarray, WPackSplit]:
    """Class-segmented hcore: per-pair-class integral formulas on static
    slices.

    Requires the System built with make_system(heavy_count=K) so the pair
    list follows pair_index_packed(A, K): segment XX (i<j<K) runs the full
    22-integral pipeline, XH (i<K<=j: j guaranteed s-only by the
    descending-Z sort) the 4-integral one, HH (K<=i) the single-integral
    one — cutting the per-pair transcendental work ~7x on hydrogen-rich
    batches.  Matches hcore() exactly on every physical matrix element
    (fake hydrogen p-orbital positions, which the density masks out,
    hold zeros here instead of the unified formula's s-like values —
    the same layout the reference's X-H/H-H classes produce).
    """
    nmol, A = sys.species.shape
    dtype = sys.coordinates.dtype
    n_xx, n_xh, n_hh = pair_segment_sizes(A, K)
    if sys.npairs != n_xx + n_xh + n_hh:
        raise ValueError("System pair list does not match heavy_count "
                         f"{K} (build with make_system(heavy_count={K}))")
    s_xx = slice(0, n_xx)
    s_xh = slice(n_xx, n_xx + n_xh)
    s_hh = slice(n_xx + n_xh, None)
    iu, ju = sys.pair_i, sys.pair_j

    mp = atom_multipoles(const, sys.species, p)
    tore = const.tore[sys.species].astype(dtype)
    zeta = jnp.stack([p["zeta_s"], p["zeta_p"]], axis=-1)   # (nmol, A, 2)
    qn = const.qn_int[sys.species]
    bi_full = jnp.stack([p["beta_s"], p["beta_p"], p["beta_p"],
                         p["beta_p"]], axis=-1)             # (nmol, A, 4)

    ai = lambda v, s: v[:, iu[s]]                           # noqa: E731
    aj = lambda v, s: v[:, ju[s]]                           # noqa: E731

    dblk = jnp.zeros((nmol, A, 4, 4), dtype=dtype)
    dblk = dblk.at[..., 0, 0].set(jnp.where(sys.atom_mask, p["U_ss"], 0.0))
    upp = jnp.where(sys.atom_mask, p["U_pp"], 0.0)
    for k in (1, 2, 3):
        dblk = dblk.at[..., k, k].set(upp)

    M = jnp.zeros((nmol, A, A, 4, 4), dtype=dtype)
    ov_mask = sys.pair_mask & (sys.rij <= OVERLAP_CUTOFF)
    rij_ov = jnp.where(ov_mask, sys.rij, jnp.asarray(1.0, dtype))

    # ---- XX segment: full 22-integral pipeline ----
    pm = sys.pair_mask[:, s_xx]
    di = diatom_overlap(qn[:, iu[s_xx]], qn[:, ju[s_xx]],
                        sys.xij[:, s_xx], rij_ov[:, s_xx],
                        ai(zeta, s_xx), aj(zeta, s_xx),
                        precise=precise_overlap,
                        row3=row3)
    di = jnp.where(ov_mask[:, s_xx][..., None, None], di, 0.0)
    beta_pair = 0.5 * (ai(bi_full, s_xx)[..., :, None]
                       + aj(bi_full, s_xx)[..., None, :])
    off = di * beta_pair
    if Kbeta is not None:
        kb = Kbeta[:, s_xx]
        scale = jnp.zeros(off.shape, dtype=dtype)
        scale = scale.at[..., 0, 0].set(kb[..., 0])
        scale = scale.at[..., 0, 1:].set(kb[..., 1, None])
        scale = scale.at[..., 1:, 0].set(kb[..., 2, None])
        scale = scale.at[..., 1:, 1:].set(kb[..., 3, None, None])
        off = off * scale
    wxx, e1b, e2a = pair_w_pack(
        sys.rij[:, s_xx], sys.xij[:, s_xx],
        ai(tore, s_xx), aj(tore, s_xx),
        ai(mp["dd"], s_xx), aj(mp["dd"], s_xx),
        ai(mp["qq"], s_xx), aj(mp["qq"], s_xx),
        ai(mp["rho0"], s_xx), aj(mp["rho0"], s_xx),
        ai(mp["rho1"], s_xx), aj(mp["rho1"], s_xx),
        ai(mp["rho2"], s_xx), aj(mp["rho2"], s_xx))
    wxx = WPack(ri=jnp.where(pm[..., None], wxx.ri, 0.0), U=wxx.U)
    dblk = dblk.at[:, iu[s_xx]].add(jnp.where(pm[..., None, None], e1b, 0.0))
    dblk = dblk.at[:, ju[s_xx]].add(jnp.where(pm[..., None, None], e2a, 0.0))
    M = M.at[:, iu[s_xx], ju[s_xx]].set(off)
    M = M.at[:, ju[s_xx], iu[s_xx]].set(jnp.swapaxes(off, -1, -2))

    # ---- XH segment: 4-integral pipeline, s-only ket ----
    pm = sys.pair_mask[:, s_xh]
    col = diatom_overlap_xh(qn[:, iu[s_xh]], qn[:, ju[s_xh]],
                            sys.xij[:, s_xh], rij_ov[:, s_xh],
                            ai(zeta, s_xh), p["zeta_s"][:, ju[s_xh]],
                            precise=precise_overlap,
                        row3=row3)
    col = jnp.where(ov_mask[:, s_xh][..., None], col, 0.0)
    beta_col = 0.5 * (ai(bi_full, s_xh)
                      + p["beta_s"][:, ju[s_xh]][..., None])
    off_col = col * beta_col
    if Kbeta is not None:
        kb = Kbeta[:, s_xh]
        scale = jnp.concatenate(
            [kb[..., 0:1], jnp.repeat(kb[..., 2:3], 3, axis=-1)], axis=-1)
        off_col = off_col * scale
    wxh, e1b, e2a_ss = pair_w_xh(
        sys.rij[:, s_xh], sys.xij[:, s_xh],
        ai(tore, s_xh), aj(tore, s_xh),
        ai(mp["dd"], s_xh), ai(mp["qq"], s_xh),
        ai(mp["rho0"], s_xh), aj(mp["rho0"], s_xh),
        ai(mp["rho1"], s_xh), ai(mp["rho2"], s_xh))
    wxh = jnp.where(pm[..., None, None], wxh, 0.0)
    dblk = dblk.at[:, iu[s_xh]].add(jnp.where(pm[..., None, None], e1b, 0.0))
    dblk = dblk.at[:, ju[s_xh], 0, 0].add(jnp.where(pm, e2a_ss, 0.0))
    # (0:1 slices keep the advanced indices adjacent — a bare integer
    # would trigger front-placement of the pair axis)
    M = M.at[:, iu[s_xh], ju[s_xh], :, 0:1].set(off_col[..., None])
    M = M.at[:, ju[s_xh], iu[s_xh], 0:1, :].set(off_col[..., None, :])

    # ---- HH segment: single-integral pipeline ----
    pm = sys.pair_mask[:, s_hh]
    s111 = diatom_overlap_hh(qn[:, iu[s_hh]], qn[:, ju[s_hh]],
                             rij_ov[:, s_hh],
                             p["zeta_s"][:, iu[s_hh]],
                             p["zeta_s"][:, ju[s_hh]],
                             precise=precise_overlap,
                        row3=row3)
    s111 = jnp.where(ov_mask[:, s_hh], s111, 0.0)
    off_ss = s111 * 0.5 * (p["beta_s"][:, iu[s_hh]]
                           + p["beta_s"][:, ju[s_hh]])
    if Kbeta is not None:
        off_ss = off_ss * Kbeta[:, s_hh, 0]
    whh = local_frame_integrals_hh(sys.rij[:, s_hh],
                                   ai(mp["rho0"], s_hh),
                                   aj(mp["rho0"], s_hh))
    whh = jnp.where(pm, whh, 0.0)
    dblk = dblk.at[:, iu[s_hh], 0, 0].add(
        jnp.where(pm, -aj(tore, s_hh) * whh, 0.0))
    dblk = dblk.at[:, ju[s_hh], 0, 0].add(
        jnp.where(pm, -ai(tore, s_hh) * whh, 0.0))
    M = M.at[:, iu[s_hh], ju[s_hh], 0, 0].set(off_ss)
    M = M.at[:, ju[s_hh], iu[s_hh], 0, 0].set(off_ss)

    idx = jnp.arange(A)
    M = M.at[:, idx, idx].set(dblk)
    return M, WPackSplit(xx=wxx, xh=wxh, hh=whh)


def dense_pair_geometry(sys: System, pair_outer_cutoff: float):
    """Shared (nmol, A, A) ordered-pair geometry for the dense pipeline.

    Returns (dvec, dist, pm): dvec[n, i, j] = x_j - x_i, dist in Angstrom,
    pm the off-diagonal valid-pair mask (atom masks, no self-pairs, outer
    cutoff).  Single source of truth for the duplicated-atom / diagonal
    zero-distance guard (cf. reference basics.py:93) used by both
    hcore_dense and the dense nuclear term (ops/energy.py) — their
    distance definitions must never diverge.  Differentiable.
    """
    x = sys.coordinates
    am = sys.atom_mask
    A = x.shape[1]
    dtype = x.dtype
    dvec = x[:, None, :, :] - x[:, :, None, :]          # [n,i,j] = x_j - x_i
    eye = jnp.eye(A, dtype=bool)
    pm = am[:, :, None] & am[:, None, :] & ~eye[None]
    dist2 = jnp.sum(dvec * dvec, axis=-1)
    dist2 = jnp.where(dist2 == 0.0, jnp.asarray(1.0e-4, dtype), dist2)
    dist = jnp.sqrt(dist2)
    pm = pm & (dist < pair_outer_cutoff)
    return dvec, dist, pm


def hcore_dense(
    const: Constants,
    sys: System,
    p: Dict[str, jnp.ndarray],
    pair_outer_cutoff: float = 1.0e10,
    Kbeta: Optional[jnp.ndarray] = None,
    precise_overlap: bool = True,
    row3: bool = False,
) -> Tuple[jnp.ndarray, WPackGrid]:
    """Gather-free ordered-pair (dense-A^2) hcore for large molecules.

    The flat path's cost at large A is per-pair *gathers* (p[:, iu] etc.
    at ~A^2/2 pairs — measured 122 of 640 ms on the 884-atom workload,
    reference scale demo tests/test10).  Here every pairwise quantity is
    built on the full ordered (nmol, A, A) grid by pure row/column
    broadcasting of per-atom arrays: no gathers, no scatters (diagonal
    electron-core sums become axis reductions; off-diagonal placement is
    the computation itself), at 2x the integral FLOPs (both (i, j) and
    (j, i) evaluate — cheap on the VPU).

    Overlap blocks require the heavier atom first (diatom_overlap's jcall
    classes): cells with qn_i < qn_j swap roles via selects and transpose
    the resulting 4x4 block.  The two-electron locals need no swap — each
    ordered cell computes its own (ri, U) with the bra on the row atom,
    which is exactly WPackGrid's contract.

    Returns (M, WPackGrid); M matches hcore()'s grid bit-for-layout.
    """
    nmol, A = sys.species.shape
    dtype = sys.coordinates.dtype
    am = sys.atom_mask

    dvec, dist, pm = dense_pair_geometry(sys, pair_outer_cutoff)
    rij = jnp.where(pm, dist * LENGTH_CONVERSION_FACTOR,
                    jnp.asarray(1.0, dtype))
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    xij = jnp.where(pm[..., None], dvec / dist[..., None], ez)

    # ---- overlap x resonance on every ordered cell ----
    qn = const.qn_int[sys.species]                      # (nmol, A)
    qni = jnp.broadcast_to(qn[:, :, None], (nmol, A, A))
    qnj = jnp.broadcast_to(qn[:, None, :], (nmol, A, A))
    swap = qni < qnj
    zeta = jnp.stack([p["zeta_s"], p["zeta_p"]], axis=-1)   # (nmol, A, 2)
    z_i = jnp.broadcast_to(zeta[:, :, None, :], (nmol, A, A, 2))
    z_j = jnp.broadcast_to(zeta[:, None, :, :], (nmol, A, A, 2))
    za = jnp.where(swap[..., None], z_j, z_i)
    zb = jnp.where(swap[..., None], z_i, z_j)
    xeff = jnp.where(swap[..., None], -xij, xij)
    ov_mask = pm & (rij <= OVERLAP_CUTOFF)
    # sanitize rij beyond the overlap cutoff (same f32 backward-overflow
    # guard as the flat path above: r^5 * e^85 cotangents at ~370 A pairs)
    rij_ov = jnp.where(ov_mask, rij, jnp.asarray(1.0, dtype))
    di = diatom_overlap(jnp.maximum(qni, qnj), jnp.minimum(qni, qnj),
                        xeff, rij_ov, za, zb, precise=precise_overlap,
                        row3=row3)
    di = jnp.where(swap[..., None, None], jnp.swapaxes(di, -1, -2), di)
    di = jnp.where(ov_mask[..., None, None], di, 0.0)

    bi = jnp.stack([p["beta_s"], p["beta_p"], p["beta_p"], p["beta_p"]],
                   axis=-1)                                  # (nmol, A, 4)
    beta_pair = 0.5 * (bi[:, :, None, :, None] + bi[:, None, :, None, :])
    off = di * beta_pair
    if Kbeta is not None:
        # ML hook ships per-(i<j)-pair scalings; mirror them onto the grid
        from ..system import pair_index
        iu, ju = pair_index(A)
        kg = jnp.zeros((nmol, A, A, 4), dtype=dtype)
        kg = kg.at[:, iu, ju].set(Kbeta)
        kb_t = Kbeta[..., jnp.asarray([0, 2, 1, 3])]     # transposed block
        kg = kg.at[:, ju, iu].set(kb_t)
        scale = jnp.zeros(off.shape, dtype=dtype)
        scale = scale.at[..., 0, 0].set(kg[..., 0])
        scale = scale.at[..., 0, 1:].set(kg[..., 1, None])
        scale = scale.at[..., 1:, 0].set(kg[..., 2, None])
        scale = scale.at[..., 1:, 1:].set(kg[..., 3, None, None])
        off = off * scale

    # ---- two-electron two-center integrals per ordered cell ----
    mp = atom_multipoles(const, sys.species, p)
    row = lambda v: v[:, :, None]                        # noqa: E731
    col = lambda v: v[:, None, :]                        # noqa: E731
    tore = const.tore[sys.species].astype(dtype)
    ri, core_a, _ = local_frame_integrals(
        rij, row(tore), col(tore),
        row(mp["dd"]), col(mp["dd"]), row(mp["qq"]), col(mp["qq"]),
        row(mp["rho0"]), col(mp["rho0"]), row(mp["rho1"]), col(mp["rho1"]),
        row(mp["rho2"]), col(mp["rho2"]))
    ri = jnp.where(pm[..., None], ri, 0.0)
    U = frame_matrix(xij)
    e1b = _core_block_unrolled(_u_rows(U), core_a)
    e1b = jnp.where(pm[..., None, None], e1b, 0.0)

    # ---- diagonal blocks: U_ss/U_pp + summed electron-core attraction ----
    # each ordered cell (i, j) is "electron on i, core of j", so the row
    # sum covers both of the flat path's e1b/e2a scatter halves
    dblk = jnp.sum(e1b, axis=2)
    uss = jnp.where(am, p["U_ss"], 0.0)
    upp = jnp.where(am, p["U_pp"], 0.0)
    idx = jnp.arange(A)
    dblk = dblk.at[..., 0, 0].add(uss)
    for k in (1, 2, 3):
        dblk = dblk.at[..., k, k].add(upp)

    M = off
    M = M.at[:, idx, idx].set(dblk)
    return M, WPackGrid(rig=ri, ug=U)


def hcore_dense_split(
    const: Constants,
    sys: System,
    p: Dict[str, jnp.ndarray],
    K: int,
    pair_outer_cutoff: float = 1.0e10,
    Kbeta: Optional[jnp.ndarray] = None,
    precise_overlap: bool = True,
    row3: bool = False,
    packed_m: Optional[int] = None,
) -> Tuple[jnp.ndarray, WPackGridSplit]:
    """Class-segmented gather-free hcore (hcore_dense x hcore_split).

    Block structure keyed on the batch-max heavy count K (see
    tetci.WPackGridSplit): the [0:K, 0:K] ordered sub-grid runs
    hcore_dense's full machinery (incl. the qn-swap overlap cells — a
    molecule with fewer than K heavies has hydrogens inside the block);
    the [0:K, K:A] block needs only the 4-integral X-H class (col atoms
    are s-only in *every* molecule by the descending-Z sort) and ONE
    (mu nu | ss) array serves both orientations; the [K:A, K:A] block is
    scalar (ss|ss).  ~5x fewer integral FLOPs / ~6x less grid memory on
    the 884-atom C294H592 reference scale demo (tests/test10).

    ``packed_m`` (= density.packed_solver_size(K, A)): return M directly
    as the (nmol, packed_m, packed_m) static packed MATRIX instead of the
    block grid — concat-assembled, no strided scatters (see
    matrix.assemble_packed_mat and ops/fock.py fock_packed_split).
    """
    nmol, A = sys.species.shape
    dtype = sys.coordinates.dtype
    AH = A - K

    dvec, dist, pm = dense_pair_geometry(sys, pair_outer_cutoff)
    rij = jnp.where(pm, dist * LENGTH_CONVERSION_FACTOR,
                    jnp.asarray(1.0, dtype))
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    xij = jnp.where(pm[..., None], dvec / dist[..., None], ez)
    ov_mask = pm & (rij <= OVERLAP_CUTOFF)
    rij_ov = jnp.where(ov_mask, rij, jnp.asarray(1.0, dtype))

    qn = const.qn_int[sys.species]
    zeta = jnp.stack([p["zeta_s"], p["zeta_p"]], axis=-1)   # (nmol, A, 2)
    tore = const.tore[sys.species].astype(dtype)
    mp = atom_multipoles(const, sys.species, p)
    bi_full = jnp.stack([p["beta_s"], p["beta_p"], p["beta_p"],
                         p["beta_p"]], axis=-1)             # (nmol, A, 4)

    kg = None
    if Kbeta is not None:
        # mirror the flat per-(i<j)-pair scalings onto the grid once
        iu, ju = (sys.pair_i, sys.pair_j)
        kg = jnp.zeros((nmol, A, A, 4), dtype=dtype)
        kg = kg.at[:, iu, ju].set(Kbeta)
        kb_t = Kbeta[..., jnp.asarray([0, 2, 1, 3])]
        kg = kg.at[:, ju, iu].set(kb_t)

    # ---- XX sub-grid [0:K, 0:K]: hcore_dense's full ordered cells ----
    sH = slice(0, K)
    qni = jnp.broadcast_to(qn[:, sH, None], (nmol, K, K))
    qnj = jnp.broadcast_to(qn[:, None, sH], (nmol, K, K))
    swap = qni < qnj
    z_i = jnp.broadcast_to(zeta[:, sH, None, :], (nmol, K, K, 2))
    z_j = jnp.broadcast_to(zeta[:, None, sH, :], (nmol, K, K, 2))
    za = jnp.where(swap[..., None], z_j, z_i)
    zb = jnp.where(swap[..., None], z_i, z_j)
    xij_xx = xij[:, sH, sH]
    xeff = jnp.where(swap[..., None], -xij_xx, xij_xx)
    ovm = ov_mask[:, sH, sH]
    rov = rij_ov[:, sH, sH]
    di = diatom_overlap(jnp.maximum(qni, qnj), jnp.minimum(qni, qnj),
                        xeff, rov, za, zb, precise=precise_overlap,
                        row3=row3)
    di = jnp.where(swap[..., None, None], jnp.swapaxes(di, -1, -2), di)
    di = jnp.where(ovm[..., None, None], di, 0.0)
    beta_xx = 0.5 * (bi_full[:, sH, None, :, None]
                     + bi_full[:, None, sH, None, :])
    off_xx = di * beta_xx
    if kg is not None:
        kxx = kg[:, sH, sH]
        scale = jnp.zeros(off_xx.shape, dtype=dtype)
        scale = scale.at[..., 0, 0].set(kxx[..., 0])
        scale = scale.at[..., 0, 1:].set(kxx[..., 1, None])
        scale = scale.at[..., 1:, 0].set(kxx[..., 2, None])
        scale = scale.at[..., 1:, 1:].set(kxx[..., 3, None, None])
        off_xx = off_xx * scale

    row = lambda v, s: v[:, s, None]                        # noqa: E731
    col = lambda v, s: v[:, None, s]                        # noqa: E731
    pm_xx = pm[:, sH, sH]
    ri_xx, core_a, _ = local_frame_integrals(
        rij[:, sH, sH], row(tore, sH), col(tore, sH),
        row(mp["dd"], sH), col(mp["dd"], sH),
        row(mp["qq"], sH), col(mp["qq"], sH),
        row(mp["rho0"], sH), col(mp["rho0"], sH),
        row(mp["rho1"], sH), col(mp["rho1"], sH),
        row(mp["rho2"], sH), col(mp["rho2"], sH))
    ri_xx = jnp.where(pm_xx[..., None], ri_xx, 0.0)
    U_xx = frame_matrix(xij_xx)
    e1b = _core_block_unrolled(_u_rows(U_xx), core_a)
    e1b = jnp.where(pm_xx[..., None, None], e1b, 0.0)
    dblk_h = jnp.sum(e1b, axis=2)                  # (nmol, K, 4, 4)

    # ---- XH block [0:K, K:A]: 4-integral class, s-only columns ----
    sL = slice(K, A)
    pm_xh = pm[:, sH, sL]
    ovm = ov_mask[:, sH, sL]
    col_ov = diatom_overlap_xh(
        jnp.broadcast_to(qn[:, sH, None], (nmol, K, AH)),
        jnp.broadcast_to(qn[:, None, sL], (nmol, K, AH)),
        xij[:, sH, sL], rij_ov[:, sH, sL],
        jnp.broadcast_to(zeta[:, sH, None, :], (nmol, K, AH, 2)),
        jnp.broadcast_to(p["zeta_s"][:, None, sL], (nmol, K, AH)),
        precise=precise_overlap,
                        row3=row3)
    col_ov = jnp.where(ovm[..., None], col_ov, 0.0)
    beta_xh = 0.5 * (bi_full[:, sH, None, :]
                     + p["beta_s"][:, None, sL, None])
    off_xh = col_ov * beta_xh                       # (nmol, K, AH, 4)
    if kg is not None:
        kxh = kg[:, sH, sL]
        scale = jnp.concatenate(
            [kxh[..., 0:1], jnp.repeat(kxh[..., 2:3], 3, axis=-1)], axis=-1)
        off_xh = off_xh * scale
    wxh, e1b_xh, e2a_ss = pair_w_xh(
        rij[:, sH, sL], xij[:, sH, sL],
        row(tore, sH), col(tore, sL),
        row(mp["dd"], sH), row(mp["qq"], sH),
        row(mp["rho0"], sH), col(mp["rho0"], sL),
        row(mp["rho1"], sH), row(mp["rho2"], sH))
    wxh = jnp.where(pm_xh[..., None, None], wxh, 0.0)
    dblk_h = dblk_h + jnp.sum(
        jnp.where(pm_xh[..., None, None], e1b_xh, 0.0), axis=2)
    dl00 = jnp.sum(jnp.where(pm_xh, e2a_ss, 0.0), axis=1)  # (nmol, AH)

    # ---- HH block [K:A, K:A]: scalar (ss|ss) ----
    pm_hh = pm[:, sL, sL]
    s111 = diatom_overlap_hh(
        jnp.broadcast_to(qn[:, sL, None], (nmol, AH, AH)),
        jnp.broadcast_to(qn[:, None, sL], (nmol, AH, AH)),
        rij_ov[:, sL, sL],
        jnp.broadcast_to(p["zeta_s"][:, sL, None], (nmol, AH, AH)),
        jnp.broadcast_to(p["zeta_s"][:, None, sL], (nmol, AH, AH)),
        precise=precise_overlap,
                        row3=row3)
    s111 = jnp.where(ov_mask[:, sL, sL], s111, 0.0)
    off_hh = s111 * 0.5 * (p["beta_s"][:, sL, None]
                           + p["beta_s"][:, None, sL])
    if kg is not None:
        off_hh = off_hh * kg[:, sL, sL, 0]
    whh = local_frame_integrals_hh(rij[:, sL, sL],
                                   row(mp["rho0"], sL),
                                   col(mp["rho0"], sL))
    whh = jnp.where(pm_hh, whh, 0.0)
    # ordered row sum covers both electron/core orientations (cells (i,j)
    # and (j,i) both exist in the square block)
    dl00 = dl00 + jnp.sum(-col(tore, sL) * whh, axis=2)

    # ---- assemble M ----
    dblk_h = dblk_h.at[..., 0, 0].add(
        jnp.where(sys.atom_mask[:, sH], p["U_ss"][:, sH], 0.0))
    upp = jnp.where(sys.atom_mask[:, sH], p["U_pp"][:, sH], 0.0)
    for k in (1, 2, 3):
        dblk_h = dblk_h.at[..., k, k].add(upp)
    dl00 = dl00 + jnp.where(sys.atom_mask[:, sL], p["U_ss"][:, sL], 0.0)
    w_out = WPackGridSplit(xx=WPackGrid(rig=ri_xx, ug=U_xx), xh=wxh, hh=whh)

    if packed_m is not None:
        # assemble M directly in the static packed-matrix layout: block
        # concatenations instead of strided scatters into the (A, A, 4, 4)
        # grid — the grid's 16-float interleave relayout + scatter
        # assembly measured 7.4 + 10 ms on the 884-atom force step
        # (tools/fock_dense_probe.py), vs ~1 ms for the heavy-subblock
        # interleave below.
        idh = jnp.arange(K)
        Mp = assemble_packed_mat(off_xx.at[:, idh, idh].set(dblk_h),
                                 off_xh, off_hh, dl00, packed_m)
        return Mp, w_out
    M = jnp.zeros((nmol, A, A, 4, 4), dtype=dtype)
    M = M.at[:, sH, sH].set(off_xx)
    M = M.at[:, sH, sL, :, 0].set(off_xh)
    M = M.at[:, sL, sH, 0, :].set(jnp.swapaxes(off_xh, 1, 2))
    M = M.at[:, sL, sL, 0, 0].set(off_hh)
    idx = jnp.arange(A)
    idh = jnp.arange(K)
    M = M.at[:, idh, idh].set(dblk_h)
    idl = jnp.arange(K, A)
    M = M.at[:, idl, idl, 0, 0].set(dl00)
    return M, w_out
