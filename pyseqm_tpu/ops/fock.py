"""Fock matrix construction: F = Hcore + G(P).

Rebuild of the reference fock (seqm/seqm_functions/fock.py:6-139) on the
static block grid.  The reference's weighted 10-vector contraction of the
packed integral triangle becomes a plain einsum over the full (4,4,4,4)
integral tensor (the symmetric weights are implicit in the dense layout),
and the flat index_add_ scatters become static-index scatter-adds.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..system import System
from .matrix import assemble_packed_mat, grid_to_mat, mat_to_grid
from .tetci import (WPack, WPackGrid, WPackGridSplit, WPackSplit, _w_apply,
                    w_coulomb_i, w_coulomb_j, w_exchange)


def fock_packed_split(sys: System, Pp: jnp.ndarray, Mp: jnp.ndarray,
                      w: WPackGridSplit, p: Dict[str, jnp.ndarray],
                      K: int, n_st: int) -> jnp.ndarray:
    """Fock matrix built ENTIRELY in the static packed layout.

    The grid formulation's cost at 884 atoms is ~0 physics: 7.4 ms for
    the (nmol, 4A, 4A) -> (A, A, 4, 4) density relayout (a 16-float
    interleave at ~13 GB/s effective) plus ~10 ms of strided scatters
    assembling the F grid (tools/fock_dense_probe.py; the actual
    contractions are < 1 ms).  In the packed layout (heavy 4-orbital
    blocks first, hydrogen s rows after) the XH and HH blocks are
    contiguous sub-matrices: the only interleave left is the (4K, 4K)
    heavy sub-block (~8x smaller) and assembly is block concatenation.

    Pp, Mp: (nmol, n_st, n_st) packed density / core Hamiltonian
    (``hcore_dense_split(packed_m=n_st)``), n_st =
    density.packed_solver_size(K, A).  Returns packed F with dead
    p-rows and padding zeroed — directly consumable by
    ``sp2(prepacked=True)``.
    """
    from .density import orbital_mask, static_pack_vec
    nmol, A = sys.species.shape
    AH = A - K
    sH = slice(0, K)
    dtype = Pp.dtype

    # density views — every slice below is contiguous in this layout
    PH4 = Pp[:, :4 * K, :4 * K]
    Pg_h = PH4.reshape(nmol, K, 4, K, 4).transpose(0, 1, 3, 2, 4)
    idh = jnp.arange(K)
    Pd_h = Pg_h[:, idh, idh]                              # (nmol, K, 4, 4)
    P_hs = Pp[:, 4 * K:4 * K + AH, 4 * K:4 * K + AH]      # (nmol, AH, AH)
    idl = jnp.arange(AH)
    pss_l = P_hs[:, idl, idl]                             # (nmol, AH)
    # Pcol[i, j, b] = P[4i+b, 4K+j] (the heavy-row/H-column strip)
    Pcol = (Pp[:, :4 * K, 4 * K:4 * K + AH]
            .reshape(nmol, K, 4, AH).transpose(0, 1, 3, 2))

    gss, gsp = p["g_ss"], p["g_sp"]
    gpp, gp2, hsp = p["g_pp"], p["g_p2"], p["h_sp"]

    # one-center two-electron terms (fock() lines above, heavy block only;
    # the hydrogen tail is s-only so just 0.5 pss gss survives)
    pssh = Pd_h[..., 0, 0]
    pdiag = jnp.stack([Pd_h[..., 1, 1], Pd_h[..., 2, 2], Pd_h[..., 3, 3]],
                      axis=-1)
    pptot = jnp.sum(pdiag, axis=-1)
    gss_h, gsp_h = gss[:, sH], gsp[:, sH]
    gpp_h, gp2_h, hsp_h = gpp[:, sH], gp2[:, sH], hsp[:, sH]
    tmp_h = jnp.zeros_like(Pd_h)
    tmp_h = tmp_h.at[..., 0, 0].set(
        0.5 * pssh * gss_h + pptot * (gsp_h - 0.5 * hsp_h))
    for k in range(1, 4):
        tmp_h = tmp_h.at[..., k, k].set(
            pssh * (gsp_h - 0.5 * hsp_h) + 0.5 * Pd_h[..., k, k] * gpp_h
            + (pptot - Pd_h[..., k, k]) * (1.25 * gp2_h - 0.25 * gpp_h))
        sp = Pd_h[..., 0, k] * (1.5 * hsp_h - 0.5 * gsp_h)
        tmp_h = tmp_h.at[..., 0, k].set(sp)
        tmp_h = tmp_h.at[..., k, 0].set(sp)
    for i, j in ((1, 2), (1, 3), (2, 3)):
        ppx = Pd_h[..., i, j] * (0.75 * gpp_h - 1.25 * gp2_h)
        tmp_h = tmp_h.at[..., i, j].set(ppx)
        tmp_h = tmp_h.at[..., j, i].set(ppx)
    tmp_l = 0.5 * pss_l * gss[:, K:A]

    # XX ordered sub-grid (identical contractions to the grid branch)
    pack = WPack(ri=w.xx.rig, U=w.xx.ug)
    Xj = jnp.broadcast_to(Pd_h[:, None], w.xx.ug.shape[:3] + (4, 4))
    dsum_h = jnp.sum(_w_apply(pack, Xj, (1, 2, 3, 4)), axis=2)
    xch = -0.5 * _w_apply(pack, Pg_h, (1, 3, 2, 4))

    # XH block: w[ab, cd] = wblk[ab] delta_c0 delta_d0
    dsum_h = dsum_h + jnp.sum(w.xh * pss_l[:, None, :, None, None], axis=2)
    dsum_l = jnp.sum(w.xh * Pd_h[:, :, None], axis=(1, -1, -2))
    xcol = -0.5 * jnp.sum(w.xh * Pcol[..., None, :], axis=-1)

    # HH block
    dsum_l = dsum_l + jnp.sum(w.hh * pss_l[:, None, :], axis=2)
    xss = -0.5 * w.hh * P_hs

    xxg = xch.at[:, idh, idh].add(tmp_h + dsum_h)
    F = Mp + assemble_packed_mat(xxg, xcol, xss, tmp_l + dsum_l, n_st)
    mk = static_pack_vec(orbital_mask(sys).astype(dtype), K, n_st)
    return F * (mk[:, :, None] * mk[:, None, :])


def fock(sys: System, P: jnp.ndarray, M: jnp.ndarray, w: WPack,
         p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Build the Fock matrix.

    Args:
      P: (nmol, 4A, 4A) total density matrix (closed shell: P = 2 P_alpha).
      M: (nmol, A, A, 4, 4) core Hamiltonian block grid.
      w: WPack compact two-electron integrals; the frame rotation is fused
         into each contraction (no (4,4,4,4) tensor is ever materialized).
      p: per-atom parameters (g_ss, g_sp, g_pp, g_p2, h_sp), each (nmol, A).

    Returns: (nmol, 4A, 4A) symmetric Fock matrix.
    """
    nmol, A = sys.species.shape
    iu, ju = sys.pair_i, sys.pair_j
    Pg = mat_to_grid(P, A)
    idx = jnp.arange(A)
    Pd = Pg[:, idx, idx]                       # (nmol, A, 4, 4)

    gss, gsp = p["g_ss"], p["g_sp"]
    gpp, gp2, hsp = p["g_pp"], p["g_p2"], p["h_sp"]

    # ---- one-center two-electron terms on the diagonal blocks ----
    # cf. fock.py:54-64; written fully symmetric.
    pss = Pd[..., 0, 0]
    pdiag = jnp.stack([Pd[..., 1, 1], Pd[..., 2, 2], Pd[..., 3, 3]], axis=-1)
    pptot = jnp.sum(pdiag, axis=-1)

    tmp = jnp.zeros_like(Pd)
    tmp = tmp.at[..., 0, 0].set(0.5 * pss * gss + pptot * (gsp - 0.5 * hsp))
    for k in range(1, 4):
        tmp = tmp.at[..., k, k].set(
            pss * (gsp - 0.5 * hsp) + 0.5 * Pd[..., k, k] * gpp
            + (pptot - Pd[..., k, k]) * (1.25 * gp2 - 0.25 * gpp))
        sp = Pd[..., 0, k] * (1.5 * hsp - 0.5 * gsp)
        tmp = tmp.at[..., 0, k].set(sp)
        tmp = tmp.at[..., k, 0].set(sp)
    for i, j in ((1, 2), (1, 3), (2, 3)):
        ppx = Pd[..., i, j] * (0.75 * gpp - 1.25 * gp2)
        tmp = tmp.at[..., i, j].set(ppx)
        tmp = tmp.at[..., j, i].set(ppx)

    if isinstance(w, WPackGridSplit):
        # class-segmented dense grid (large molecules, see hcore_dense_
        # split): the [0:K,0:K] ordered sub-grid pays the full fused
        # w-apply, the X-H block a single elementwise 4x4 product (one
        # array serves both orientations), the H-H block a scalar.
        K = w.xh.shape[1]
        sH, sL = slice(0, K), slice(K, None)
        Pd_h, Pd_l = Pd[:, sH], Pd[:, sL]
        pss_l = Pd_l[..., 0, 0]                      # (nmol, AH)
        F = M + 0.0

        # XX ordered sub-grid: both Coulomb halves via the row pairing,
        # exchange covers both triangles directly
        pack = WPack(ri=w.xx.rig, U=w.xx.ug)
        Xj = jnp.broadcast_to(Pd_h[:, None], w.xx.ug.shape[:3] + (4, 4))
        dsum_h = jnp.sum(_w_apply(pack, Xj, (1, 2, 3, 4)), axis=2)
        F = F.at[:, sH, sH].add(
            -0.5 * _w_apply(pack, Pg[:, sH, sH], (1, 3, 2, 4)))

        # XH block: w[ab, cd] = wblk[ab] delta_c0 delta_d0
        dsum_h = dsum_h + jnp.sum(
            w.xh * pss_l[:, None, :, None, None], axis=2)
        dsum_l = jnp.sum(w.xh * Pd_h[:, :, None], axis=(1, -1, -2))
        Pcol = Pg[:, sH, sL, :, 0]                   # (nmol, K, AH, 4)
        xcol = -0.5 * jnp.sum(w.xh * Pcol[..., None, :], axis=-1)
        F = F.at[:, sH, sL, :, 0].add(xcol)
        F = F.at[:, sL, sH, 0, :].add(jnp.swapaxes(xcol, 1, 2))

        # HH block: scalar (ss|ss); the full ordered square covers both
        # orientations in one row reduction
        dsum_l = dsum_l + jnp.sum(w.hh * pss_l[:, None, :], axis=2)
        F = F.at[:, sL, sL, 0, 0].add(-0.5 * w.hh * Pg[:, sL, sL, 0, 0])

        idh = jnp.arange(K)
        F = F.at[:, idh, idh].add(tmp[:, sH] + dsum_h)
        idl = jnp.arange(K, A)
        F = F.at[:, idl, idl].add(tmp[:, sL])
        F = F.at[:, idl, idl, 0, 0].add(dsum_l)
        return grid_to_mat(F)

    if isinstance(w, WPackGrid):
        # dense ordered-pair path (large molecules): every contraction is a
        # broadcast + axis reduction — no scatters or gathers in the hot
        # SCF loop.  Each ordered cell (i, j) carries the bra on i, so one
        # ket-pairing covers both of the flat path's Coulomb halves, and
        # the exchange grid directly yields both F triangles.
        pack = WPack(ri=w.rig, U=w.ug)
        Xj = jnp.broadcast_to(Pd[:, None], Pg.shape)
        coul = _w_apply(pack, Xj, (1, 2, 3, 4))        # (nmol, A, A, 4, 4)
        dsum = jnp.sum(coul, axis=2)
        x = -0.5 * _w_apply(pack, Pg, (1, 3, 2, 4))    # zero on diagonal cells
        F = M + x
        F = F.at[:, idx, idx].add(tmp + dsum)
        return grid_to_mat(F)

    if isinstance(w, WPackSplit):
        # class-segmented pairs (static pair packing, see tetci.WPackSplit
        # and system.pair_index_packed): XX pairs pay the fused 22-integral
        # w-apply, XH pairs a single 4x4 elementwise block product, HH
        # pairs a scalar — ~7x less contraction work on organic batches.
        n_xx = w.xx.ri.shape[1]
        n_xh = w.xh.shape[1]
        s_xx = slice(0, n_xx)
        s_xh = slice(n_xx, n_xx + n_xh)
        s_hh = slice(n_xx + n_xh, None)
        dsum = jnp.zeros_like(Pd)
        F = M + 0.0

        # XX: full Coulomb/exchange contractions on the heavy-heavy slice
        iu_s, ju_s = iu[s_xx], ju[s_xx]
        dsum = dsum.at[:, iu_s].add(w_coulomb_i(w.xx, Pd[:, ju_s]))
        dsum = dsum.at[:, ju_s].add(w_coulomb_j(w.xx, Pd[:, iu_s]))
        x = -0.5 * w_exchange(w.xx, Pg[:, iu_s, ju_s])
        F = F.at[:, iu_s, ju_s].add(x)
        F = F.at[:, ju_s, iu_s].add(jnp.swapaxes(x, -1, -2))

        # XH: w[ab,cd] is wblk[ab] delta_c0 delta_d0
        iu_s, ju_s = iu[s_xh], ju[s_xh]
        pss_j = Pd[:, ju_s, 0, 0]
        dsum = dsum.at[:, iu_s].add(w.xh * pss_j[..., None, None])
        dsum = dsum.at[:, ju_s, 0, 0].add(
            jnp.sum(w.xh * Pd[:, iu_s], axis=(-1, -2)))
        Pcol = jnp.swapaxes(Pg[:, iu_s, ju_s, :, 0:1], -1, -2)  # (.., 1, 4)
        xcol = -0.5 * jnp.sum(w.xh * Pcol, axis=-1)
        # 0:1 slices keep advanced indices adjacent (no front-placement)
        F = F.at[:, iu_s, ju_s, :, 0:1].add(xcol[..., None])
        F = F.at[:, ju_s, iu_s, 0:1, :].add(xcol[..., None, :])

        # HH: scalar (ss|ss)
        iu_s, ju_s = iu[s_hh], ju[s_hh]
        dsum = dsum.at[:, iu_s, 0, 0].add(w.hh * Pd[:, ju_s, 0, 0])
        dsum = dsum.at[:, ju_s, 0, 0].add(w.hh * Pd[:, iu_s, 0, 0])
        xss = -0.5 * w.hh * Pg[:, iu_s, ju_s, 0, 0]
        F = F.at[:, iu_s, ju_s, 0, 0].add(xss)
        F = F.at[:, ju_s, iu_s, 0, 0].add(xss)

        F = F.at[:, idx, idx].add(tmp + dsum)
        return grid_to_mat(F)

    # ---- two-center Coulomb: diagonal-block contributions ----
    # diag(i) += sum_j w_(ij)[ab,cd] P_diag(j)[cd]  (and the mirror);
    # cf. the weighted PA/PB contraction in fock.py:80-110.
    sum_to_i = w_coulomb_i(w, Pd[:, ju])
    sum_to_j = w_coulomb_j(w, Pd[:, iu])
    dsum = jnp.zeros_like(Pd)
    dsum = dsum.at[:, iu].add(sum_to_i)
    dsum = dsum.at[:, ju].add(sum_to_j)

    # ---- two-center exchange on the off-diagonal blocks ----
    # F_(ij)[a,c] = -0.5 sum_{b,d} P_(ij)[b,d] w_(ij)[ab,cd]; cf. fock.py:117-131
    Pp = Pg[:, iu, ju]
    x = -0.5 * w_exchange(w, Pp)

    F = M + 0.0
    F = F.at[:, idx, idx].add(tmp + dsum)
    F = F.at[:, iu, ju].add(x)
    F = F.at[:, ju, iu].add(jnp.swapaxes(x, -1, -2))
    return grid_to_mat(F)
