"""Two-electron two-center integrals (NDDO multipole model) + frame rotation.

TPU-native redesign of the reference's local-frame integral routine and its
878-line hand-unrolled rotation (seqm/seqm_functions/
two_elec_two_center_int_local_frame.py:18-281, two_elec_two_center_int.py:
56-878).  Two structural changes:

1. *Unified pair formula.*  The reference splits pairs into H-H / X-H / X-X
   classes computing 1 / 4 / 22 unique local integrals.  Setting the
   hydrogen multipole separations and additive terms to zero (dd = qq =
   rho1 = rho2 = 0) makes every multipole contribution vanish analytically,
   so the full 22-integral X-X formula reproduces all three classes.  One
   dense branch-free computation replaces the three-way boolean split.

2. *Tensor rotation.*  The local->molecular transform of the (mu nu|la si)
   block is the 4-fold application of the per-pair AO frame matrix
   U = [[1, 0], [0, R]] (R columns = bond axis x, in-plane y, out-of-plane
   z) to a sparse local tensor RI[k,l,m,n] holding the 22 unique values.
   The reference's 100 unrolled w formulas are exactly
   w[a,b,c,d] = U[a,k] U[b,l] U[c,m] U[d,n] RI[k,l,m,n], an einsum.

Orbital order, local frame: (s, p_sigma, p_pi, p_pi*).
Orbital order, molecular frame: (s, p_x, p_y, p_z).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..constants import EV


# ------------------------------------------------------------------
# Local-frame integrals: 22 unique values per pair (MOPAC repp order)
# ------------------------------------------------------------------

def local_frame_integrals(r, tore_i, tore_j, da, db, qa0, qb0,
                          rho0a, rho0b, rho1a, rho1b, rho2a, rho2b):
    """The 22 unique local-frame (mu nu|la si) integrals and core columns.

    All args shaped (...,); hydrogens carry da=qa0=rho1=rho2=0 which makes
    the multipole terms vanish (see module docstring).  Returns
    (ri (..., 22) in eV, core_a (..., 4), core_b (..., 4)) where core_a =
    electron on atom i attracted by core of j: columns (ss, s sigma,
    sigma sigma, pi pi); core_b is the mirror.
    """
    ev1, ev2, ev3, ev4 = EV / 2.0, EV / 4.0, EV / 8.0, EV / 16.0
    qa = 2.0 * qa0
    qb = 2.0 * qb0

    aee = (rho0a + rho0b) ** 2
    ade = (rho1a + rho0b) ** 2
    aqe = (rho2a + rho0b) ** 2
    aed = (rho0a + rho1b) ** 2
    aeq = (rho0a + rho2b) ** 2
    axx = (rho1a + rho1b) ** 2
    adq = (rho1a + rho2b) ** 2
    aqd = (rho2a + rho1b) ** 2
    aqq = (rho2a + rho2b) ** 2

    rsq = lambda t, add: jnp.sqrt(t ** 2 + add)

    ee = EV / rsq(r, aee)
    dze = -ev1 / rsq(r + da, ade) + ev1 / rsq(r - da, ade)
    e_qe = ev1 / rsq(r, aqe)
    qzze = ev2 / rsq(r - qa, aqe) + ev2 / rsq(r + qa, aqe) - e_qe
    qxxe = ev1 / jnp.sqrt(r ** 2 + qa ** 2 + aqe) - e_qe
    edz = -ev1 / rsq(r - db, aed) + ev1 / rsq(r + db, aed)
    e_eq = ev1 / rsq(r, aeq)
    eqzz = ev2 / rsq(r - qb, aeq) + ev2 / rsq(r + qb, aeq) - e_eq
    eqxx = ev1 / jnp.sqrt(r ** 2 + qb ** 2 + aeq) - e_eq

    dxdx = ev1 / jnp.sqrt(r ** 2 + (da - db) ** 2 + axx) \
        - ev1 / jnp.sqrt(r ** 2 + (da + db) ** 2 + axx)
    dzdz = ev2 / rsq(r + da - db, axx) + ev2 / rsq(r - da + db, axx) \
        - ev2 / rsq(r - da - db, axx) - ev2 / rsq(r + da + db, axx)

    ev2_p_adq = ev2 / rsq(r + da, adq)
    ev2_m_adq = ev2 / rsq(r - da, adq)
    ev2_m_aqd = ev2 / rsq(r - db, aqd)
    ev2_p_aqd = ev2 / rsq(r + db, aqd)

    dzqzz = (-ev3 / rsq(r + da - qb, adq) + ev3 / rsq(r - da - qb, adq)
             - ev3 / rsq(r + da + qb, adq) + ev3 / rsq(r - da + qb, adq)
             - ev2_m_adq + ev2_p_adq)
    qzzdz = (-ev3 / rsq(r + qa - db, aqd) + ev3 / rsq(r + qa + db, aqd)
             - ev3 / rsq(r - qa - db, aqd) + ev3 / rsq(r - qa + db, aqd)
             + ev2_m_aqd - ev2_p_aqd)
    dzqxx = (ev2_p_adq - ev2 / jnp.sqrt((r + da) ** 2 + qb ** 2 + adq)
             - ev2_m_adq + ev2 / jnp.sqrt((r - da) ** 2 + qb ** 2 + adq))
    qxxdz = (ev2_m_aqd - ev2 / jnp.sqrt((r - db) ** 2 + qa ** 2 + aqd)
             - ev2_p_aqd + ev2 / jnp.sqrt((r + db) ** 2 + qa ** 2 + aqd))
    # off-axis multipoles use the *single* charge separation (qa0/qb0),
    # cf. repp.f SQR(54)-SQR(72)
    dxqxz = (-ev2 / jnp.sqrt((da - qb0) ** 2 + (r - qb0) ** 2 + adq)
             + ev2 / jnp.sqrt((da - qb0) ** 2 + (r + qb0) ** 2 + adq)
             + ev2 / jnp.sqrt((da + qb0) ** 2 + (r - qb0) ** 2 + adq)
             - ev2 / jnp.sqrt((da + qb0) ** 2 + (r + qb0) ** 2 + adq))
    qxzdx = (-ev2 / jnp.sqrt((qa0 - db) ** 2 + (r + qa0) ** 2 + aqd)
             + ev2 / jnp.sqrt((qa0 - db) ** 2 + (r - qa0) ** 2 + aqd)
             + ev2 / jnp.sqrt((qa0 + db) ** 2 + (r + qa0) ** 2 + aqd)
             - ev2 / jnp.sqrt((qa0 + db) ** 2 + (r - qa0) ** 2 + aqd))

    ev2_aqq = ev2 / jnp.sqrt(r ** 2 + aqq)
    ev2_qa_aqq = ev2 / jnp.sqrt(r ** 2 + qa ** 2 + aqq)
    ev2_qb_aqq = ev2 / jnp.sqrt(r ** 2 + qb ** 2 + aqq)
    ev3_mqb = ev3 / rsq(r - qb, aqq)
    ev3_pqb = ev3 / rsq(r + qb, aqq)
    ev3_pqa = ev3 / rsq(r + qa, aqq)
    ev3_mqa = ev3 / rsq(r - qa, aqq)

    qzzqzz = (ev4 / rsq(r + qa - qb, aqq) + ev4 / rsq(r + qa + qb, aqq)
              + ev4 / rsq(r - qa - qb, aqq) + ev4 / rsq(r - qa + qb, aqq)
              - ev3_mqa - ev3_pqa - ev3_mqb - ev3_pqb + ev2_aqq)
    qxxqzz = (ev3 / jnp.sqrt((r - qb) ** 2 + qa ** 2 + aqq)
              + ev3 / jnp.sqrt((r + qb) ** 2 + qa ** 2 + aqq)
              - ev3_mqb - ev3_pqb - ev2_qa_aqq + ev2_aqq)
    qzzqxx = (ev3 / jnp.sqrt((r + qa) ** 2 + qb ** 2 + aqq)
              + ev3 / jnp.sqrt((r - qa) ** 2 + qb ** 2 + aqq)
              - ev3_pqa - ev3_mqa - ev2_qb_aqq + ev2_aqq)
    qxxqxx = (ev3 / jnp.sqrt(r ** 2 + (qa - qb) ** 2 + aqq)
              + ev3 / jnp.sqrt(r ** 2 + (qa + qb) ** 2 + aqq)
              - ev2_qa_aqq - ev2_qb_aqq + ev2_aqq)
    qxxqyy = (ev2 / jnp.sqrt(r ** 2 + qa ** 2 + qb ** 2 + aqq)
              - ev2_qa_aqq - ev2_qb_aqq + ev2_aqq)
    qxzqxz = (ev3 / jnp.sqrt((r + qa0 - qb0) ** 2 + (qa0 - qb0) ** 2 + aqq)
              - ev3 / jnp.sqrt((r + qa0 + qb0) ** 2 + (qa0 - qb0) ** 2 + aqq)
              - ev3 / jnp.sqrt((r - qa0 - qb0) ** 2 + (qa0 - qb0) ** 2 + aqq)
              + ev3 / jnp.sqrt((r - qa0 + qb0) ** 2 + (qa0 - qb0) ** 2 + aqq)
              - ev3 / jnp.sqrt((r + qa0 - qb0) ** 2 + (qa0 + qb0) ** 2 + aqq)
              + ev3 / jnp.sqrt((r + qa0 + qb0) ** 2 + (qa0 + qb0) ** 2 + aqq)
              + ev3 / jnp.sqrt((r - qa0 - qb0) ** 2 + (qa0 + qb0) ** 2 + aqq)
              - ev3 / jnp.sqrt((r - qa0 + qb0) ** 2 + (qa0 + qb0) ** 2 + aqq))

    ri = jnp.stack([
        ee,                                   # 1  (ss|ss)
        -dze,                                 # 2  (so|ss)
        ee + qzze,                            # 3  (oo|ss)
        ee + qxxe,                            # 4  (pp|ss)
        -edz,                                 # 5  (ss|os)
        dzdz,                                 # 6  (so|so)
        dxdx,                                 # 7  (sp|sp)
        -edz - qzzdz,                         # 8  (oo|so)
        -edz - qxxdz,                         # 9  (pp|so)
        -qxzdx,                               # 10 (po|sp)
        ee + eqzz,                            # 11 (ss|oo)
        ee + eqxx,                            # 12 (ss|pp)
        -dze - dzqzz,                         # 13 (so|oo)
        -dze - dzqxx,                         # 14 (so|pp)
        -dxqxz,                               # 15 (sp|op)
        ee + eqzz + qzze + qzzqzz,            # 16 (oo|oo)
        ee + eqzz + qxxe + qxxqzz,            # 17 (pp|oo)
        ee + eqxx + qzze + qzzqxx,            # 18 (oo|pp)
        ee + eqxx + qxxe + qxxqxx,            # 19 (pp|pp)
        qxzqxz,                               # 20 (po|po)
        ee + eqxx + qxxe + qxxqyy,            # 21 (pp|p*p*)
        0.5 * (qxxqxx - qxxqyy),              # 22 (p*p|p*p)
    ], axis=-1)

    # electron-core attraction columns (repp.f CORE): a-side feels core of j
    core_a = tore_j[..., None] * ri[..., (0, 1, 2, 3)]
    core_b = tore_i[..., None] * ri[..., (0, 4, 10, 11)]
    return ri, core_a, core_b


def local_frame_integrals_xh(r, da, qa0, rho0a, rho0b, rho1a, rho2a):
    """X-H pair class: the 4 unique local integrals (ss|ss), (so|ss),
    (oo|ss), (pp|ss) — the lighter atom carries only an s distribution
    (db = qb = rho1b = rho2b = 0 makes every b-side multipole term vanish
    analytically; cf. the reference's 4-integral X-H branch,
    two_elec_two_center_int_local_frame.py:64-66).

    Returns ri4 (..., 4) in eV, in the (ss, so, oo, pp) order of the
    local (mu nu | ss) matrix.
    """
    ev1, ev2 = EV / 2.0, EV / 4.0
    qa = 2.0 * qa0
    aee = (rho0a + rho0b) ** 2
    ade = (rho1a + rho0b) ** 2
    aqe = (rho2a + rho0b) ** 2
    rsq = lambda t, add: jnp.sqrt(t ** 2 + add)           # noqa: E731
    ee = EV / rsq(r, aee)
    dze = -ev1 / rsq(r + da, ade) + ev1 / rsq(r - da, ade)
    e_qe = ev1 / rsq(r, aqe)
    qzze = ev2 / rsq(r - qa, aqe) + ev2 / rsq(r + qa, aqe) - e_qe
    qxxe = ev1 / jnp.sqrt(r ** 2 + qa ** 2 + aqe) - e_qe
    return jnp.stack([ee, -dze, ee + qzze, ee + qxxe], axis=-1)


def local_frame_integrals_hh(r, rho0a, rho0b):
    """H-H pair class: the single (ss|ss) integral (eV)."""
    return EV / jnp.sqrt(r ** 2 + (rho0a + rho0b) ** 2)


# ------------------------------------------------------------------
# Sparse local tensor and frame rotation
# ------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _ri_expansion_table() -> np.ndarray:
    """Constant (22, 4, 4, 4, 4) 0/1 tensor T: RI[klmn] = ri @ T.

    Local orbitals: 0=s, 1=p_sigma, 2=p_pi, 3=p_pi*.  Each entry lists the
    (bra, ket) orbital pairs carrying that unique integral; bra/ket are
    symmetric under index swap, and the two pi directions are equivalent
    everywhere except entries 21/22 which couple them explicitly.
    """
    ENTRIES = [
        [((0, 0), (0, 0))],                                # 1  (ss|ss)
        [((1, 0), (0, 0))],                                # 2  (so|ss)
        [((1, 1), (0, 0))],                                # 3  (oo|ss)
        [((2, 2), (0, 0)), ((3, 3), (0, 0))],              # 4  (pp|ss)
        [((0, 0), (1, 0))],                                # 5  (ss|os)
        [((1, 0), (1, 0))],                                # 6  (so|so)
        [((2, 0), (2, 0)), ((3, 0), (3, 0))],              # 7  (sp|sp)
        [((1, 1), (1, 0))],                                # 8  (oo|so)
        [((2, 2), (1, 0)), ((3, 3), (1, 0))],              # 9  (pp|so)
        [((2, 1), (2, 0)), ((3, 1), (3, 0))],              # 10 (po|sp)
        [((0, 0), (1, 1))],                                # 11 (ss|oo)
        [((0, 0), (2, 2)), ((0, 0), (3, 3))],              # 12 (ss|pp)
        [((1, 0), (1, 1))],                                # 13 (so|oo)
        [((1, 0), (2, 2)), ((1, 0), (3, 3))],              # 14 (so|pp)
        [((2, 0), (2, 1)), ((3, 0), (3, 1))],              # 15 (sp|op)
        [((1, 1), (1, 1))],                                # 16 (oo|oo)
        [((2, 2), (1, 1)), ((3, 3), (1, 1))],              # 17 (pp|oo)
        [((1, 1), (2, 2)), ((1, 1), (3, 3))],              # 18 (oo|pp)
        [((2, 2), (2, 2)), ((3, 3), (3, 3))],              # 19 (pp|pp)
        [((2, 1), (2, 1)), ((3, 1), (3, 1))],              # 20 (po|po)
        [((2, 2), (3, 3)), ((3, 3), (2, 2))],              # 21 (pp|p*p*)
        [((2, 3), (2, 3))],                                # 22 (p*p|p*p)
    ]
    T = np.zeros((22, 4, 4, 4, 4), dtype=np.float64)
    for idx, pairs in enumerate(ENTRIES):
        for (k, l), (m, n) in pairs:
            for kk, ll in {(k, l), (l, k)}:
                for mm, nn in {(m, n), (n, m)}:
                    T[idx, kk, ll, mm, nn] = 1.0
    return T


def frame_matrix(xij):
    """Per-pair AO frame transform U (..., 4, 4).

    U[0,0] = 1; U[1+a, 1] = x_a, U[1+a, 2] = y_a, U[1+a, 3] = z_a where
    x = -xij is the local sigma axis and (y, z) complete an orthonormal
    frame.  The two-electron tensor is invariant under rotations about the
    bond (the two pi channels are equivalent; cf. the (qxxqxx-qxxqyy)/2
    relation in repp.f), so the gauge is free: instead of the reference's
    pole-prone construction (two_elec_two_center_int.py:233-266, which
    cancels catastrophically in 1 - x_z^2 for near-axis bonds — fatal in
    f32 with TPU transcendental rounding), build y by crossing x with the
    coordinate axis least aligned with it.  Stable everywhere:
    |x cross ref| >= 1/sqrt(2).
    """
    dtype = xij.dtype
    x = -xij
    # reference axis: e_z unless the bond is within 45 deg of z, else e_x
    use_z = (jnp.abs(x[..., 2]) < 0.70710678)[..., None]
    ez = jnp.asarray([0.0, 0.0, 1.0], dtype)
    ex = jnp.asarray([1.0, 0.0, 0.0], dtype)
    ref = jnp.where(use_z, ez, ex)
    y = jnp.cross(x, ref)
    y = y / jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
    z = jnp.cross(x, y)

    zero = jnp.zeros_like(x[..., 0])
    one = jnp.ones_like(zero)
    U = jnp.stack([
        jnp.stack([one, zero, zero, zero], axis=-1),
        jnp.stack([zero, x[..., 0], y[..., 0], z[..., 0]], axis=-1),
        jnp.stack([zero, x[..., 1], y[..., 1], z[..., 1]], axis=-1),
        jnp.stack([zero, x[..., 2], y[..., 2], z[..., 2]], axis=-1),
    ], axis=-2)
    return U


def rotate_w(ri, xij, U=None):
    """Rotate local integrals to the molecular frame: (..., 4, 4, 4, 4)."""
    T = jnp.asarray(_ri_expansion_table(), dtype=ri.dtype)
    RI = jnp.einsum('...r,rklmn->...klmn', ri, T)
    if U is None:
        U = frame_matrix(xij)
    # four successive small contractions; XLA fuses these well
    W = jnp.einsum('...ak,...klmn->...almn', U, RI)
    W = jnp.einsum('...bl,...almn->...abmn', U, W)
    W = jnp.einsum('...cm,...abmn->...abcn', U, W)
    W = jnp.einsum('...dn,...abcn->...abcd', U, W)
    return W


def _core_matrix(core):
    """Local electron-core attraction matrix from the 4 unique columns
    (ss, s sigma, sigma sigma, pi pi)."""
    dtype = core.dtype
    C = jnp.zeros(core.shape[:-1] + (4, 4), dtype=dtype)
    C = C.at[..., 0, 0].set(core[..., 0])
    C = C.at[..., 0, 1].set(core[..., 1])
    C = C.at[..., 1, 0].set(core[..., 1])
    C = C.at[..., 1, 1].set(core[..., 2])
    C = C.at[..., 2, 2].set(core[..., 3])
    C = C.at[..., 3, 3].set(core[..., 3])
    return C


def rotate_core(core, xij):
    """Negated symmetric e1b/e2a block: e[a,b] = -U[a,k] U[b,l] C[k,l]."""
    U = frame_matrix(xij)
    return -jnp.einsum('...ak,...kl,...bl->...ab', U, _core_matrix(core), U)


# ------------------------------------------------------------------
# Fused local-frame representation (production path)
# ------------------------------------------------------------------
#
# Materializing w as (..., 4, 4, 4, 4) is hostile to TPU layouts: the
# minor dims of size 4 pad to the 128-lane tile (32x memory expansion,
# multi-GB copies at 10k-molecule batches).  Instead we carry the compact
# per-pair representation (ri (...,22), U (...,4,4)) and fuse the frame
# rotation into every consumer:
#     w = (U (x) U) . RI(ri) . (U (x) U)^T
# so Fock contractions become: rotate 4x4 density blocks into the local
# frame (small batched matmuls), contract against the *constant* sparsity
# tensor T (matmuls with a (16, 352) constant), rotate back.  No 6-D
# tensors, no padding blowup, an order of magnitude less HBM traffic.

class WPack(NamedTuple):
    """Compact two-electron integral representation: w is implicit."""
    ri: jnp.ndarray   # (..., 22) local-frame unique integrals (eV)
    U: jnp.ndarray    # (..., 4, 4) per-pair AO frame transform


# The contractions below are fully unrolled into elementwise vector ops on
# (..., ) component slices.  Batched 4x4 dot_generals are poison on TPU
# (the size-4 contraction dims force lane-padded layouts, 32x memory and
# abysmal MXU utilization); unrolled multiply-adds fuse into a handful of
# VPU kernels instead.  The U sparsity (U[0,:] = e_0, U[a>0,0] = 0) and
# the ~160 nonzeros of the sparsity tensor T keep the op count small.

def _unstack(X):
    return [[X[..., a, b] for b in range(4)] for a in range(4)]


def _u_rows(U):
    """U component slices; row 0 is (1,0,0,0) structurally."""
    return [[U[..., a, k] for k in range(4)] for a in range(4)]


def _rot_to_local(u, X):
    """Xloc[k][l] = sum_ab U[a,k] X[a,b] U[b,l], exploiting U sparsity."""
    # t[k][b] = sum_a U[a,k] X[a,b]
    t = [[None] * 4 for _ in range(4)]
    for b in range(4):
        t[0][b] = X[0][b]
        for k in range(1, 4):
            t[k][b] = (u[1][k] * X[1][b] + u[2][k] * X[2][b]
                       + u[3][k] * X[3][b])
    y = [[None] * 4 for _ in range(4)]
    for k in range(4):
        y[k][0] = t[k][0]
        for l in range(1, 4):
            y[k][l] = (t[k][1] * u[1][l] + t[k][2] * u[2][l]
                       + t[k][3] * u[3][l])
    return y


def _rot_from_local(u, y):
    """e[a][b] = sum_kl U[a,k] y[k][l] U[b,l]."""
    # s[a][l] = sum_k U[a,k] y[k][l]
    s = [[None] * 4 for _ in range(4)]
    for l in range(4):
        s[0][l] = y[0][l]
        for a in range(1, 4):
            s[a][l] = (u[a][1] * y[1][l] + u[a][2] * y[2][l]
                       + u[a][3] * y[3][l])
    e = [[None] * 4 for _ in range(4)]
    for a in range(4):
        e[a][0] = s[a][0]
        for b in range(1, 4):
            e[a][b] = (s[a][1] * u[b][1] + s[a][2] * u[b][2]
                       + s[a][3] * u[b][3])
    return e


def _stack44(e):
    return jnp.stack([jnp.stack(row, axis=-1) for row in e], axis=-2)


@functools.lru_cache(maxsize=None)
def _t_nonzeros(perm):
    """Nonzero entries of T permuted to (r, free1, free2, con1, con2):
    dict (free1, free2) -> list of (r, con1, con2)."""
    T = _ri_expansion_table().transpose((0,) + perm)
    out = {}
    for r in range(22):
        for a in range(4):
            for b in range(4):
                for c in range(4):
                    for d in range(4):
                        if T[r, a, b, c, d] != 0.0:
                            out.setdefault((a, b), []).append((r, c, d))
    return out


def _apply_T(ri_s, Xloc, perm):
    """y[f1][f2] = sum_r ri[r] sum_(c1,c2) T_perm[r,f1,f2,c1,c2] Xloc[c1][c2]."""
    nz = _t_nonzeros(perm)
    y = [[None] * 4 for _ in range(4)]
    for (a, b), terms in nz.items():
        acc = None
        # group by r so each ri multiplies one accumulated X-sum
        byr = {}
        for r, c, d in terms:
            byr.setdefault(r, []).append((c, d))
        for r, cds in byr.items():
            xs = Xloc[cds[0][0]][cds[0][1]]
            for c, d in cds[1:]:
                xs = xs + Xloc[c][d]
            term = ri_s[r] * xs
            acc = term if acc is None else acc + term
        y[a][b] = acc
    zero = jnp.zeros_like(ri_s[0])
    for a in range(4):
        for b in range(4):
            if y[a][b] is None:
                y[a][b] = zero
    return y


def _w_apply(pack: WPack, X, perm):
    u = _u_rows(pack.U)
    ri_s = [pack.ri[..., r] for r in range(22)]
    Xloc = _rot_to_local(u, _unstack(X))
    y = _apply_T(ri_s, Xloc, perm)
    return _stack44(_rot_from_local(u, y))


def w_coulomb_i(pack: WPack, pdiag_j):
    """sum_cd w[ab,cd] Pdiag_j[cd] -> (..., 4, 4) added to atom i's block."""
    return _w_apply(pack, pdiag_j, (1, 2, 3, 4))


def w_coulomb_j(pack: WPack, pdiag_i):
    """sum_ab w[ab,cd] Pdiag_i[ab] -> (..., 4, 4) added to atom j's block."""
    return _w_apply(pack, pdiag_i, (3, 4, 1, 2))


def w_exchange(pack: WPack, p_pair):
    """sum_bd w[ab,cd] P_pair[bd] -> (..., 4, 4) (a,c block)."""
    return _w_apply(pack, p_pair, (1, 3, 2, 4))


# bra<->ket swap permutation of the 22 local integrals: w_ji = w_ij^T
# (transpose over the (ab),(cd) index groups) equals the rotation of the
# relabeled locals with the SAME frame U
RI_SWAP = np.array([0, 4, 10, 11, 1, 5, 6, 12, 13, 14,
                    2, 3, 7, 8, 9, 15, 17, 16, 18, 19, 20, 21])


class WPackGrid(NamedTuple):
    """Grid-resident two-electron integrals for scatter-free Fock builds.

    rig[n, i, j] holds the local integrals of the ordered pair (i, j)
    (zero on the diagonal / masked pairs); ug[n, i, j] the shared frame.
    Memory O(nmol A^2); used for large single molecules where the flat
    pair list's scatter/gather ops dominate the Fock cost.
    """
    rig: jnp.ndarray   # (nmol, A, A, 22)
    ug: jnp.ndarray    # (nmol, A, A, 4, 4)


def to_grid(pack: WPack, A: int, iu, ju) -> WPackGrid:
    nmol = pack.ri.shape[0]
    rig = jnp.zeros((nmol, A, A, 22), pack.ri.dtype)
    rig = rig.at[:, iu, ju].set(pack.ri)
    rig = rig.at[:, ju, iu].set(pack.ri[..., RI_SWAP])
    ug = jnp.zeros((nmol, A, A, 4, 4), pack.U.dtype)
    ug = ug.at[:, iu, ju].set(pack.U)
    ug = ug.at[:, ju, iu].set(pack.U)
    return WPackGrid(rig=rig, ug=ug)


def from_grid(wg: WPackGrid, iu, ju) -> WPack:
    """Extract the flat (i<j) WPack from grid-resident integrals.

    One cheap gather; used when integrals are built dense (hcore_dense)
    but a consumer prefers the flat contraction path (e.g. the XL force
    model, whose flat Fock *backward* is faster than the dense one)."""
    return WPack(ri=wg.rig[:, iu, ju], U=wg.ug[:, iu, ju])


def assemble_w(pack: WPack) -> jnp.ndarray:
    """Materialize the full (..., 4,4,4,4) integral tensor (tests only)."""
    return rotate_w(pack.ri, None, U=pack.U)


def _core_block_unrolled(u, core):
    """e[a,b] = -sum_kl U[a,k] C[k,l] U[b,l] with the sparse local C."""
    zero = jnp.zeros_like(core[..., 0])
    C = [[zero] * 4 for _ in range(4)]
    C[0][0] = core[..., 0]
    C[0][1] = core[..., 1]
    C[1][0] = core[..., 1]
    C[1][1] = core[..., 2]
    C[2][2] = core[..., 3]
    C[3][3] = core[..., 3]
    e = _rot_from_local(u, C)
    return -_stack44(e)


def pair_w_pack(rij, xij, tore_i, tore_j, da, db, qa, qb,
                rho0a, rho0b, rho1a, rho1b, rho2a, rho2b):
    """Compact production pipeline: (WPack, e1b, e2a)."""
    ri, core_a, core_b = local_frame_integrals(
        rij, tore_i, tore_j, da, db, qa, qb,
        rho0a, rho0b, rho1a, rho1b, rho2a, rho2b)
    U = frame_matrix(xij)
    u = _u_rows(U)
    e1b = _core_block_unrolled(u, core_a)
    e2a = _core_block_unrolled(u, core_b)
    return WPack(ri=ri, U=U), e1b, e2a


class WPackSplit(NamedTuple):
    """Class-segmented two-electron integrals (static pair packing).

    Built over the pair_index_packed enumeration (system.py): with the
    batch-max heavy count K, segment boundaries are static, so each class
    stores exactly the integrals it physically has — the reference's
    1/4/22-integral H-H/X-H/X-X split (two_elec_two_center_int_local_
    frame.py:5-15) realized as static array slices instead of boolean
    subsetting.  Segment sizes are recoverable from the array shapes.
    """
    xx: WPack          # full pairs (i < j < K): ri (..., 22) + frame U
    xh: jnp.ndarray    # (..., 4, 4) rotated (mu nu | ss) blocks, i < K <= j
    hh: jnp.ndarray    # (...,) (ss|ss) integrals, K <= i < j

    def gam(self) -> jnp.ndarray:
        """(ss|ss) per pair, segment-concatenated (nuclear-term gamma).

        Rotation leaves the [0, 0] element invariant, so xh[..., 0, 0]
        is the local (ss|ss)."""
        return jnp.concatenate(
            [self.xx.ri[..., 0], self.xh[..., 0, 0], self.hh], axis=-1)


class WPackGridSplit(NamedTuple):
    """Class-segmented grid-resident integrals for large molecules.

    Two-level block layout keyed on the batch-max heavy count K (atoms
    sorted descending-Z puts every hydrogen/padding slot at index >= K):

      xx: ordered (nmol, K, K) sub-grid, full 22-integral cells (bra on
          the row atom — WPackGrid's contract restricted to the heavy
          block);
      xh: (nmol, K, A-K, 4, 4) rotated (mu nu | ss) blocks — ONE block
          serves both orientations (the (H, heavy) cell's integrals are
          the transpose, which for an (.. | ss) ket is the same block);
      hh: (nmol, A-K, A-K) (ss|ss) scalars (zero diagonal).

    vs the full WPackGrid at 884 atoms (C294H592): ~6x less integral
    memory and ~5x fewer w-apply FLOPs per Fock build.
    """
    xx: "WPackGrid"
    xh: jnp.ndarray
    hh: jnp.ndarray

    def gam_grid(self) -> jnp.ndarray:
        """Full (nmol, A, A) (ss|ss) grid for the dense nuclear term."""
        gxh = self.xh[..., 0, 0]
        top = jnp.concatenate([self.xx.rig[..., 0], gxh], axis=2)
        bot = jnp.concatenate([jnp.swapaxes(gxh, 1, 2), self.hh], axis=2)
        return jnp.concatenate([top, bot], axis=1)


def rotate_xh_block(u, ri4):
    """(mu nu | ss) molecular-frame 4x4 block from the 4 local integrals.

    The local matrix has the _core_matrix sparsity: [0,0]=(ss|ss),
    [0,1]=[1,0]=(so|ss), [1,1]=(oo|ss), [2,2]=[3,3]=(pp|ss)."""
    zero = jnp.zeros_like(ri4[..., 0])
    C = [[zero] * 4 for _ in range(4)]
    C[0][0] = ri4[..., 0]
    C[0][1] = ri4[..., 1]
    C[1][0] = ri4[..., 1]
    C[1][1] = ri4[..., 2]
    C[2][2] = ri4[..., 3]
    C[3][3] = ri4[..., 3]
    return _stack44(_rot_from_local(u, C))


def pair_w_xh(rij, xij, tore_i, tore_j, da, qa, rho0a, rho0b, rho1a, rho2a):
    """X-H pair segment pipeline: (wblk, e1b, e2a_ss).

    wblk (..., 4, 4) is the rotated (mu nu | ss) block — the only
    two-electron data an X-H pair has; e1b = -tore_j * wblk (electron on
    i, core of j); e2a_ss = -tore_i * (ss|ss) (the s-only lighter atom's
    single electron-core term; the reference's X-H class carries exactly
    4 + 1 core columns).
    """
    ri4 = local_frame_integrals_xh(rij, da, qa, rho0a, rho0b, rho1a, rho2a)
    U = frame_matrix(xij)
    wblk = rotate_xh_block(_u_rows(U), ri4)
    e1b = -tore_j[..., None, None] * wblk
    e2a_ss = -tore_i * ri4[..., 0]
    return wblk, e1b, e2a_ss


def two_center_integrals(rij, xij, tore_i, tore_j, da, db, qa, qb,
                         rho0a, rho0b, rho1a, rho1b, rho2a, rho2b):
    """Full pipeline: local integrals -> molecular frame.

    Returns (w (..., 4,4,4,4), e1b (..., 4,4), e2a (..., 4,4)):
    w[ab,cd] = (mu_a nu_b on i | la_c si_d on j);
    e1b = electron on i attracted by core of j; e2a the mirror.
    """
    ri, core_a, core_b = local_frame_integrals(
        rij, tore_i, tore_j, da, db, qa, qb,
        rho0a, rho0b, rho1a, rho1b, rho2a, rho2b)
    w = rotate_w(ri, xij)
    e1b = rotate_core(core_a, xij)
    e2a = rotate_core(core_b, xij)
    return w, e1b, e2a
