"""Energy terms: electronic, core-core, isolated-atom, heat of formation.

Rebuild of seqm/seqm_functions/energy.py:4-118.  Because pairs/atoms keep
the (nmol, ...) batch layout, the reference's index_add reductions over
molecule ids become plain axis sums.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..constants import A0, Constants
from ..system import System
from .accmath import exp as _exp
from .xsum import TwoFloat, csum, csum2, tf_add, tf_neg, tf_scale


def elec_energy(P, F, Hcore):
    """Eelec = 0.5 sum P o (Hcore + F); all matrices full-symmetric (eV)."""
    return 0.5 * jnp.sum(P * (Hcore + F), axis=(1, 2))


def elec_energy_tf(P, F, Hcore) -> TwoFloat:
    """Compensated Eelec (see xsum.py): the ~1000 eV trace-product is kept
    as an f32 (hi, lo) pair so heat_formation's cancellation is exact."""
    return tf_scale(csum2(P * (Hcore + F)), 0.5)


def elec_energy_xl(D, P, F, Hcore):
    """XL-BOMD functional E(D,P) = Tr(D F) - 0.5 Tr((F - Hcore) P).

    cf. seqm/XLBOMD.py:40-52.
    """
    return jnp.sum(D * F - 0.5 * (F - Hcore) * P, axis=(1, 2))


def elec_energy_xl_tf(D, P, F, Hcore) -> TwoFloat:
    return csum2(D * F - 0.5 * (F - Hcore) * P)


def elec_energy_isolated_atom(const: Constants, Z, p: Dict[str, jnp.ndarray]):
    """Ground-state electronic energy of each isolated atom (eV)."""
    return (p["U_ss"] * const.ussc[Z] + p["U_pp"] * const.uppc[Z]
            + p["g_ss"] * const.gssc[Z] + p["g_pp"] * const.gppc[Z]
            + p["g_sp"] * const.gspc[Z] + p["g_p2"] * const.gp2c[Z]
            + p["h_sp"] * const.hspc[Z])


def pair_nuclear_energy(const: Constants, sys: System, gam, method: str,
                        p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Core-core repulsion per pair (eV), masked; cf. energy.py:38-78.

    gam: (nmol, NP) = (s_i s_i | s_j s_j) two-center integral.
    """
    iu, ju = sys.pair_i, sys.pair_j
    rija = sys.rij * A0  # Angstrom
    tore_i = const.tore[sys.zi]
    tore_j = const.tore[sys.zj]
    alpha_i = p["alpha"][:, iu]
    alpha_j = p["alpha"][:, ju]

    t1 = tore_i * tore_j * gam
    # N-H / O-H special case: the i-side exponential gains a factor r
    xh = ((sys.zi == 7) | (sys.zi == 8)) & (sys.zj == 1)
    t2 = _exp(-alpha_i * rija) * jnp.where(xh, rija, 1.0)
    t3 = _exp(-alpha_j * rija)
    enuc = t1 * (1.0 + t2 + t3)

    if method != "MNDO":
        ng = {"AM1": 4, "PM3": 2}[method]
        K = jnp.stack([p[f"Gaussian{g+1}_K"] for g in range(ng)], axis=-1)
        L = jnp.stack([p[f"Gaussian{g+1}_L"] for g in range(ng)], axis=-1)
        Mg = jnp.stack([p[f"Gaussian{g+1}_M"] for g in range(ng)], axis=-1)
        r = rija[..., None]
        t5 = jnp.sum(K[:, iu] * _exp(-L[:, iu] * (r - Mg[:, iu]) ** 2), axis=-1)
        t6 = jnp.sum(K[:, ju] * _exp(-L[:, ju] * (r - Mg[:, ju]) ** 2), axis=-1)
        enuc = enuc + tore_i * tore_j / rija * (t5 + t6)

    return jnp.where(sys.pair_mask, enuc, 0.0)


def pair_nuclear_energy_dense(const: Constants, sys: System, gam_grid,
                              method: str, p: Dict[str, jnp.ndarray],
                              pair_outer_cutoff: float = 1.0e10,
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free core-core repulsion on the ordered (nmol, A, A) grid.

    The flat path gathers every per-atom parameter and the grid gamma at
    ~A^2/2 pairs; at 884 atoms those gathers' backward turns into large
    TPU scatters that dominated the XL force step.  Here everything is
    row/column broadcasting (cf. energy.py:38-78 for the physics), the
    upper triangle (i < j) selects each pair once, and — atoms being
    sorted by descending Z — the row atom is the heavier one, matching
    the flat path's (zi >= zj) convention exactly.

    gam_grid: (nmol, A, A) = WPackGrid.rig[..., 0].
    Returns (EnucAB_grid flattened to (nmol, A*A), matching flat mask).
    """
    from .hcore import dense_pair_geometry

    nmol, A = sys.species.shape
    dtype = sys.coordinates.dtype
    Z = sys.species

    # same geometry (and zero-distance guard) as hcore_dense — XLA CSEs
    # the shared subexpressions within one program
    _, rija, pm_full = dense_pair_geometry(sys, pair_outer_cutoff)
    idx = jnp.arange(A)
    tri = idx[:, None] < idx[None, :]
    pm = pm_full & tri[None]                     # each pair counted once
    rija = jnp.where(pm, rija, jnp.asarray(1.0, dtype))

    row = lambda v: v[:, :, None]                # noqa: E731
    col = lambda v: v[:, None, :]                # noqa: E731
    tore = const.tore[Z].astype(dtype)
    t1 = row(tore) * col(tore) * gam_grid
    xh = ((row(Z) == 7) | (row(Z) == 8)) & (col(Z) == 1)
    t2 = _exp(-row(p["alpha"]) * rija) * jnp.where(xh, rija, 1.0)
    t3 = _exp(-col(p["alpha"]) * rija)
    enuc = t1 * (1.0 + t2 + t3)

    if method != "MNDO":
        ng = {"AM1": 4, "PM3": 2}[method]
        K = jnp.stack([p[f"Gaussian{g+1}_K"] for g in range(ng)], axis=-1)
        L = jnp.stack([p[f"Gaussian{g+1}_L"] for g in range(ng)], axis=-1)
        Mg = jnp.stack([p[f"Gaussian{g+1}_M"] for g in range(ng)], axis=-1)
        r = rija[..., None]
        rw = lambda v: v[:, :, None, :]          # noqa: E731
        cl = lambda v: v[:, None, :, :]          # noqa: E731
        t5 = jnp.sum(rw(K) * _exp(-rw(L) * (r - rw(Mg)) ** 2), axis=-1)
        t6 = jnp.sum(cl(K) * _exp(-cl(L) * (r - cl(Mg)) ** 2), axis=-1)
        enuc = enuc + row(tore) * col(tore) / rija * (t5 + t6)

    enuc = jnp.where(pm, enuc, 0.0)
    return enuc.reshape(nmol, A * A), pm.reshape(nmol, A * A)


def total_energy(EnucAB, Eelec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    Enuc = jnp.sum(EnucAB, axis=-1)
    return Eelec + Enuc, Enuc


def heat_formation(const: Constants, sys: System, Etot, Eiso, hf_flag=True):
    """Hf = Etot - sum_A Eiso_A + sum_A dHf_A (eV); cf. energy.py:97-118."""
    m = sys.atom_mask
    Eiso_sum = jnp.sum(jnp.where(m, Eiso, 0.0), axis=-1)
    if hf_flag:
        eheat_sum = jnp.sum(jnp.where(m, const.eheat[sys.species], 0.0), axis=-1)
        return Etot - Eiso_sum + eheat_sum, Eiso_sum
    return Etot - Eiso_sum, Eiso_sum


def assemble_energies(const: Constants, sys: System, Eelec_tf: TwoFloat,
                      EnucAB, Eiso, hf_flag=True, pair_mask=None):
    """Hf / Etot / Enuc / Eiso_sum with every large accumulation and the
    Etot - Eiso cancellation carried as compensated f32 pairs (xsum.py).

    Hf is a ~2 eV difference of ~1e3 eV terms; assembling it through
    rounded f32 scalars costs ~1e-4 eV per rounding (the f32 quantum at
    1e3), which dominated the TPU-f32 error budget.  Returns plain arrays
    (the *outputs* are small or reported quantities; only the internal
    combination needs the extended precision).
    """
    m = sys.atom_mask
    if pair_mask is None:
        pair_mask = sys.pair_mask
    Enuc_tf = csum(jnp.where(pair_mask, EnucAB, 0.0))
    Eiso_tf = csum(jnp.where(m, Eiso, 0.0))
    Etot_tf = tf_add(Eelec_tf, Enuc_tf)
    Hf_tf = tf_add(Etot_tf, tf_neg(Eiso_tf))
    if hf_flag:
        eheat_tf = csum(jnp.where(m, const.eheat[sys.species], 0.0))
        Hf_tf = tf_add(Hf_tf, eheat_tf)
    return (Hf_tf.value(), Etot_tf.value(), Eelec_tf.value(),
            Enuc_tf.value(), Eiso_tf.value())
