"""Extended-Lagrangian BOMD energy/force model (no SCF during dynamics).

Rebuild of EnergyXL / ForceXL (seqm/XLBOMD.py:54-220): a single Hcore
build + a single Fock build from the dynamic density field P, one density
purification D (SP2 or eigh, held constant under differentiation), and the
XL functional E(D, P) = Tr(D F) - 1/2 Tr((F - Hcore) P).
"""
from __future__ import annotations

from typing import Mapping, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import Constants
from ..ops.density import sp2, sym_eig
from ..ops.energy import (assemble_energies, elec_energy_isolated_atom,
                          elec_energy_xl, elec_energy_xl_tf,  # noqa: F401
                          heat_formation, pair_nuclear_energy, total_energy)
from ..ops.fock import fock
from ..ops.hcore import hcore
from ..ops.matrix import grid_to_mat
from ..system import make_system
from .energy import LearnedParams, SEQMConfig, _atom_parameters


class XLEnergyOutput(NamedTuple):
    Hf: jnp.ndarray
    Etot: jnp.ndarray
    Eelec: jnp.ndarray
    Enuc: jnp.ndarray
    Eiso_sum: jnp.ndarray
    EnucAB: jnp.ndarray
    D: jnp.ndarray


def energy_xl(
    const: Constants,
    tables: Mapping[str, jnp.ndarray],
    cfg: SEQMConfig,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    P: jnp.ndarray,
    learned: Optional[LearnedParams] = None,
    charges: Optional[jnp.ndarray] = None,
) -> XLEnergyOutput:
    """XL-BOMD energy terms given the dynamic density field P."""
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _energy_xl_impl(const, tables, cfg, species, coordinates, P,
                               learned, charges)


def _energy_xl_impl(const, tables, cfg, species, coordinates, P, learned,
                    charges):
    sys = make_system(const, species, coordinates, charges,
                      cfg.pair_outer_cutoff)
    p = _atom_parameters(tables, cfg.method, sys, learned, coordinates)
    Kbeta = p.pop("Kbeta", None)
    p.pop("g_ss_nuc", None)

    # remat: recompute integrals in the force backward pass instead of
    # storing intermediates (peak-HBM reduction on large batches).
    # Large molecules build the integrals dense (hcore_dense: the flat
    # path's per-pair gathers were 122 of 640 ms at 884 atoms) but run
    # the single differentiable Fock on the flat extraction — the dense
    # Fock *forward* is 5x cheaper (29 vs 153 ms) yet its
    # broadcast-contraction *backward* more than gives it back (measured
    # round 2: full force_xl flat 640 ms vs dense 833 ms).
    dense = cfg.dense_pair_grid
    if dense is None:
        dense = species.shape[1] >= 64
    if dense:
        from ..ops.hcore import hcore_dense
        from ..ops.tetci import from_grid

        def build(const, sys, p, Kbeta):
            return hcore_dense(const, sys, p, cfg.pair_outer_cutoff,
                               Kbeta, cfg.precise_overlap)
    else:
        def build(const, sys, p, Kbeta):
            return hcore(const, sys, p, Kbeta, False, cfg.precise_overlap)
    remat = cfg.remat_integrals
    if remat is None:
        remat = species.shape[1] >= 32
    hcore_fn = jax.checkpoint(build) if remat else build
    M, w = hcore_fn(const, sys, p, Kbeta)
    H = grid_to_mat(M)
    # dense integrals default to the dense scatter-free Fock: with the
    # grid built by broadcasting, its backward feeds cotangents straight
    # into hcore_dense (measured 884-atom force_xl: dense fock 614 ms vs
    # flat extraction 803 ms; round 2's opposite finding was an artifact
    # of the then-flat integral build).  dense_fock=False forces the flat
    # extraction.
    w_f = w if (not dense or cfg.dense_fock is not False) else \
        from_grid(w, sys.pair_i, sys.pair_j)
    F = fock(sys, P, M, w_f, p)

    # D is built once from F and treated as a constant (no_grad block,
    # XLBOMD.py:124-128)
    if cfg.scf.use_sp2:
        D = sp2(sys, jax.lax.stop_gradient(F), cfg.scf.sp2_eps,
                cfg.scf.sp2_precision, cfg.scf.sp2_dots,
                cfg.scf.sp2_tight_bounds)
        if cfg.scf.sp2_rescue > 0.0:
            from ..ops.density import eigh_rescue
            # the propagated field P tracks the physical state, so
            # ||D - P|| scores occupation flips the commutator cannot see
            D = eigh_rescue(sys, jax.lax.stop_gradient(F), D,
                            cfg.scf.sp2_rescue,
                            ref=jax.lax.stop_gradient(P))
    else:
        D = sym_eig(sys, jax.lax.stop_gradient(F))[1]
    D = jax.lax.stop_gradient(D)

    if hasattr(w, "rig"):
        # grid-resident gamma: keep the nuclear term gather-free too (the
        # flat gam gather's backward is a large TPU scatter at ~A^2/2
        # pairs — it dominated the 884-atom force step)
        from ..ops.energy import pair_nuclear_energy_dense
        EnucAB, enuc_mask = pair_nuclear_energy_dense(
            const, sys, w.rig[..., 0], cfg.method, p, cfg.pair_outer_cutoff)
    else:
        EnucAB = pair_nuclear_energy(const, sys, w.ri[..., 0], cfg.method, p)
        enuc_mask = None
    Eiso = elec_energy_isolated_atom(const, sys.species, p)
    # compensated assembly (see ops/xsum.py): Hf cancellation stays exact
    Hf, Etot, Eelec, Enuc, Eiso_sum = assemble_energies(
        const, sys, elec_energy_xl_tf(D, P, F, H), EnucAB, Eiso, cfg.hf_flag,
        pair_mask=enuc_mask)
    return XLEnergyOutput(Hf, Etot, Eelec, Enuc, Eiso_sum, EnucAB, D)


def force_xl(
    const: Constants,
    tables: Mapping[str, jnp.ndarray],
    cfg: SEQMConfig,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    P: jnp.ndarray,
    learned: Optional[LearnedParams] = None,
    charges: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(force, Hf, D): -dHf/dR through the single Fock build
    (cf. ForceXL, XLBOMD.py:189-220)."""

    def loss(coords):
        out = energy_xl(const, tables, cfg, species, coords, P, learned, charges)
        return jnp.sum(out.Hf), (out.Hf, out.D)

    grad, (Hf, D) = jax.grad(loss, has_aux=True)(coordinates)
    return -grad, Hf, D
