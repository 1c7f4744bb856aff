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
                          heat_formation, total_energy)
from ..ops.fock import fock
from ..ops.matrix import grid_to_mat
from ..system import make_system
from .energy import (LearnedParams, SEQMConfig, _atom_parameters,
                     _integral_stack, _nuclear_term)


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
    packed_io: bool = False,
    panel_field: bool = False,
) -> XLEnergyOutput:
    """XL-BOMD energy terms given the dynamic density field P.

    ``packed_io``: P is in the static packed layout
    (density.packed_solver_size) and the returned D stays packed — the
    whole electronic chain (Hcore assembly, Fock build, purification,
    Tr contractions) runs packed with zero full-grid relayouts.
    Requires the dense class-segmented path (A >= 64 + pack_heavy); see
    ops/fock.py fock_packed_split for the measured motivation.

    ``panel_field`` (implies packed_io, SP2 kernel path): P arrives AND
    the returned D stays in the SP2 kernel's (G, K*n, TILE) panel layout
    (ops/sp2_pallas.panel_pack) — the kernel-output transpose disappears;
    the one relayout left is P panel->matrix at the Fock entry, which XLA
    can fuse into the Fock build's reads.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _energy_xl_impl(const, tables, cfg, species, coordinates, P,
                               learned, charges, packed_io, panel_field)


def _energy_xl_impl(const, tables, cfg, species, coordinates, P, learned,
                    charges, packed_io=False, panel_field=False):
    from .energy import _resolve_pair_layout
    dense, packK = _resolve_pair_layout(cfg, species.shape[1])
    sys = make_system(const, species, coordinates, charges,
                      cfg.pair_outer_cutoff, heavy_count=packK)
    p = _atom_parameters(tables, cfg.method, sys, learned, coordinates)
    Kbeta = p.pop("Kbeta", None)
    p.pop("g_ss_nuc", None)

    if packed_io or panel_field:
        from ..ops.density import packed_solver_size, static_unpack_mat
        from ..ops.fock import fock_packed_split
        A = species.shape[1]
        if not (dense and packK is not None):
            raise ValueError("packed_io requires the dense class-"
                             "segmented path (A >= 64 + scf.pack_heavy)")
        n_st = packed_solver_size(packK, A)
        if panel_field:
            from ..ops import sp2_pallas
            if not cfg.scf.use_sp2:
                raise ValueError("panel_field requires use_sp2 (the panel "
                                 "layout is the SP2 kernel's)")
            if n_st is None:
                raise ValueError("panel_field requires a packed solver size")
            # dynamic field arrives in panel layout; the Fock build needs
            # matrices — one relayout, fusible into the Fock reads
            P = sp2_pallas.panel_unpack(P, species.shape[0], n_st)
        if n_st is None or P.shape[-1] != n_st:
            raise ValueError(
                f"packed_io P has n={P.shape[-1]}, expected "
                f"packed_solver_size={n_st}")
        M, w, _ = _integral_stack(const, sys, p, Kbeta, cfg, packed_m=n_st)
        H = M                                   # packed core Hamiltonian
        F = fock_packed_split(sys, P, M, w, p, packK, n_st)
        if cfg.scf.use_sp2:
            D = sp2(sys, jax.lax.stop_gradient(F), cfg.scf.sp2_eps,
                    cfg.scf.sp2_precision, cfg.scf.sp2_dots,
                    cfg.scf.sp2_tight_bounds, pack_heavy=packK,
                    prepacked=True, panel_out=panel_field)
        else:
            from ..ops.density import static_pack_mat
            Fu = static_unpack_mat(jax.lax.stop_gradient(F), packK, A)
            Du = sym_eig(sys, Fu, pack_n=cfg.scf.pack_orbitals,
                         pack_heavy=packK)[1]
            D = static_pack_mat(Du, packK, n_st)
        D = jax.lax.stop_gradient(D)
    else:
        # shared dense/flat + remat plumbing with energy() — see
        # models/energy.py _integral_stack for the measured trade-offs
        M, w, w_f = _integral_stack(const, sys, p, Kbeta, cfg)
        H = grid_to_mat(M)
        F = fock(sys, P, M, w_f, p)

        # D is built once from F and treated as a constant (no_grad block,
        # XLBOMD.py:124-128)
        if cfg.scf.use_sp2:
            D = sp2(sys, jax.lax.stop_gradient(F), cfg.scf.sp2_eps,
                    cfg.scf.sp2_precision, cfg.scf.sp2_dots,
                    cfg.scf.sp2_tight_bounds, pack_n=cfg.scf.pack_orbitals,
                    pack_heavy=cfg.scf.pack_heavy)
            if cfg.scf.sp2_rescue > 0.0:
                from ..ops.density import eigh_rescue
                # the propagated field P tracks the physical state, so
                # ||D - P|| scores occupation flips the commutator cannot
                # see
                D = eigh_rescue(sys, jax.lax.stop_gradient(F), D,
                                cfg.scf.sp2_rescue,
                                ref=jax.lax.stop_gradient(P))
        else:
            D = sym_eig(sys, jax.lax.stop_gradient(F),
                        pack_n=cfg.scf.pack_orbitals,
                        pack_heavy=cfg.scf.pack_heavy)[1]
        D = jax.lax.stop_gradient(D)

    EnucAB, enuc_mask = _nuclear_term(const, sys, w, cfg, p)
    Eiso = elec_energy_isolated_atom(const, sys.species, p)
    if panel_field:
        # Tr readouts need the matrix view; the unpack is a lazy jnp
        # relayout XLA fuses into the trace reduction's reads — D itself
        # stays panel-resident in the returned state
        from ..ops import sp2_pallas
        D_tr = sp2_pallas.panel_unpack(D, species.shape[0], F.shape[-1])
    else:
        D_tr = D
    # compensated assembly (see ops/xsum.py): Hf cancellation stays exact
    Hf, Etot, Eelec, Enuc, Eiso_sum = assemble_energies(
        const, sys, elec_energy_xl_tf(D_tr, P, F, H), EnucAB, Eiso,
        cfg.hf_flag, pair_mask=enuc_mask)
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
    packed_io: bool = False,
    panel_field: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(force, Hf, D): -dHf/dR through the single Fock build
    (cf. ForceXL, XLBOMD.py:189-220).  ``packed_io``/``panel_field``:
    see energy_xl."""

    def loss(coords):
        out = energy_xl(const, tables, cfg, species, coords, P, learned,
                        charges, packed_io, panel_field)
        return jnp.sum(out.Hf), (out.Hf, out.D)

    grad, (Hf, D) = jax.grad(loss, has_aux=True)(coordinates)
    return -grad, Hf, D
