"""Single-point energy / force models (the flagship API).

Functional rebuild of the reference Energy / Force modules
(seqm/basics.py:253-390): pure functions over (constants, parameter tables,
config, species, coordinates) that jit/vmap/grad/shard_map cleanly.

Outputs follow the reference contract: heat of formation Hf, total energy,
electronic & nuclear terms, per-pair core-core energies, orbital energies,
converged density, orbital charges and the per-molecule non-convergence
flag.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..constants import EV, Constants, make_constants
from ..ops.density import orbital_permutation, sym_eig
from ..ops.energy import (assemble_energies, elec_energy,  # noqa: F401
                          elec_energy_isolated_atom, elec_energy_tf,
                          heat_formation, pair_nuclear_energy, total_energy)
from ..ops.fock import fock
from ..ops.hcore import hcore
from ..ops.matrix import grid_to_mat
from ..parameters import load_element_tables
from ..scf import SCFConfig, scf_solve
from ..system import System, make_system


@dataclasses.dataclass(frozen=True)
class SEQMConfig:
    """Typed replacement for the reference's ``seqm_parameters`` dict +
    module-level globals (cf. doc/documentation.md:35-51, scf_loop.py:16-27)."""

    method: str = "AM1"
    scf: SCFConfig = dataclasses.field(default_factory=SCFConfig)
    hf_flag: bool = True            # Hf vs Etot - Eiso (basics.py:265-268)
    pair_outer_cutoff: float = 1.0e10
    eig: bool = False               # return orbital energies / charges
    # TPU MXU precision for f32 inputs.  The default bf16 matmuls destroy
    # SCF convergence (NaNs / 0.5 eV errors); "highest" runs full-f32
    # passes on the MXU and restores CPU-f32-level accuracy.
    matmul_precision: str = "highest"
    # grid-resident two-electron integrals (scatter-free Fock builds).
    # None = auto: on whenever the class-segmented packed layout is
    # available (scf.pack_heavy + pack_pairs — the fully-packed chain
    # beats the flat pair list at every measured size), and for large
    # molecules (A >= 64) regardless.
    dense_pair_grid: Optional[bool] = None
    # double-float STO overlap integrals on f32 (ops/overlap.py): matches
    # the reference's f64 A/B-integral numerics to ~1e-8 absolute; the
    # plain-f32 chain leaves ~1e-4-level Hcore error at strong-overlap
    # pairs (C=O).  No effect on f64 inputs.
    precise_overlap: bool = True
    # differentiable-Fock layout when integrals are grid-resident:
    # None = auto (dense scatter-free Fock, which wins once the integrals
    # are grid-built), False = flat extraction.
    dense_fock: Optional[bool] = None
    # jax.checkpoint the integral stack (recompute in backward instead of
    # storing intermediates).  None = auto: on for A >= 32.
    remat_integrals: Optional[bool] = None
    # STATIC: enable row-3 elements (Na..Cl, principal quantum number 3)
    # via the generated-coefficient overlap (ops/overlap_general.py).
    # EXCEEDS the reference, which raises for any row-3 pair
    # (diat_overlap.py:65-72) despite shipping Na..Cl parameter rows.
    # Works on every pair layout (flat, class-segmented, dense grid) —
    # row-3 atoms are heavy, so they ride the XX/XH segments.  Elements
    # without parameters in the method's table (e.g. Na/Mg in AM1:
    # all-zero CSV rows) remain unsupported — check the table first.
    row3: bool = False
    # class-segmented static pair packing (ops/hcore.py hcore_split): with
    # K = scf.pack_heavy, the pair list is enumerated XX | XH | HH so each
    # segment runs the reference's 22/4/1-integral pair-class formula on a
    # static slice (~7x less per-pair transcendental work on organic
    # batches).  None = auto: on for the flat path when scf.pack_heavy is
    # set.  Flat path only (the dense grid has its own block layout).
    pack_pairs: Optional[bool] = None


class EnergyOutput(NamedTuple):
    Hf: jnp.ndarray
    Etot: jnp.ndarray
    Eelec: jnp.ndarray
    Enuc: jnp.ndarray
    Eiso_sum: jnp.ndarray
    EnucAB: jnp.ndarray
    e: Optional[jnp.ndarray]
    P: jnp.ndarray
    charge: Optional[jnp.ndarray]
    notconverged: jnp.ndarray
    # Hamiltonian-level outputs (cf. Hamiltonian.forward returning
    # (F, e, P, Hcore, w, charge, notconverged), basics.py:216-249).
    # Unused outputs are DCE'd by XLA when energy() runs inside a larger
    # jit whose result drops them, so exposing these is free for MD loops.
    F: Optional[jnp.ndarray] = None         # Fock matrix, packed (nmol,4A,4A)
    Hcore: Optional[jnp.ndarray] = None     # core Hamiltonian, same layout
    w: Optional[Any] = None                 # two-electron integrals (WPack)


class HamiltonianOutput(NamedTuple):
    """The reference Hamiltonian module's return contract (basics.py:216-249)."""
    F: jnp.ndarray
    e: Optional[jnp.ndarray]
    P: jnp.ndarray
    Hcore: jnp.ndarray
    w: Any
    charge: Optional[jnp.ndarray]
    notconverged: jnp.ndarray


LearnedParams = Union[Mapping[str, jnp.ndarray],
                      Callable[[jnp.ndarray, jnp.ndarray], Mapping[str, jnp.ndarray]]]


def _atom_parameters(tables, method, sys: System,
                     learned: Optional[LearnedParams],
                     coordinates) -> Dict[str, jnp.ndarray]:
    from ..parameters import gather_atom_parameters

    if callable(learned):
        learned = learned(sys.species, coordinates)
    return gather_atom_parameters(tables, method, sys.species, learned)


def _orbital_charges(sys: System, v: jnp.ndarray) -> jnp.ndarray:
    """Per-MO atomic charge decomposition (cf. scf_loop.py:795-800).

    v: eigenvectors in the packed layout; returns (nmol, 4A, A) where
    charge[n, mo, atom] = sum of squared MO coefficients on that atom.
    """
    perm, _ = orbital_permutation(sys)
    atom_of_row = perm // 4                      # (nmol, 4A)
    v2 = v ** 2                                  # rows: packed orbitals
    A = sys.species.shape[1]
    onehot = jax.nn.one_hot(atom_of_row, A, dtype=v.dtype)  # (nmol, 4A, A)
    charge = jnp.einsum('nrl,nra->nla', v2, onehot)
    idx = jnp.arange(v.shape[-1])
    charge = jnp.where((idx[None, :] < sys.norb[:, None])[..., None], charge, 0.0)
    return charge


def _resolve_pair_layout(cfg: SEQMConfig, A: int):
    """(dense, packK): the integral layout decision, shared with
    make_system so the pair enumeration and the hcore builder agree."""
    pp = cfg.pack_pairs
    if pp is None:
        pp = cfg.scf.pack_heavy is not None
    if pp and cfg.scf.pack_heavy is None:
        raise ValueError("pack_pairs=True requires scf.pack_heavy "
                         "(= pyseqm_tpu.packed_heavy_count(species))")
    packK = cfg.scf.pack_heavy if pp else None
    dense = cfg.dense_pair_grid
    if dense is None:
        # class-segmented dense + pack_heavy enables the fully-packed
        # electronic chain (fock_packed_split / XL packed_io) — measured
        # faster than the flat pair list at EVERY size once packing is
        # on (headline 10240 x 8-atom: 76.3 -> 127.5 XL steps/s; the
        # scatter/relayout cost it deletes exceeds the ~2x dense-grid
        # integral FLOPs).  Without packing, dense only wins at large A.
        dense = A >= 64 or packK is not None
    return dense, packK


def _integral_stack(const, sys, p, Kbeta, cfg, packed_m=None):
    """Shared dense/flat integral plumbing for energy() and energy_xl().

    Returns (M, w, w_f): the Hcore grid, the two-electron integrals (flat
    WPack or grid-resident WPackGrid), and the integrals to feed the
    differentiable Fock build.

    ``packed_m`` (dense + pack_pairs only): build M directly as the
    static packed MATRIX of that size (hcore_dense_split packed_m) for
    the fully-packed Fock path (ops/fock.py fock_packed_split).

    Large molecules (A >= 64, or cfg.dense_pair_grid) build the integrals
    dense (ops/hcore.py hcore_dense: the flat path's per-pair gathers were
    122 of 640 ms at 884 atoms) and default to the dense scatter-free
    Fock: with the grid built by broadcasting, its backward feeds
    cotangents straight into hcore_dense (measured 884-atom force_xl:
    dense fock 614 ms vs flat extraction 803 ms; round 2's opposite
    finding was an artifact of the then-flat integral build).
    cfg.dense_fock=False forces the flat extraction.

    cfg.remat_integrals (auto at A >= 32) recomputes the integrals in the
    force backward pass instead of storing every intermediate — cuts peak
    HBM by an order of magnitude; small batches skip it (the recompute
    adds a full hcore forward, ~5 ms at 10k molecules, per force eval).
    """
    A = sys.species.shape[1]
    dense, packK = _resolve_pair_layout(cfg, A)
    if Kbeta is not None and packK is not None:
        # the ML interface specifies Kbeta in canonical pair_index(A)
        # order; the packed pipeline enumerates pairs class-segmented
        from ..system import pair_packed_from_canonical
        Kbeta = Kbeta[:, jnp.asarray(pair_packed_from_canonical(A, packK))]
    if packed_m is not None and not (dense and packK is not None):
        raise ValueError("packed_m requires the dense class-segmented "
                         "path (dense_pair_grid + pack_pairs)")
    if dense and packK is not None:
        from ..ops.hcore import hcore_dense_split

        def build(const, sys, p, Kbeta):
            return hcore_dense_split(const, sys, p, packK,
                                     cfg.pair_outer_cutoff, Kbeta,
                                     cfg.precise_overlap,
                                     row3=cfg.row3,
                                     packed_m=packed_m)
    elif dense:
        from ..ops.hcore import hcore_dense

        def build(const, sys, p, Kbeta):
            return hcore_dense(const, sys, p, cfg.pair_outer_cutoff,
                               Kbeta, cfg.precise_overlap, row3=cfg.row3)
    elif packK is not None:
        from ..ops.hcore import hcore_split

        def build(const, sys, p, Kbeta):
            return hcore_split(const, sys, p, packK, Kbeta,
                               cfg.precise_overlap, row3=cfg.row3)
    else:
        def build(const, sys, p, Kbeta):
            return hcore(const, sys, p, Kbeta, False, cfg.precise_overlap,
                         row3=cfg.row3)
    remat = cfg.remat_integrals
    if remat is None:
        remat = A >= 32
    hcore_fn = jax.checkpoint(build) if remat else build
    M, w = hcore_fn(const, sys, p, Kbeta)
    if dense and cfg.dense_fock is False:
        if not hasattr(w, "rig"):
            raise ValueError(
                "dense_fock=False (flat extraction) is not supported with "
                "class-segmented dense integrals (pack_pairs + pack_heavy "
                "on the dense path); set pack_pairs=False to force it.")
        from ..ops.tetci import from_grid
        w_f = from_grid(w, sys.pair_i, sys.pair_j)
    else:
        w_f = w
    return M, w, w_f


def _nuclear_term(const, sys, w, cfg, p, gam=None):
    """(EnucAB, pair_mask-or-None) for assemble_energies.

    Grid-resident integrals keep the core-core term gather-free too (the
    flat gam gather's backward is a large TPU scatter at ~A^2/2 pairs —
    it dominated the 884-atom force step).  ``gam`` overrides the
    integral-derived gamma (the ML g_ss_nuc hook)."""
    if gam is None and hasattr(w, "gam_grid"):
        from ..ops.energy import pair_nuclear_energy_dense
        return pair_nuclear_energy_dense(const, sys, w.gam_grid(),
                                         cfg.method, p,
                                         cfg.pair_outer_cutoff)
    if gam is None and hasattr(w, "rig"):
        from ..ops.energy import pair_nuclear_energy_dense
        return pair_nuclear_energy_dense(const, sys, w.rig[..., 0],
                                         cfg.method, p,
                                         cfg.pair_outer_cutoff)
    if gam is None:
        gam = w.gam() if hasattr(w, "gam") else w.ri[..., 0]  # (ss|ss)
    return pair_nuclear_energy(const, sys, gam, cfg.method, p), None


def check_species(cfg: SEQMConfig, tables, species,
                  charges=None) -> None:
    """Host-side species/config cross-checks (no-op under jit tracing).

    Runs the reference Parser's runtime assertions (basics.py:43-118 via
    system.validate: element range, descending-Z sort, closed shell) plus
    two checks the split row-3 switches made necessary: a batch containing
    row-3 atoms (Na..Cl) with ``cfg.row3=False``, or an element whose
    parameter row is all zero for the chosen method (e.g. AM1 Na/Mg),
    would otherwise silently produce zero overlap/resonance blocks and
    wrong energies.
    """
    import numpy as np
    if isinstance(species, jax.core.Tracer):
        return  # inside jit: shapes only, values unavailable
    charges_known = not isinstance(charges, jax.core.Tracer)
    zs = tables.get("zeta_s")
    if isinstance(zs, jax.core.Tracer):
        zs = None
    try:
        # device->host transfers: advisory checks must not take the
        # process down on a remote-backend hiccup (the axon tunnel
        # returned INTERNAL mid-battery on exactly this transfer)
        sp = np.asarray(species)
        ch = np.asarray(charges) if (charges_known
                                     and charges is not None) else None
        zs = np.asarray(zs) if zs is not None else None
    except Exception:
        return
    from ..system import validate
    validate(sp, ch, allow_row3=cfg.row3, check_parity=charges_known)
    present = np.unique(sp[sp > 0])
    if present.size == 0 or zs is None:
        return
    zrow = zs[present]
    if (zrow == 0).any():
        bad = sorted(int(z) for z in present[zrow == 0])
        raise ValueError(
            f"elements Z={bad} have no {cfg.method} parameters "
            "(all-zero rows in the published table) — energies would "
            "be silently wrong")


def energy(
    const: Constants,
    tables: Mapping[str, jnp.ndarray],
    cfg: SEQMConfig,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    learned: Optional[LearnedParams] = None,
    P0: Optional[jnp.ndarray] = None,
    charges: Optional[jnp.ndarray] = None,
) -> EnergyOutput:
    """Single-point SCF energy for a batch of molecules.

    Mirrors Energy.forward (basics.py:271-346) with all_terms=True.
    """
    check_species(cfg, tables, species, charges)
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _energy_impl(const, tables, cfg, species, coordinates,
                            learned, P0, charges)


def _energy_impl(const, tables, cfg, species, coordinates, learned, P0,
                 charges):
    A = species.shape[1]
    dense, packK = _resolve_pair_layout(cfg, A)
    sys = make_system(const, species, coordinates, charges,
                      cfg.pair_outer_cutoff, heavy_count=packK)
    p = _atom_parameters(tables, cfg.method, sys, learned, coordinates)
    Kbeta = p.pop("Kbeta", None)
    g_ss_nuc = p.pop("g_ss_nuc", None)

    # fully-packed SCF (class-segmented dense integrals): the entire
    # fixed point — Fock builds, density solves, DIIS buffers — runs at
    # the static packed size with zero per-iteration relayouts (the flat
    # loop pays a (nmol,4A,4A) <-> block-grid roundtrip per Fock plus a
    # pack/unpack per density solve; see scf.py scf_solve packed).
    packed = None
    if dense and packK is not None:
        from ..ops.density import packed_solver_size
        n_st = packed_solver_size(packK, A)
        if n_st is not None:
            packed = (packK, n_st)
    if packed is not None:
        from ..ops.density import static_unpack_mat
        from ..ops.fock import fock_packed_split
        M, w, _ = _integral_stack(const, sys, p, Kbeta, cfg,
                                  packed_m=packed[1])
        Pp, notconverged = scf_solve(const, sys, M, w, p, cfg.scf, P0,
                                     packed=packed)
        Fp = fock_packed_split(sys, Pp, M, w, p, packed[0], packed[1])
        eel_tf = elec_energy_tf(Pp, Fp, M)
        P = static_unpack_mat(Pp, packed[0], A)
        F = static_unpack_mat(Fp, packed[0], A)
        H = static_unpack_mat(M, packed[0], A)
    else:
        M, w, w_f = _integral_stack(const, sys, p, Kbeta, cfg)
        P, notconverged = scf_solve(const, sys, M, w, p, cfg.scf, P0)
        F = fock(sys, P, M, w_f, p)
        H = grid_to_mat(M)
        eel_tf = elec_energy_tf(P, F, H)

    gam = None
    if g_ss_nuc is not None:
        # ML override of the nuclear gamma (basics.py:321-327); sanitize
        # padding lanes (g_ss = 0 there) before dividing so grads stay finite
        ga = g_ss_nuc[:, sys.pair_i]
        gb = g_ss_nuc[:, sys.pair_j]
        pm = sys.pair_mask
        r0a = 0.5 * EV / jnp.where(pm, ga, 1.0)
        r0b = 0.5 * EV / jnp.where(pm, gb, 1.0)
        gam = jnp.where(pm, EV / jnp.sqrt(sys.rij ** 2 + (r0a + r0b) ** 2), 0.0)
    EnucAB, enuc_mask = _nuclear_term(const, sys, w, cfg, p, gam)
    Eiso = elec_energy_isolated_atom(const, sys.species, p)
    # compensated assembly: Hf is a ~2 eV difference of ~1e3 eV terms
    Hf, Etot, Eel, Enuc, Eiso_sum = assemble_energies(
        const, sys, eel_tf, EnucAB, Eiso, cfg.hf_flag,
        pair_mask=enuc_mask)

    e = charge = None
    if cfg.eig:
        # with_flag surfaces a silently-unconverged Jacobi panel (rescued
        # to exact eigh inside sym_eig) in notconverged, mirroring the
        # SCF convergence flag (reference scf_loop.py:753-762)
        e, v, eig_failed = sym_eig(sys, F, eig_only=True, with_flag=True)
        charge = _orbital_charges(sys, v)
        notconverged = notconverged | eig_failed
    return EnergyOutput(Hf, Etot, Eel, Enuc, Eiso_sum, EnucAB, e, P, charge,
                        notconverged, F=F, Hcore=H, w=w)


def hamiltonian(
    const: Constants,
    tables: Mapping[str, jnp.ndarray],
    cfg: SEQMConfig,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    learned: Optional[LearnedParams] = None,
    P0: Optional[jnp.ndarray] = None,
    charges: Optional[jnp.ndarray] = None,
) -> HamiltonianOutput:
    """SCF-converged Hamiltonian-level quantities (no energy assembly):
    (F, e, P, Hcore, w, charge, notconverged), matching the reference
    Hamiltonian.forward (basics.py:216-249)."""
    out = energy(const, tables, cfg, species, coordinates, learned, P0,
                 charges)
    return HamiltonianOutput(out.F, out.e, out.P, out.Hcore, out.w,
                             out.charge, out.notconverged)


def force(
    const: Constants,
    tables: Mapping[str, jnp.ndarray],
    cfg: SEQMConfig,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    learned: Optional[LearnedParams] = None,
    P0: Optional[jnp.ndarray] = None,
    charges: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, EnergyOutput]:
    """Forces -dHf/dR (eV/Angstrom) + energy terms (cf. Force, basics.py:348)."""

    def loss(coords):
        out = energy(const, tables, cfg, species, coords, learned, P0, charges)
        return jnp.sum(out.Hf), out

    grad, out = jax.grad(loss, has_aux=True)(coordinates)
    return -grad, out


def build(method: str = "AM1", dtype=jnp.float32, **cfg_kwargs):
    """Convenience constructor: (const, tables, cfg)."""
    const = make_constants(dtype=dtype)
    tables = load_element_tables(method, dtype=dtype)
    cfg = SEQMConfig(method=method, **cfg_kwargs)
    return const, tables, cfg
