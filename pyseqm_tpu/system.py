"""Molecular system representation and geometry preprocessing.

TPU-native redesign of the reference ``Parser`` (seqm/basics.py:31-118).

The reference builds flat ragged index lists (real-atom list, pair list with
data-dependent lengths) which force dynamic shapes.  Here every tensor keeps
the static batch layout ``(nmol, A)`` for atoms and ``(nmol, NP)`` for pairs,
where ``NP = A*(A-1)/2`` enumerates the upper triangle of the atom grid with
*static* index arrays.  Invalid entries (padding atoms, pairs beyond the
cutoff) are masked, not removed — compute-all-and-mask is the XLA-friendly
equivalent of the reference's boolean fancy indexing.

Convention (same as reference, doc/documentation.md:152-163): atoms within a
molecule sorted by descending atomic number, zero padding at the end.  This
guarantees Z_i >= Z_j for every (i<j) pair, which the integral routines rely
on.  Use :func:`sort_species` to canonicalize host-side inputs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import tree_util

from .constants import Constants, LENGTH_CONVERSION_FACTOR


@functools.lru_cache(maxsize=None)
def pair_index(A: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static upper-triangle pair indices (i<j) for an A-atom molecule."""
    iu, ju = np.triu_indices(A, k=1)
    return iu.astype(np.int32), ju.astype(np.int32)


@functools.lru_cache(maxsize=None)
def pair_index_packed(A: int, K: int) -> Tuple[np.ndarray, np.ndarray]:
    """Class-segmented upper-triangle pair indices for heavy count K.

    With atoms sorted by descending Z and K = the *batch-wide max* heavy
    count, every atom slot >= K holds a hydrogen or padding in every
    molecule.  Enumerating the triangle as three contiguous segments

        XX:  i < j < K          (both possibly heavy; full integral class)
        XH:  i < K <= j         (j guaranteed s-only)
        HH:  K <= i < j         (both guaranteed s-only)

    gives *static* segment boundaries (K*(K-1)/2, K*(A-K), rest), letting
    the integral/Fock pipeline run the cheap 4- and 1-integral formulas of
    the reference's X-H / H-H pair classes (two_elec_two_center_int_local_
    frame.py:64-66) on statically-sliced segments — no gathers, no masks.
    Molecules with fewer than K heavies are still correct: the XX/XH
    formulas degrade analytically to the lighter classes when the heavier
    atom's multipole separations are zero (see ops/tetci.py docstring).
    """
    K = max(0, min(K, A))
    seg_i, seg_j = [], []
    for i in range(K):
        for j in range(i + 1, K):
            seg_i.append(i); seg_j.append(j)
    for i in range(K):
        for j in range(K, A):
            seg_i.append(i); seg_j.append(j)
    for i in range(K, A):
        for j in range(i + 1, A):
            seg_i.append(i); seg_j.append(j)
    return (np.asarray(seg_i, np.int32), np.asarray(seg_j, np.int32))


@functools.lru_cache(maxsize=None)
def pair_packed_from_canonical(A: int, K: int) -> np.ndarray:
    """Canonical-triu index of each packed pair position.

    User-facing per-pair arrays (the learned Kbeta hook) are specified in
    the canonical ``pair_index(A)`` row-major upper-triangle order
    regardless of the pair layout; gathering with this map reorders them
    to the class-segmented ``pair_index_packed(A, K)`` order the packed
    integral pipeline consumes (models/energy.py applies it centrally, so
    enabling ``pack_heavy``/``pack_pairs`` never silently changes the ML
    interface contract)."""
    iu, ju = pair_index_packed(A, K)
    i = iu.astype(np.int64)
    canon = i * (2 * A - i - 1) // 2 + (ju - iu - 1)
    return canon.astype(np.int32)


def pair_segment_sizes(A: int, K: int) -> Tuple[int, int, int]:
    """Static (n_xx, n_xh, n_hh) segment lengths of pair_index_packed."""
    K = max(0, min(K, A))
    n_xx = K * (K - 1) // 2
    n_xh = K * (A - K)
    n_hh = (A - K) * (A - K - 1) // 2
    return n_xx, n_xh, n_hh


@tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class System:
    """Batched molecular system with derived pair geometry (a pytree).

    Shapes: nmol = batch, A = molsize (padded), NP = A*(A-1)/2.
    All fields are traced arrays; build inside jit with :func:`make_system`
    so forces differentiate through ``rij``/``xij``.
    """

    species: jnp.ndarray        # (nmol, A) int32, 0 = padding
    coordinates: jnp.ndarray    # (nmol, A, 3) Angstrom
    charges: jnp.ndarray        # (nmol,) net molecular charge

    atom_mask: jnp.ndarray      # (nmol, A) bool: real atom
    heavy_mask: jnp.ndarray     # (nmol, A) bool: Z > 1
    nheavy: jnp.ndarray         # (nmol,) int32
    nhydro: jnp.ndarray         # (nmol,) int32
    nocc: jnp.ndarray           # (nmol,) int32 occupied MOs
    norb: jnp.ndarray           # (nmol,) int32 = 4*nheavy + nhydro

    # pair quantities on the static (i<j) triangle
    pair_i: jnp.ndarray         # (NP,) int32 static atom index i
    pair_j: jnp.ndarray         # (NP,) int32 static atom index j
    zi: jnp.ndarray             # (nmol, NP) int32 atomic number of atom i
    zj: jnp.ndarray             # (nmol, NP) int32
    pair_mask: jnp.ndarray      # (nmol, NP) bool: both real & inside cutoff
    rij: jnp.ndarray            # (nmol, NP) distance in Bohr (1 where masked)
    xij: jnp.ndarray            # (nmol, NP, 3) unit vector i->j

    @property
    def nmol(self) -> int:
        return self.species.shape[0]

    @property
    def molsize(self) -> int:
        return self.species.shape[1]

    @property
    def npairs(self) -> int:
        return self.pair_i.shape[0]


def sort_species(species: np.ndarray, coordinates: np.ndarray):
    """Host-side helper: sort atoms of each molecule by descending Z.

    Stable sort so equal-Z atoms keep their input order.  Returns sorted
    copies (numpy).
    """
    species = np.asarray(species)
    coordinates = np.asarray(coordinates)
    order = np.argsort(-species, axis=1, kind="stable")
    s = np.take_along_axis(species, order, axis=1)
    c = np.take_along_axis(coordinates, order[..., None], axis=1)
    return s, c


def validate(species: np.ndarray, charges: Optional[np.ndarray] = None,
             tore: Optional[np.ndarray] = None, allow_row3: bool = False,
             check_parity: bool = True):
    """Host-side checks mirroring the reference's runtime assertions.

    ``check_parity=False`` skips the closed-shell (even electron count)
    check — used when the net charges are traced values whose parity
    cannot be known at trace time."""
    from .constants import _QN, _TORE, MAX_Z

    species = np.asarray(species)
    if (species < 0).any() or (species > MAX_Z).any():
        raise ValueError("unsupported element: atomic numbers must be in [0, 18]")
    # Row-3 atoms (Na..Cl, principal quantum number 3) need the
    # generated-coefficient overlap path: SEQMConfig.row3=True (this
    # EXCEEDS the reference, which raises for any row-3 pair,
    # diat_overlap.py:71-72).  ``allow_row3`` mirrors that flag here so
    # plain configs still fail fast instead of producing all-zero
    # resonance blocks.  Argon (Z=18) has no parameters in any method.
    if (species == 18).any():
        raise ValueError("argon (Z=18) has no NDDO parameters")
    if (np.asarray(_QN)[species] > 2).any():
        bad = sorted(set(int(z) for z in species[np.asarray(_QN)[species] > 2]))
        if not allow_row3:
            raise ValueError(
                f"row-3 elements {bad} require SEQMConfig.row3=True "
                "(pass allow_row3=True to validate); the reference always "
                "raises here (diat_overlap.py:71-72)")
    if not (np.diff(species, axis=1) <= 0).all():
        raise ValueError("atoms must be sorted by descending atomic number "
                         "(use pyseqm_tpu.system.sort_species)")
    if not check_parity:
        return
    tore = np.asarray(_TORE) if tore is None else np.asarray(tore)
    n_charge = tore[species].sum(axis=1).astype(np.int64)
    if charges is not None:
        n_charge = n_charge - np.asarray(charges).astype(np.int64)
    if (n_charge % 2 == 1).any():
        raise ValueError("only closed-shell systems (even electron count) are supported")


def make_system(
    const: Constants,
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    charges: Optional[jnp.ndarray] = None,
    pair_outer_cutoff: float = 1.0e10,
    heavy_count: Optional[int] = None,
) -> System:
    """Build a :class:`System` (jit-safe; differentiable wrt coordinates).

    ``pair_outer_cutoff`` is in the units of ``coordinates`` (Angstrom),
    matching the reference's 'pair_outer_cutoff' setting (basics.py:96-98).

    ``heavy_count`` (STATIC, = pyseqm_tpu.packed_heavy_count(species))
    orders the pair list class-segmented (see :func:`pair_index_packed`)
    so the integral pipeline can run per-class formulas on static slices.
    Pair-indexed arrays (zi, rij, Kbeta hooks, EnucAB outputs...) follow
    that ordering; all consumers index through ``pair_i``/``pair_j``.
    """
    species = jnp.asarray(species, dtype=jnp.int32)
    nmol, A = species.shape
    dtype = coordinates.dtype
    if charges is None:
        charges = jnp.zeros((nmol,), dtype=jnp.int32)

    atom_mask = species > 0
    heavy_mask = species > 1
    nheavy = jnp.sum(heavy_mask, axis=1).astype(jnp.int32)
    nhydro = jnp.sum(species == 1, axis=1).astype(jnp.int32)
    norb = 4 * nheavy + nhydro
    n_charge = jnp.sum(const.tore[species], axis=1).astype(jnp.int32) - charges
    nocc = n_charge // 2

    if heavy_count is None:
        iu, ju = pair_index(A)
    else:
        iu, ju = pair_index_packed(A, int(heavy_count))
    iu = jnp.asarray(iu)
    ju = jnp.asarray(ju)
    zi = species[:, iu]
    zj = species[:, ju]

    dvec = coordinates[:, ju, :] - coordinates[:, iu, :]  # i -> j
    dist2 = jnp.sum(dvec * dvec, axis=-1)
    # guard duplicated-atom / padding zero distances (reference basics.py:93)
    dist2 = jnp.where(dist2 == 0.0, jnp.asarray(1.0e-4, dtype), dist2)
    dist = jnp.sqrt(dist2)
    pair_mask = (zi > 0) & (zj > 0) & (dist < pair_outer_cutoff)

    rij = dist * LENGTH_CONVERSION_FACTOR
    # keep masked rij finite & away from 0 so integral formulas stay safe
    rij = jnp.where(pair_mask, rij, jnp.asarray(1.0, dtype))
    xij = dvec / dist[..., None]
    xij = jnp.where(pair_mask[..., None], xij,
                    jnp.asarray([0.0, 0.0, 1.0], dtype))

    return System(
        species=species, coordinates=coordinates,
        charges=jnp.asarray(charges),
        atom_mask=atom_mask, heavy_mask=heavy_mask,
        nheavy=nheavy, nhydro=nhydro, nocc=nocc, norb=norb,
        pair_i=iu, pair_j=ju, zi=zi, zj=zj,
        pair_mask=pair_mask, rij=rij, xij=xij,
    )
