"""Density-matrix construction: batched eigendecomposition and SP2.

Rebuild of seqm/seqm_functions/diag.py + SP2.py + pack.py with one central
design change: the reference's pack/unpack (which *resizes* matrices by
stripping hydrogen p-rows with per-molecule Python loops, pack.py:23-41)
becomes a per-molecule *orbital permutation* at fixed size 4A — valid
orbitals (heavy: s,px,py,pz; H: s) are moved to the front with a stable
argsort, padding stays at the back and its diagonal is filled with
Gershgorin-spaced large values (diag.py:111-139) so one batched eigh /
SP2 handles the whole batch.  Everything is static-shape and batched; no
per-molecule loops anywhere.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..system import System

SP2_MAX_ITER = 200
# experiment hook: force the XLA-SP2 while-chunk length (None = size-based)
SP2_CHUNK_OVERRIDE = None


def orbital_mask(sys: System) -> jnp.ndarray:
    """(nmol, 4A) bool: which orbital rows are physical."""
    per_atom = jnp.stack(
        [sys.atom_mask, sys.heavy_mask, sys.heavy_mask, sys.heavy_mask],
        axis=-1)  # (nmol, A, 4)
    return per_atom.reshape(sys.species.shape[0], -1)


def orbital_permutation(sys: System) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable permutation packing valid orbitals first; plus its inverse."""
    valid = orbital_mask(sys)
    perm = jnp.argsort(~valid, axis=-1, stable=True)
    inv = jnp.argsort(perm, axis=-1)
    return perm, inv


def permute_mat(X, perm):
    X = jnp.take_along_axis(X, perm[:, :, None], axis=1)
    return jnp.take_along_axis(X, perm[:, None, :], axis=2)


def _gershgorin(Xp):
    aii = jnp.diagonal(Xp, axis1=-2, axis2=-1)
    ri = jnp.sum(jnp.abs(Xp), axis=-1) - jnp.abs(aii)
    h1 = jnp.min(aii - ri, axis=-1)
    hN = jnp.max(aii + ri, axis=-1)
    return h1, hN


def _fill_padding_diag(Xp, norb, h1, hN, dx=0.005):
    """Distinct large diagonal values on padding rows (cf. diag.py:120-130).

    Spacing keeps padding eigenvalues non-degenerate so eigh stays
    differentiable.
    """
    n = Xp.shape[-1]
    idx = jnp.arange(n)
    pad = idx[None, :] >= norb[:, None]
    k = idx[None, :] - norb[:, None] + 1  # 1-based padding position
    dE = hN - h1
    val = (1.0 + dx * k.astype(Xp.dtype)) * dE[:, None] + hN[:, None]
    diag = jnp.where(pad, val, jnp.diagonal(Xp, axis1=-2, axis2=-1))
    return Xp.at[:, idx, idx].set(diag)


def _occupations(e, nocc, dtype, check_degeneracy):
    """Per-orbital occupation coefficients (0/1, or fractional across a
    degenerate Fermi level when check_degeneracy — cf. construct_P,
    diag.py:79-98, fully batched)."""
    n = e.shape[-1]
    idx = jnp.arange(n)
    if not check_degeneracy:
        return (idx[None, :] < nocc[:, None]).astype(dtype)
    atol = 1.0e-7 if dtype == jnp.float32 else 1.0e-14
    e_homo = jnp.take_along_axis(e, (nocc - 1)[:, None], axis=1)
    cond = jnp.abs(e - e_homo) <= atol
    idx1 = jnp.argmax(cond, axis=1)                      # first degenerate
    idx2 = n - jnp.argmax(cond[:, ::-1], axis=1)         # last + 1
    frac = (nocc - idx1).astype(dtype) / (idx2 - idx1).astype(dtype)
    occ = jnp.where(idx[None, :] < idx1[:, None], 1.0,
                    jnp.where(idx[None, :] < idx2[:, None],
                              frac[:, None], 0.0))
    return occ.astype(dtype)


def packed_orbital_size(species, multiple: int = 128) -> int:
    """STATIC compact-orbital size for SCFConfig.pack_orbitals.

    ``species`` must be a concrete array (outside jit).  Returns
    ceil(max_molecule norb / multiple) * multiple, clamped to 4A — the
    smallest MXU-tile-aligned size that holds every molecule's physical
    orbitals (hydrogens contribute 1, heavies 4).  At 884 atoms /
    1766 orbitals this is 1792 vs the 3536 full layout: ~8x fewer
    eigh/SP2 FLOPs.
    """
    import numpy as np
    sp = np.asarray(species)
    norb_max = int((4 * (sp > 1).sum(axis=-1) + (sp == 1).sum(axis=-1)).max())
    n_full = 4 * sp.shape[-1]
    return int(min(n_full, -(-norb_max // multiple) * multiple))


def packed_heavy_count(species) -> int:
    """STATIC max heavy-atom count for SCFConfig.pack_heavy.

    ``species`` must be concrete (outside jit).  Returns the largest
    per-molecule heavy-atom count K; the static packed layout keeps the
    full 4-orbital block for the first K atom slots and only the
    s-orbital for the rest, which is valid because atoms are sorted by
    descending atomic number (system.py), so every atom at position >= K
    is hydrogen or padding in every molecule.  Validated here.
    """
    import numpy as np
    sp = np.asarray(species)
    K = int((sp > 1).sum(axis=-1).max())
    if not (sp[..., K:] <= 1).all():
        raise ValueError(
            "static orbital packing requires atoms sorted by descending "
            "atomic number (heavy atoms first in every molecule)")
    return K


def static_pack_size(K: int, A: int, multiple: int = 16) -> int:
    """Packed size of the static layout: 4K heavy-block orbitals plus one
    s-orbital per remaining atom slot, rounded up to an MXU-friendly
    multiple, clamped to the full 4A."""
    return int(min(4 * A, -(-(3 * K + A) // multiple) * multiple))


def packed_solver_size(K: int, A: int) -> Optional[int]:
    """The static packed size the density solvers actually run at: 16-
    aligned inside the SP2 kernel's n <= 128 range, 128-aligned (full MXU
    tiles) beyond it, None when packing cannot shrink 4A.  Every producer
    of pre-packed solver inputs (fock_packed_split, the XL driver's
    packed electronic state) must use THIS rule so layouts agree with
    sp2/sym_eig."""
    n_st = static_pack_size(K, A, multiple=16)
    if n_st > 128:
        n_st = static_pack_size(K, A, multiple=128)
    return None if n_st >= 4 * A else n_st


def _static_pack_rows(X, K: int, n_st: int):
    """(B, 4A, c) -> (B, n_st, c): keep rows [0, 4K), then the s-row of
    every later atom (pure slice/reshape/concat — no gathers; cf. the
    take_along_axis permutation, measured 18 ms at (10240, 32, 32))."""
    B, r, c = X.shape
    A = r // 4
    hs = X.reshape(B, A, 4, c)[:, K:, 0, :]
    rows = jnp.concatenate([X[:, :4 * K], hs], axis=1)
    if n_st > rows.shape[1]:
        rows = jnp.pad(rows, ((0, 0), (0, n_st - rows.shape[1]), (0, 0)))
    return rows


def static_pack_mat(X, K: int, n_st: int):
    """(B, 4A, 4A) -> (B, n_st, n_st) static compact layout."""
    Xp = _static_pack_rows(X, K, n_st)
    Xp = _static_pack_rows(jnp.swapaxes(Xp, 1, 2), K, n_st)
    return jnp.swapaxes(Xp, 1, 2)


def static_pack_vec(v, K: int, n_st: int):
    """(B, 4A) -> (B, n_st)."""
    return _static_pack_rows(v[:, :, None], K, n_st)[:, :, 0]


def _static_unpack_rows(Xp, K: int, A: int):
    """(B, n_st, c) -> (B, 4A, c): re-expand the s-only tail with zero
    p-rows (stack + reshape — no scatters)."""
    B, _, c = Xp.shape
    heavy = Xp[:, :4 * K]
    hs = Xp[:, 4 * K:4 * K + (A - K)]
    z = jnp.zeros((B, A - K, 3, c), Xp.dtype)
    hyd = jnp.concatenate([hs[:, :, None, :], z], axis=2)
    return jnp.concatenate([heavy, hyd.reshape(B, 4 * (A - K), c)], axis=1)


def static_unpack_mat(Xp, K: int, A: int):
    """(B, n_st, n_st) -> (B, 4A, 4A), zeros on the dropped p rows/cols."""
    X = _static_unpack_rows(Xp, K, A)
    X = _static_unpack_rows(jnp.swapaxes(X, 1, 2), K, A)
    return jnp.swapaxes(X, 1, 2)


def _pack_slice(Fp, pack_n):
    """Slice the valid-orbitals-first permuted matrix to the static
    compact size.  Rows >= pack_n are pure decoupled padding (zero
    off-diagonals), so dropping them leaves the retained spectrum
    unchanged."""
    return Fp[:, :pack_n, :pack_n]


def _unpack_embed(Pp, n):
    """Embed a compact (nmol, pack_n, pack_n) block back into (nmol, n, n)."""
    nmol, np_, _ = Pp.shape
    if np_ == n:
        return Pp
    return jnp.zeros((nmol, n, n), Pp.dtype).at[:, :np_, :np_].set(Pp)


def rescue_unconverged_panels(Fp, e0, v, resid):
    """Re-solve Jacobi panels that hit MAX_SWEEPS with exact eigh.

    ``resid`` is eigh_batched_checked's per-molecule final-sweep residual;
    resid > OFF_TOL marks a silently unconverged panel.  The exact branch
    runs only when at least one molecule failed (lax.cond), so the common
    case costs one reduction; the rescue itself is the full batched
    jnp.linalg.eigh with a per-molecule select.  Returns
    (e, v, failed_mask) — callers surface failed_mask like the SCF
    notconverged flag (cf. reference diag.py:102-139, whose eigh is
    always exact).
    """
    from . import eigh_pallas
    bad = resid > eigh_pallas.OFF_TOL

    def exact(ops):
        Fp_, e_, v_, bad_ = ops
        ex, vx = jnp.linalg.eigh(Fp_)
        e_ = jnp.where(bad_[:, None], ex.astype(e_.dtype), e_)
        v_ = jnp.where(bad_[:, None, None], vx.astype(v_.dtype), v_)
        return e_, v_

    def keep(ops):
        _, e_, v_, _ = ops
        return e_, v_

    e0, v = jax.lax.cond(jnp.any(bad), exact, keep, (Fp, e0, v, bad))
    return e0, v, bad


def sym_eig(sys: System, F: jnp.ndarray, eig_only: bool = False,
            check_degeneracy: bool = False, pack_n: int = None,
            pack_heavy: int = None, prepacked: bool = False,
            with_flag: bool = False):
    """Batched eigendecomposition of the Fock matrix.

    Returns (e, P, v): orbital energies (nmol, 4A) zero-padded after norb,
    density P = 2 V_occ V_occ^T in the original orbital layout, and the
    eigenvectors v in the *packed* layout — permuted valid-first rows
    (compact pack_n rows/cols when pack_n is set), or the static compact
    layout when pack_heavy is set (gather-free; see static_pack_mat).
    Density-only callers use P; v consumers must not set pack_heavy.

    ``prepacked``: F is ALREADY in the static packed layout at
    packed_solver_size(pack_heavy, A) (e.g. from fock_packed_split);
    the returned P (and e, at length n_st) stays packed — no relayouts
    at either boundary (the packed SCF loop's eigh path).
    """
    # materialize F once: the prep consumes it several times (permute,
    # Gershgorin, padding fill) and XLA otherwise re-fuses the producer
    # chain (hcore+fock) into each consumer — measured +10 ms at
    # (10240, 32, 32) on the SP2 side of the same boundary
    F = jax.lax.optimization_barrier(F)
    n = F.shape[-1]
    A = sys.species.shape[1]
    n_st = None
    if prepacked:
        if pack_heavy is None:
            raise ValueError("prepacked=True requires pack_heavy")
        n_st = packed_solver_size(pack_heavy, A)
        if n_st is None or n != n_st:
            raise ValueError(
                f"prepacked F has n={n}, expected "
                f"packed_solver_size={packed_solver_size(pack_heavy, A)}")
    elif pack_heavy is not None:
        n_st = static_pack_size(pack_heavy, A, multiple=16)
        if n_st > 128:
            n_st = static_pack_size(pack_heavy, A, multiple=128)
        if n_st >= n:
            n_st = None
    if n_st is not None:
        mfull = orbital_mask(sys).astype(F.dtype)
        mk = static_pack_vec(mfull, pack_heavy, n_st)
        if prepacked:
            Fp = F * (mk[:, :, None] * mk[:, None, :])
        else:
            Fp = static_pack_mat(F * (mfull[:, :, None] * mfull[:, None, :]),
                                 pack_heavy, n_st)
        h1, hN = _gershgorin(Fp)
        # dead rows (interior p-rows of lighter molecules + tail padding)
        # get distinct above-spectrum diagonal values (cf. diag.py:120-130)
        idxs = jnp.arange(n_st)
        val = (1.0 + 0.005 * (idxs + 1).astype(F.dtype)) \
            * (hN - h1)[:, None] + hN[:, None]
        diag = jnp.where(mk == 0.0, val,
                         jnp.diagonal(Fp, axis1=-2, axis2=-1))
        Fp = Fp.at[:, idxs, idxs].set(diag)

        if prepacked:
            def unpack(a):
                return a
        else:
            def unpack(a):
                # caller masks padding rows/cols right after
                return static_unpack_mat(a, pack_heavy, A)
    else:
        perm, inv = orbital_permutation(sys)
        Fp = permute_mat(F, perm)
        if pack_n is not None and pack_n < n:
            Fp = _pack_slice(Fp, pack_n)
        h1, hN = _gershgorin(Fp)
        Fp = _fill_padding_diag(Fp, sys.norb, h1, hN)

        def unpack(a):
            return permute_mat(_unpack_embed(a, n), inv)

    from . import eigh_pallas
    if eigh_pallas.supported(Fp.shape[-1], F.dtype):
        # batched one-sided Jacobi kernel: ~481 ms -> few-ms class at
        # (10240, 32, 32); differentiable via its custom_jvp.  Panels
        # whose sweep hit MAX_SWEEPS are re-solved exactly — the
        # reference's eigh (diag.py:102-139) cannot silently fail, so
        # neither may this path.
        e0, v, resid = eigh_pallas.eigh_batched_checked(Fp)
        e0, v, eig_failed = rescue_unconverged_panels(Fp, e0, v, resid)
    else:
        e0, v = jnp.linalg.eigh(Fp)
        eig_failed = jnp.zeros((F.shape[0],), bool)
    ne = e0.shape[-1]
    idx = jnp.arange(ne)
    e = jnp.where(idx[None, :] < sys.norb[:, None], e0, 0.0)
    if ne < n:
        e = jnp.zeros((F.shape[0], n), e.dtype).at[:, :ne].set(e)
    if eig_only:
        return (e, v, eig_failed) if with_flag else (e, v)

    occ = _occupations(e0, sys.nocc, F.dtype, check_degeneracy)
    Pp = 2.0 * jnp.einsum('nik,nk,njk->nij', v, occ, v)
    P = unpack(Pp)
    if prepacked:
        m = static_pack_vec(orbital_mask(sys).astype(F.dtype),
                            pack_heavy, n_st)
    else:
        m = orbital_mask(sys).astype(F.dtype)
    P = P * m[:, :, None] * m[:, None, :]
    return (e, P, v, eig_failed) if with_flag else (e, P, v)


def _subset_system(sys: System, idx: jnp.ndarray) -> System:
    """Gather a molecule subset of a System (static pair lists shared)."""
    import dataclasses
    return dataclasses.replace(
        sys,
        species=sys.species[idx], coordinates=sys.coordinates[idx],
        charges=sys.charges[idx], atom_mask=sys.atom_mask[idx],
        heavy_mask=sys.heavy_mask[idx], nheavy=sys.nheavy[idx],
        nhydro=sys.nhydro[idx], nocc=sys.nocc[idx], norb=sys.norb[idx],
        zi=sys.zi[idx], zj=sys.zj[idx], pair_mask=sys.pair_mask[idx],
        rij=sys.rij[idx], xij=sys.xij[idx])


def eigh_rescue(sys: System, F: jnp.ndarray, P: jnp.ndarray,
                frac: float = 1.0 / 64.0,
                ref: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Re-purify the worst SP2 tail with the exact eigh path.

    SP2's trace-convergence criterion leaves a small tail of molecules
    (near-degenerate HOMO-LUMO) with a rotated or wrong-occupation
    subspace — measured p99 |dP| ~ 8e-7 but max ~6e-3 at 10240 molecules,
    *independent of dot precision* (the tail is algorithmic, not rounding).

    Scoring: a *wrong-occupation* fixed point is still an invariant
    subspace, so [F, P] = 0 there — the commutator only detects rotated /
    unconverged iterates.  When a reference density ``ref`` is available
    (XL-BOMD's propagated field Pt, or the previous SCF iterate) the
    score ||P - ref||^2 catches occupation flips too, since ref tracks
    the physical state; otherwise the commutator ||[F, P]||^2 is used
    (PF = (FP)^T for symmetric operands, so it costs ONE batched matmul).
    The top ceil(frac * nmol) molecules are re-solved with the Jacobi-eigh
    kernel (degeneracy-aware fractional occupations) and scattered back.
    ~4 ms at (10240, 32, 32) for frac = 1/64.

    cf. reference SP2.py whose f64 fixed points show the same
    wrong-occupation tail (see CLAUDE.md physics notes); the rescue is a
    capability the reference lacks.
    """
    nmol = F.shape[0]
    k = max(1, int(round(nmol * frac)))
    if k >= nmol:
        return sym_eig(sys, F, check_degeneracy=True)[1]
    if ref is not None:
        D = P - ref
        score = jnp.sum(D * D, axis=(-2, -1))
    else:
        G = jnp.matmul(F, P, precision=jax.lax.Precision.HIGHEST)
        C = G - jnp.swapaxes(G, -1, -2)
        score = jnp.sum(C * C, axis=(-2, -1))
    _, idx = jax.lax.top_k(score, k)
    sub = _subset_system(sys, idx)
    Psub = sym_eig(sub, F[idx], check_degeneracy=True)[1]
    return P.at[idx].set(Psub)


class _SP2State(NamedTuple):
    a0: jnp.ndarray
    tr_a: jnp.ndarray       # running trace (updated from scalars only)
    errm0: jnp.ndarray
    errm1: jnp.ndarray
    errm2: jnp.ndarray
    notconverged: jnp.ndarray
    k: jnp.ndarray


def _gelfand_radius(Fc, sigma, squarings=2):
    """Upper bound on max |lam(Fc) - sigma| via Gelfand squaring:
    gersh((Fc - sigma I)^(2^k))^(2^-k) -> spectral radius as k grows;
    one batched matmul per squaring (normalized to avoid overflow).

    Tighter bounds than plain Gershgorin buy SP2 twice: the scaled
    HOMO-LUMO gap grows (fewer iterations), and every saved linear-phase
    iteration HALVES the amplified dot-noise in the converged P (see
    sp2_pallas DOT_MODE)."""
    n = Fc.shape[-1]
    eye = jnp.eye(n, dtype=Fc.dtype)
    B = Fc - eye[None] * sigma[:, None, None]
    logr = jnp.zeros_like(sigma)
    for k in range(squarings):
        B = jnp.matmul(B, B, precision=jax.lax.Precision.HIGHEST)
        g = jnp.maximum(jnp.max(jnp.sum(jnp.abs(B), axis=-1), axis=-1),
                        1.0e-30)
        logr = logr + jnp.log(g) / (2.0 ** (k + 1))
        B = B / g[:, None, None]
    return jnp.exp(logr)


def panel_mask(sys: System, pack_heavy: int, n_st: int) -> jnp.ndarray:
    """Orbital-validity mask in the SP2 kernel's panel layout, built
    WITHOUT a full matrix transpose: the (B, n) packed orbital mask is
    reshaped into panel rows/columns (the only data movement is an
    (m, n) -> (n, m) transpose of a vector-sized array)."""
    from . import sp2_pallas
    mk = static_pack_vec(orbital_mask(sys).astype(jnp.float32),
                         pack_heavy, n_st)                       # (B, n)
    B, n = mk.shape
    m, per_prog, pad, G = sp2_pallas.panel_geometry(B, n)
    if pad:
        mk = jnp.concatenate([mk, jnp.zeros((pad, n), mk.dtype)])
    K = sp2_pallas.KPANEL
    mk5 = mk.reshape(G, K, m, n)
    # columns: molecule i's mask along its lane block [i*n, (i+1)*n)
    col = mk5.reshape(G, K, 1, m * n)
    # rows: mask entry r on panel row k*n + r, any lane of molecule i
    row = jnp.repeat(mk5.transpose(0, 1, 3, 2), n, axis=3)  # (G,K,n,m*n)
    pan = (row * col).reshape(G, K * n, m * n)
    T = sp2_pallas.TILE
    if m * n < T:
        pan = jnp.pad(pan, ((0, 0), (0, 0), (0, T - m * n)))
    return pan


def sp2(sys: System, F: jnp.ndarray, eps: float = 1.0e-4,
        precision: str = "highest", dots: str = "highest",
        tight_bounds: bool = False, sort_packing: bool = False,
        debug_iters: bool = False, pack_n: int = None,
        pack_heavy: int = None, prepacked: bool = False,
        panel_out: bool = False):
    """SP2 density-matrix purification (cf. SP2.py:3-72).

    Pure batched matmuls — the TPU-preferred density path.  Per-molecule
    convergence handled with masked updates inside a while_loop; padding
    orbitals are pinned at occupation zero by setting their diagonal to the
    Gershgorin upper bound hN (maps exactly to 0 under the initial scaling).

    ``precision`` sets the XLA-path matmul precision ("highest" = 6-pass
    full-f32, "high" = 3-pass ~2x faster on large n; both keep the
    trace-eps floor at 1e-4 — see SCFConfig.sp2_precision; "default"
    rides the caller's matmul context and forces a 1e-2 floor).  The
    Pallas kernel path always runs HIGHEST-precision dots.

    ``pack_heavy`` (static, see packed_heavy_count) enables the gather-free
    compact-orbital layout: the iteration runs at static_pack_size(K, A)
    instead of 4A — 4x fewer MXU FLOPs on hydrogen-rich batches (headline
    small organics: 16 vs 32) via pure reshape/slice packing.  Preferred
    over ``pack_n``, whose per-molecule permutation gathers cost more than
    the packed solve saves at small n (measured 18 ms vs a 7 ms win at
    (10240, 32, 32)).

    ``prepacked``: F is ALREADY in the static packed layout at
    packed_solver_size(pack_heavy, A) (e.g. from fock_packed_split); the
    returned P stays packed too — no relayouts at either boundary.

    ``panel_out`` (kernel path only): return P in the Pallas kernel's
    (G, K*n, TILE) panel layout (sp2_pallas.panel_pack) instead of
    matrices — callers holding a panel-resident electronic state (the XL
    driver) skip the kernel-output transpose entirely (measured 0.94 ms
    round-trip at (10240, 16); VERDICT r4 weak #1).
    """
    # materialize F once before the multi-consumer prep (mask multiply,
    # Gershgorin, a0 build): without this barrier XLA re-fuses the whole
    # upstream hcore+fock chain into each consumer — measured 25.6 ms for
    # fock+sp2 fused vs 15.2 ms with the barrier at (10240, 32, 32)
    F = jax.lax.optimization_barrier(F)
    dtype = F.dtype
    f32 = dtype == jnp.float32
    eps_kernel = max(eps, 1.0e-5)   # pallas kernel: exact-f32 dots
    A = sys.species.shape[1]
    if prepacked:
        if pack_heavy is None:
            raise ValueError("prepacked=True requires pack_heavy")
        n_st = F.shape[-1]
        if n_st != packed_solver_size(pack_heavy, A):
            raise ValueError(
                f"prepacked F has n={n_st}, expected "
                f"packed_solver_size={packed_solver_size(pack_heavy, A)}")
    else:
        n_st = None
        if pack_heavy is not None:
            n_st = packed_solver_size(pack_heavy, A)
    n_eps = F.shape[-1]
    if pack_n is not None:
        n_eps = min(pack_n, n_eps)
    if n_st is not None:
        n_eps = min(n_st, n_eps)
    if f32:
        # XLA fallback floor.  With HIGHEST dots the trace noise is set by
        # the row-first Frobenius reduction (~1e-4 at n~3536, see frob2);
        # floor at 3e-4 (3x margin so the no-improvement stop rule still
        # fires instead of running to the iteration cap).  HIGH's 3-pass
        # matmul noise GROWS with n (measured exact-trace floor ~3e-3 at
        # n=1792 — an eps below that silently runs to SP2_MAX_ITER, which
        # is both 6x slower than HIGHEST-with-convergence and noisier) —
        # scale its floor ~2e-6 n.  "default" rides the caller's matmul
        # context, where a bf16 pass forces the old 1e-2 bound.  (An eps
        # floored at 1e-2 leaks ~eps x 20 eV/electron of Tr(DF) readout
        # noise into energies — the round-3 XL-drift finding.)
        if precision == "default":
            eps = max(eps, 1.0e-2)
        elif precision == "high":
            eps = max(eps, 3.0e-4, 2.0e-6 * n_eps)
        else:
            eps = max(eps, 3.0e-4)
    else:
        eps = min(max(eps, 1.0e-7), 1.0e-3)

    n_full = n = F.shape[-1]
    noccd = sys.nocc.astype(dtype)
    eye = jnp.eye(n, dtype=dtype)

    from . import sp2_pallas
    n_kernel = n_st if n_st is not None else n
    if sp2_pallas.supported(n_kernel, dtype):
        # SP2 never sorts eigenvalues, so (unlike the eigh path) padding
        # orbitals need no valid-first permutation — pin their diagonal at
        # hN in place and mask afterwards.  (take_along_axis permutation
        # gathers cost ~18 ms at (10240, 32, 32) — never gather here.)
        m = orbital_mask(sys).astype(dtype)
        if prepacked:
            mk = static_pack_vec(m, pack_heavy, n_st)
            mm = mk[:, :, None] * mk[:, None, :]
            Fm = F * mm
        elif n_st is not None:
            # gather-free static compact layout (see pack_heavy above):
            # dead hydrogen p-rows land *interior*, pinned like padding
            mm = m[:, :, None] * m[:, None, :]
            Fm = static_pack_mat(F * mm, pack_heavy, n_st)
            mk = static_pack_vec(m, pack_heavy, n_st)
        else:
            mm = m[:, :, None] * m[:, None, :]
            Fm = F * mm                  # zero padding rows/cols
            mk = m
        eye_k = jnp.eye(n_kernel, dtype=dtype)
        h1, hN = _gershgorin(Fm)
        if tight_bounds:
            # pin padding mid-spectrum so it cannot widen the estimate,
            # refine, then re-pin at the tightened upper bound below
            sigma = 0.5 * (h1 + hN)
            Ftmp = Fm + eye_k[None] * ((1.0 - mk) * sigma[:, None])[:, None, :]
            r = 1.02 * _gelfand_radius(Ftmp, sigma)
            h1 = jnp.maximum(h1, sigma - r)
            hN = jnp.minimum(hN, sigma + r)
        # padding diagonal at hN -> scaled eigenvalue 0 -> occupation 0
        Fp = Fm + eye_k[None] * ((1.0 - mk) * hN[:, None])[:, None, :]
        a0 = (eye_k[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]
        if panel_out:
            if sort_packing:
                raise ValueError("panel_out is incompatible with "
                                 "sort_packing (panel order is the batch "
                                 "order)")
            X = sp2_pallas.panel_pack(a0)
            out = sp2_pallas.sp2_purify_panels(X, noccd, n_kernel,
                                               eps_kernel, dots)
            if n_st is not None:
                mp = panel_mask(sys, pack_heavy, n_st).astype(dtype)
            else:
                mp = sp2_pallas.panel_pack(mm)
            out = out * mp
            if debug_iters:
                return out, jnp.asarray(-1)
            return out
        if sort_packing and a0.shape[0] >= 1024:
            # each kernel program iterates until the SLOWEST of its 128
            # molecules converges; sorting by spectral spread groups
            # similar iteration counts so total time tracks the mean, not
            # the per-program max.  Measured at 10240x8-atom (homogeneous
            # jittered batch): 12.26 ms sorted vs 11.26 unsorted — the
            # gathers cost more than the saved iterations, so default OFF;
            # worth enabling only for heterogeneous size/species batches.
            order = jnp.argsort(hN - h1)
            inv = jnp.argsort(order)
            Pp = sp2_pallas.sp2_purify_tpu(a0[order], noccd[order],
                                           eps_kernel, dots)[inv]
        else:
            Pp = sp2_pallas.sp2_purify_tpu(a0, noccd, eps_kernel, dots)
        if n_st is not None and not prepacked:
            Pp = static_unpack_mat(Pp, pack_heavy, A)
        if debug_iters:
            return Pp * mm, jnp.asarray(-1)   # kernel path: count not exposed
        return Pp * mm

    if panel_out:
        raise ValueError("panel_out requires the SP2 Pallas kernel path "
                         "(TPU backend, n <= 128, float32)")
    if n_st is not None:
        # gather-free static compact layout (see pack_heavy above); dead
        # p-rows sit interior, flagged by the packed orbital mask
        mfull = orbital_mask(sys).astype(dtype)
        mk = static_pack_vec(mfull, pack_heavy, n_st)
        if prepacked:
            Fp = F * (mk[:, :, None] * mk[:, None, :])
        else:
            Fp = static_pack_mat(
                F * (mfull[:, :, None] * mfull[:, None, :]),
                pack_heavy, n_st)
        pad = mk == 0.0
        n = n_st
        eye = jnp.eye(n, dtype=dtype)

        if prepacked:
            def unpack(a):
                return a
        else:
            def unpack(a):
                return static_unpack_mat(a, pack_heavy, A)
    else:
        perm, inv = orbital_permutation(sys)
        Fp = permute_mat(F, perm)
        if pack_n is not None and pack_n < n:
            # run the whole iteration at the compact valid-orbital size —
            # hydrogen-rich molecules waste up to 8x matmul FLOPs at 4A
            # (884-atom alkane: 1792 vs 3536; see packed_orbital_size)
            Fp = _pack_slice(Fp, pack_n)
            n = pack_n
            eye = jnp.eye(n, dtype=dtype)
        idx0 = jnp.arange(n)
        pad = idx0[None, :] >= sys.norb[:, None]

        def unpack(a):
            return permute_mat(_unpack_embed(a, n_full), inv)
    h1, hN = _gershgorin(Fp)
    idx = jnp.arange(n)
    if tight_bounds:
        # same Gelfand refinement as the kernel path: pin padding
        # mid-spectrum so it cannot widen the estimate, refine, then
        # re-pin at the tightened upper bound below
        sigma = 0.5 * (h1 + hN)
        dtmp = jnp.where(pad, sigma[:, None],
                         jnp.diagonal(Fp, axis1=-2, axis2=-1))
        r = 1.02 * _gelfand_radius(Fp.at[:, idx, idx].set(dtmp), sigma)
        h1 = jnp.maximum(h1, sigma - r)
        hN = jnp.minimum(hN, sigma + r)
    diag = jnp.where(pad, hN[:, None], jnp.diagonal(Fp, axis1=-2, axis2=-1))
    Fp = Fp.at[:, idx, idx].set(diag)

    a0 = (eye[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]

    # a0 stays symmetric through the iteration, so tr(a^2) = sum(a o a)
    # (a cheap fused reduction) and tr(a_new) follows from scalars — no
    # per-iteration diagonal gathers.
    tr0 = jnp.trace(a0, axis1=-2, axis2=-1)
    err0 = jnp.abs(tr0 - noccd)
    # err0-derived init keeps the carry 'varying' under shard_map
    st = _SP2State(a0, tr0, err0, err0, err0, err0 >= 0.0, jnp.asarray(0))

    def cond(st):
        return jnp.any(st.notconverged) & (st.k < SP2_MAX_ITER)

    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]

    def frob2(a):
        # tr(a^2) = |a|_F^2 for symmetric a, computed ROW-FIRST: a flat
        # 12.5M-element f32 reduce at n~3536 carries a ~1e-2 noise floor
        # (per-lane sequential chains of ~n^2/1024 terms; random-walk
        # error ~ sqrt(chain) * eps * tr), which sits exactly at the
        # f32 eps floor — convergence then depends on the reduction
        # order XLA picks and on ulp-level input changes (measured on
        # the 884-atom alkane: 32 iterations from one input, the
        # 200-iteration cap from an input perturbed by 1e-9 A).  Row
        # sums are ~[0,1] each with ~1e-6 error, so the cross-row sum's
        # floor drops to ~1e-4 — the 3e-4 eps floor above keeps 3x
        # margin to it.
        return jnp.sum(jnp.sum(a * a, axis=-1), axis=-1)

    def body_masked(st):
        # ONE reduction per iteration: tr(a^2) = |a|_F^2 (a stays
        # symmetric).  tr(a_new) follows from scalars; mixing a second
        # reduction kind into this body triggers an XLA/TPU fusion
        # pathology (~10x slowdown), so the exact trace is refreshed only
        # at chunk boundaries below, correcting the tiny f32 drift.
        a2 = jnp.matmul(st.a0, st.a0, precision=prec)
        tr_a2 = frob2(st.a0)
        take_sq = jnp.abs(tr_a2 - noccd) < jnp.abs(2.0 * st.tr_a - tr_a2 - noccd)
        sel = (st.notconverged & take_sq)[:, None, None]
        nc = st.notconverged[:, None, None]
        a0 = jnp.where(sel, a2, jnp.where(nc, 2.0 * st.a0 - a2, st.a0))
        tr_new = jnp.where(take_sq, tr_a2, 2.0 * st.tr_a - tr_a2)
        tr_a = jnp.where(st.notconverged, tr_new, st.tr_a)
        errm0 = jnp.where(st.notconverged, jnp.abs(tr_a - noccd), st.errm0)
        errm1 = jnp.where(st.notconverged, st.errm0, st.errm1)
        errm2 = jnp.where(st.notconverged, st.errm1, st.errm2)
        if f32:
            done = (errm0 < eps) & (errm0 >= errm2)
        else:
            done = (errm0 < eps) & (errm1 < eps)
        notconverged = st.notconverged & ~done
        return _SP2State(a0, tr_a, errm0, errm1, errm2, notconverged, st.k + 1)

    # while_loop iterations carry a large fixed dispatch cost on TPU, so run
    # the masked body in fori chunks and only check the global convergence
    # predicate between chunks (updates are per-molecule masked, so extra
    # in-chunk iterations after convergence are no-ops).  Large single
    # molecules pay ~ms per iteration of real matmul work, so overshoot
    # costs more than dispatch there — use short chunks.
    CHUNK = SP2_CHUNK_OVERRIDE or (16 if n < 1024 else 4)

    def chunk(st):
        st = jax.lax.fori_loop(0, CHUNK, lambda i, s: body_masked(s), st)
        # refresh the running trace from the actual iterate
        tr_exact = jnp.trace(st.a0, axis1=-2, axis2=-1)
        return st._replace(tr_a=jnp.where(st.notconverged, tr_exact, st.tr_a))

    st = jax.lax.while_loop(cond, chunk, st)
    P = unpack(2.0 * st.a0)
    if prepacked:
        m = static_pack_vec(orbital_mask(sys).astype(dtype), pack_heavy,
                            n_st)
    else:
        m = orbital_mask(sys).astype(dtype)
    P = P * m[:, :, None] * m[:, None, :]
    if debug_iters:
        return P, st.k        # body_masked increments k per iteration
    return P
