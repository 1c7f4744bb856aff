"""SCF engine: fixed-point convergers + differentiation rules.

Rebuild of seqm/seqm_functions/scf_loop.py:32-806 as compiled JAX control
flow:

* The three convergers (constant mixing / adaptive mixing / adaptive+Pulay
  DIIS, cf. scf_forward0/1/2) run inside one ``lax.while_loop`` whose body
  switches on the iteration phase.  Per-molecule convergence masking is done
  with ``jnp.where`` holds instead of boolean subsetting — converged
  molecules stop changing but keep riding the batch.
* The DIIS machinery (nFock=5 ring buffer of [F,P] commutators, EMAT linear
  system, scf_loop.py:264-510) uses fixed-size buffers with a modular
  counter; the variable-size EMAT inverse becomes a masked identity-embedded
  6x6 solve.
* Differentiation:
  - backward mode 0 (Hellmann-Feynman): the converged density is a
    constant (stop_gradient); downstream energy terms still differentiate
    through Hcore/w.
  - mode 1: ``jax.custom_vjp`` implementing the recursive adjoint of the
    SCF fixed point (cf. SCF.backward, scf_loop.py:557-657): iterate VJPs
    of one Fock+eigh step until the running cotangent decays.
  - mode 2: re-run the iteration as a fixed-length ``lax.scan`` and let
    reverse-mode AD unroll through it (cf. backward=True paths).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import Constants
from .ops.density import sp2, sym_eig
from .ops.fock import fock
from .ops.matrix import grid_to_mat
from .system import System

SCF_PARAM_NAMES = ("g_ss", "g_pp", "g_sp", "g_p2", "h_sp")


class SCFConvergenceError(RuntimeError):
    """Raised (opt-in) when molecules fail to converge, mirroring the
    reference's RAISE_ERROR_IF_SCF_FORWARD/BACKWARD_FAILS flags
    (scf_loop.py:23-27).  Default policy is warn-and-mask."""


def _raise_if_any(flag, where: str):
    """Host callback that raises SCFConvergenceError if any flag is set.

    Surfaces through jit as an XlaRuntimeError wrapping this exception
    (callbacks are the only way to raise on traced values)."""

    def cb(nc):
        nc = np.asarray(nc)
        if nc.any():
            raise SCFConvergenceError(
                f"SCF {where} failed for molecules "
                f"{np.nonzero(nc)[0].tolist()}")

    jax.debug.callback(cb, flag)


@dataclasses.dataclass(frozen=True)
class SCFConfig:
    eps: float = 1.0e-4                 # |dEelec| convergence (eV)
    converger: Tuple = (2,)             # (0, alpha) | (1,) | (2,)
    use_sp2: bool = False
    sp2_eps: float = 1.0e-4
    # XLA-path SP2 matmul precision: "highest" (6-pass f32-faithful) or
    # "high" (3-pass, ~2x faster at large n; the f32 trace-eps floor of
    # 1e-2 tolerates it — noisier converged P, see ops/density.py)
    sp2_precision: str = "highest"
    # Pallas-kernel SP2 dot strategy: "highest" | "compensated" (6
    # single-pass dots + error-free partial accumulation, ~10x less dot
    # noise -> less SP2-amplified force noise; see sp2_pallas.DOT_MODE)
    sp2_dots: str = "highest"
    # refine Gershgorin spectral bounds by Gelfand squaring before SP2
    # (fewer iterations AND exponentially less amplified noise)
    sp2_tight_bounds: bool = False
    # XL-BOMD only: re-purify the worst frac of molecules (scored by
    # ||D - Pt|| against the propagated field, which catches SP2's
    # wrong-occupation flips) with the exact degeneracy-aware eigh path
    # after SP2 — ~4 ms per 10k molecules (ops/density.py eigh_rescue).
    # 0 = off.  The SCF loop ignores it: a wrong-occupation SCF solution
    # is itself self-consistent, so no post-hoc score can identify it.
    sp2_rescue: float = 0.0
    max_iter: int = 1000
    backward: int = 0                   # 0 HF | 1 adjoint | 2 unrolled
    backward_eps: float = 1.0e-2
    backward_max_iter: int = 10
    backward_diverge_min_iter: int = 5
    backward_scan_iters: int = 100      # fixed length for mode 2
    # iterations per while_loop trip (amortizes ~2 ms/iter TPU dispatch;
    # 1 = smallest compiled graph, larger = fewer host round-trips)
    chunk: int = 4
    # raise instead of warn+mask when molecules fail to converge
    # (cf. RAISE_ERROR_IF_SCF_FORWARD/BACKWARD_FAILS, scf_loop.py:23-27)
    raise_on_forward_failure: bool = False
    raise_on_backward_failure: bool = False
    # plain (adaptive-mixing) iterations run on ALL molecules after the
    # energy criterion fires.  The |dEelec| stop is *quadratically* blind
    # to density error (E is variational), so in f32 DIIS halts with
    # |dP| ~ 1e-2 while the f32 Fock+diag map's own fixed point sits
    # 3e-6 from the f64 density (measured, CH2O) — a 0.2 eV/A force
    # error from a 3e-3 eV energy error.  ~8 contraction steps recover
    # |dP| ~ 1e-4-1e-5 and bring f32 forces to the 1e-3 eV/A class.
    # None = auto: 8 for float32 inputs, 0 for float64.
    polish_iters: Optional[int] = None
    # fractional occupations across a degenerate Fermi level
    # (cf. diag.CHECK_DEGENERACY, diag.py:7,79-98)
    check_degeneracy: bool = False
    # STATIC compact-orbital size for the density solvers (ops/density.py):
    # hydrogens carry 3 dead p-orbitals in the 4A layout, so large
    # hydrogen-rich systems waste up to 8x FLOPs in eigh/SP2 at size 4A.
    # Set to ceil(max norb / 128) * 128 — use pyseqm_tpu.packed_orbital_size
    # (species) — to run the solver at the packed size (884-atom alkane:
    # SP2 at 1792 instead of 3536).  MUST be >= every molecule's norb;
    # None = full 4A (always safe).
    pack_orbitals: Optional[int] = None
    # STATIC max heavy-atom count enabling the *gather-free* compact
    # layout (ops/density.py static_pack_mat): the first K atom slots
    # keep their full 4-orbital block, later slots (hydrogen/padding in
    # every molecule, guaranteed by the descending-Z sort) keep only s.
    # Packs by pure reshape/slice — per-molecule permutation gathers cost
    # more than the packed solve saves at small n (measured 18 ms at
    # (10240, 32, 32)).  Use pyseqm_tpu.packed_heavy_count(species).
    # Preferred over pack_orbitals wherever supported (currently SP2).
    pack_heavy: Optional[int] = None


def init_density(const: Constants, sys: System) -> jnp.ndarray:
    """Neutral-atom diagonal initial guess (cf. scf_loop.py:700-710)."""
    nmol, A = sys.species.shape
    dtype = sys.coordinates.dtype
    q = const.tore[sys.species].astype(dtype) / 4.0
    q = jnp.where(sys.species == 1, 1.0, q)
    q = jnp.where(sys.atom_mask, q, 0.0)
    blk = jnp.zeros((nmol, A, 4, 4), dtype=dtype)
    blk = blk.at[..., 0, 0].set(q)
    pq = jnp.where(sys.heavy_mask, q, 0.0)
    for k in (1, 2, 3):
        blk = blk.at[..., k, k].set(pq)
    g = jnp.zeros((nmol, A, A, 4, 4), dtype=dtype)
    idx = jnp.arange(A)
    g = g.at[:, idx, idx].set(blk)
    return grid_to_mat(g)


def _make_density(sys: System, cfg: SCFConfig, differentiable: bool,
                  packed: Optional[Tuple[int, int]] = None):
    if packed is not None:
        # fully-packed SCF: F arrives in the static packed layout and P
        # stays there — no per-iteration relayouts (see scf_solve packed)
        K, _ = packed
        if cfg.use_sp2 and not differentiable:
            return lambda F: sp2(sys, F, cfg.sp2_eps, cfg.sp2_precision,
                                 cfg.sp2_dots, cfg.sp2_tight_bounds,
                                 pack_heavy=K, prepacked=True)
        return lambda F: sym_eig(sys, F,
                                 check_degeneracy=cfg.check_degeneracy,
                                 pack_heavy=K, prepacked=True)[1]
    if cfg.use_sp2 and not differentiable:
        return lambda F: sp2(sys, F, cfg.sp2_eps, cfg.sp2_precision,
                             cfg.sp2_dots, cfg.sp2_tight_bounds,
                             pack_n=cfg.pack_orbitals,
                             pack_heavy=cfg.pack_heavy)
    return lambda F: sym_eig(sys, F, check_degeneracy=cfg.check_degeneracy,
                             pack_n=cfg.pack_orbitals,
                             pack_heavy=cfg.pack_heavy)[1]


def _layout_fock(sys: System, packed: Optional[Tuple[int, int]]):
    """(fock_of, H_of): the Fock builder + core-Hamiltonian view for the
    run layout.  ``packed=(K, n_st)`` selects the fully-packed chain
    (ops/fock.py fock_packed_split); M is then the packed core MATRIX
    from hcore_dense_split(packed_m=n_st), not the (nmol,A,A,4,4) grid,
    and every SCF iterate (P, F, H, DIIS buffers) lives at n_st."""
    if packed is None:
        return (lambda M, w, p, P: fock(sys, P, M, w, p),
                lambda M: grid_to_mat(M))
    K, n_st = packed
    from .ops.fock import fock_packed_split
    return (lambda M, w, p, P: fock_packed_split(sys, P, M, w, p, K, n_st),
            lambda M: M)


class _State(NamedTuple):
    P: jnp.ndarray
    Pold: jnp.ndarray
    F: jnp.ndarray
    Eelec: jnp.ndarray
    err: jnp.ndarray
    notconverged: jnp.ndarray
    k: jnp.ndarray
    cfock: jnp.ndarray
    counter: jnp.ndarray
    FOCK: jnp.ndarray
    FPPF: jnp.ndarray
    EMAT: jnp.ndarray


_NFOCK = 5


def _elec_energy(P, F, H):
    return 0.5 * jnp.sum(P * (H + F), axis=(1, 2))


def _adaptive_fac(Pnew, P, Pold):
    """MOPAC cnvg.f damping factor from density-diagonal deltas."""
    d_new = jnp.diagonal(Pnew, axis1=-2, axis2=-1)
    d_cur = jnp.diagonal(P, axis1=-2, axis2=-1)
    d_old = jnp.diagonal(Pold, axis1=-2, axis2=-1)
    num = jnp.sum((d_new - d_cur) ** 2, axis=-1)
    den = jnp.sum((d_new - 2.0 * d_cur + d_old) ** 2, axis=-1)
    # treated as a constant when differentiating through the loop
    # (cf. the no_grad block in scf_loop.py:199-208)
    return jax.lax.stop_gradient(jnp.sqrt(num / jnp.where(den > 0.0, den, 1.0)))


def _emat_init(nmol, dtype):
    """Lower-triangle -1 pattern incl. the DIIS constraint row (scf_loop.py:285)."""
    E = np.tril(np.eye(_NFOCK + 1) - 1.0)
    return jnp.broadcast_to(jnp.asarray(E, dtype), (nmol, _NFOCK + 1, _NFOCK + 1))


def scf_iterate(
    sys: System,
    M: jnp.ndarray,
    w: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    P0: jnp.ndarray,
    cfg: SCFConfig,
    differentiable: bool = False,
    packed: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fixed-point iteration; returns (Pconv, notconverged).

    ``differentiable=False`` uses a while_loop (forward-only);
    ``differentiable=True`` uses a fixed-length scan that reverse-mode AD
    can unroll (backward mode 2).

    ``packed=(K, n_st)``: the whole loop runs in the static packed
    layout — M is the packed core matrix, P0/P/F/DIIS buffers are
    (nmol, n_st, n_st), and the density solvers run prepacked (zero
    per-iteration relayouts; see scf_solve).
    """
    density = _make_density(sys, cfg, differentiable, packed)
    fock_of, H_of = _layout_fock(sys, packed)
    H = H_of(M)
    conv = cfg.converger[0]
    alpha = cfg.converger[1] if conv == 0 else 0.0

    F1 = fock_of(M, w, p, P0)
    E1 = _elec_energy(P0, F1, H)
    nmol = P0.shape[0]
    dtype = P0.dtype
    # derive batch-shaped initializers from traced data (not constants) so
    # the while_loop carry is 'varying' over any shard_map mesh axis
    zb = E1 * 0.0
    nF = jnp.zeros((nmol, _NFOCK) + P0.shape[1:], dtype=dtype) \
        + zb[:, None, None, None]
    st0 = _State(
        P=P0, Pold=P0 * 0.0, F=F1, Eelec=E1,
        err=zb + 1.0,
        notconverged=zb < 1.0,
        k=jnp.asarray(0), cfock=jnp.asarray(0), counter=jnp.asarray(-1),
        FOCK=nF, FPPF=nF,
        EMAT=_emat_init(nmol, dtype) + zb[:, None, None],
    )

    # |dEelec| cannot resolve below a few ULPs of Eelec itself; without
    # this floor, f32 batches with large |Eelec| iterate forever and the
    # stale DIIS buffers eventually destabilize (no-op for f64 at the
    # reference's tolerances)
    eps_mach = float(jnp.finfo(P0.dtype).eps)

    def _tol(E):
        return jnp.maximum(jnp.asarray(cfg.eps, dtype), 8.0 * eps_mach * jnp.abs(E))

    def finish(st, P, Pold, extra=None):
        """Common tail: rebuild F, energies, masked commit."""
        nc = st.notconverged
        ncm = nc[:, None, None]
        P = jnp.where(ncm, P, st.P)
        Pold = jnp.where(ncm, Pold, st.Pold)
        F = fock_of(M, w, p, P)
        Enew = _elec_energy(P, F, H)
        err = jnp.where(nc, jnp.abs(Enew - st.Eelec), st.err)
        Eelec = jnp.where(nc, Enew, st.Eelec)
        notconverged = err > _tol(Eelec)
        d = dict(P=P, Pold=Pold, F=F, Eelec=Eelec, err=err,
                 notconverged=notconverged, k=st.k + 1,
                 cfock=st.cfock, counter=st.counter,
                 FOCK=st.FOCK, FPPF=st.FPPF, EMAT=st.EMAT)
        if extra:
            d.update(extra)
        return _State(**d)

    def phase_direct(st):
        Pnew = density(st.F)
        return finish(st, Pnew, st.P)

    def phase_mix(st):
        Pnew = density(st.F)
        return finish(st, alpha * st.P + (1.0 - alpha) * Pnew, st.P)

    def phase_adaptive(st):
        Pnew = density(st.F)
        fac = _adaptive_fac(Pnew, st.P, st.Pold)[:, None, None]
        return finish(st, (1.0 + fac) * Pnew - fac * st.P, st.P)

    def _record(st, F, P):
        """Push (F, [F,P]) into the ring buffer & refresh the EMAT row."""
        nc = st.notconverged
        cfock = jnp.minimum(st.cfock + 1, _NFOCK)
        counter = (st.counter + 1) % _NFOCK
        comm = jnp.triu(F @ P - P @ F)
        FOCK = jnp.where(nc[:, None, None, None],
                         st.FOCK.at[:, counter].set(F), st.FOCK)
        FPPF = jnp.where(nc[:, None, None, None],
                         st.FPPF.at[:, counter].set(comm), st.FPPF)
        dots = jnp.einsum('nij,nkij->nk', comm, FPPF)  # (nmol, 5)
        cols = jnp.arange(_NFOCK) < cfock
        row = jnp.where(cols[None, :] & nc[:, None],
                        dots, st.EMAT[:, counter, :_NFOCK])
        EMAT = st.EMAT.at[:, counter, :_NFOCK].set(row)
        return cfock, counter, FOCK, FPPF, EMAT

    def phase_diis_warm(st):
        # record current (F, P), then take the new density directly
        cfock, counter, FOCK, FPPF, EMAT = _record(st, st.F, st.P)
        Pnew = density(st.F)
        return finish(st, Pnew, st.Pold,
                      extra=dict(cfock=cfock, counter=counter,
                                 FOCK=FOCK, FPPF=FPPF, EMAT=EMAT))

    def phase_diis(st):
        nc = st.notconverged
        cfock, counter = st.cfock, st.counter
        # EVEC: symmetrized EMAT scaled by the newest diagonal element
        EVEC = st.EMAT + jnp.swapaxes(jnp.tril(st.EMAT, -1), -1, -2)
        scale = EVEC[:, counter, counter][:, None, None]
        i = jnp.arange(_NFOCK + 1)
        lead = (i[:, None] < cfock) & (i[None, :] < cfock)
        EVEC = jnp.where(lead[None], EVEC / scale, EVEC)
        # invert the (cfock+1) leading block via identity embedding
        sel = (i[:, None] <= cfock) & (i[None, :] <= cfock)
        B = jnp.where(sel[None], EVEC, jnp.eye(_NFOCK + 1, dtype=EVEC.dtype)[None])
        rhs = jax.nn.one_hot(cfock, _NFOCK + 1, dtype=EVEC.dtype)
        col = jnp.linalg.solve(B, jnp.broadcast_to(rhs[:, None], B.shape[:1] + (6, 1)))[..., 0]
        coeff = -col[:, :_NFOCK] * (jnp.arange(_NFOCK)[None, :] < cfock)
        # guard against a near-singular EMAT (stagnant f32 iterations):
        # fall back to the plain latest Fock for that molecule
        sane = (jnp.all(jnp.isfinite(coeff), axis=-1)
                & (jnp.max(jnp.abs(coeff), axis=-1) < 1.0e3))
        Fd = jnp.einsum('nk,nkij->nij', coeff, st.FOCK)
        Fd = jnp.where((nc & sane)[:, None, None], Fd, st.F)

        Pnew = density(Fd)
        ncm = nc[:, None, None]
        P = jnp.where(ncm, Pnew, st.P)
        F = fock_of(M, w, p, P)
        st2 = st._replace(P=P, F=jnp.where(ncm, F, st.F))
        cfock, counter, FOCK, FPPF, EMAT = _record(st2, st2.F, st2.P)
        Enew = _elec_energy(st2.P, st2.F, H)
        err = jnp.where(nc, jnp.abs(Enew - st.Eelec), st.err)
        Eelec = jnp.where(nc, Enew, st.Eelec)
        return _State(P=st2.P, Pold=st.Pold, F=st2.F, Eelec=Eelec, err=err,
                      notconverged=err > _tol(Eelec), k=st.k + 1,
                      cfock=cfock, counter=counter,
                      FOCK=FOCK, FPPF=FPPF, EMAT=EMAT)

    if conv == 0:
        branches = [phase_mix]
        phase_of = lambda st: jnp.asarray(0)
    elif conv == 1:
        branches = [phase_direct, phase_adaptive]
        phase_of = lambda st: jnp.where(st.k < 2, 0, 1)
    elif conv == 2:
        branches = [phase_direct, phase_adaptive, phase_diis_warm, phase_diis]
        phase_of = lambda st: jnp.where(
            st.k < 2, 0, jnp.where(st.k < 3, 1, jnp.where(st.cfock < 2, 2, 3)))
    else:
        raise ValueError(f"unknown converger {cfg.converger}")

    def body(st):
        return jax.lax.switch(phase_of(st), branches, st)

    if differentiable:
        def scan_body(st, _):
            st = body(st)
            return st, None
        st, _ = jax.lax.scan(scan_body, st0, None, length=cfg.backward_scan_iters)
    else:
        # chunked while: while_loop iterations carry a large dispatch cost
        # on TPU, so run several masked iterations per convergence check
        # (converged molecules are frozen, extra iterations are no-ops)
        CHUNK = max(1, int(cfg.chunk))

        def chunk(st):
            if CHUNK == 1:
                return body(st)
            return jax.lax.fori_loop(0, CHUNK, lambda i, s: body(s), st)

        st = jax.lax.while_loop(
            lambda st: jnp.any(st.notconverged) & (st.k < cfg.max_iter),
            chunk, st0)

        npolish = cfg.polish_iters
        if npolish is None:
            npolish = 8 if dtype == jnp.float32 else 0
        if npolish:
            # post-convergence polish (see SCFConfig.polish_iters): run the
            # plain adaptive-mixing map on every molecule, converged or
            # not, contracting the density toward the map's own fixed
            # point; the notconverged flags reported are the pre-polish
            # ones (the energy criterion's verdict).
            nc_final = st.notconverged
            st_all = st._replace(
                notconverged=jnp.ones_like(st.notconverged))
            st_all = jax.lax.fori_loop(
                0, int(npolish), lambda i, s: phase_adaptive(s)._replace(
                    notconverged=jnp.ones_like(s.notconverged)), st_all)
            st = st_all._replace(notconverged=nc_final)
    return st.P, st.notconverged


# ------------------------------------------------------------------
# Differentiation wrappers
# ------------------------------------------------------------------

def _float0_zeros(x):
    if jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), dtype=jax.dtypes.float0)


def _zero_cotangent(tree):
    return jax.tree_util.tree_map(_float0_zeros, tree)


def make_scf_apply(cfg: SCFConfig, packed: Optional[Tuple[int, int]] = None):
    """SCF solve with the recursive-adjoint VJP (backward mode 1)."""

    @jax.custom_vjp
    def scf_apply(sys, M, w, pscf, P0):
        return scf_iterate(sys, M, w, pscf, P0, cfg, packed=packed)

    def fwd(sys, M, w, pscf, P0):
        P, notconverged = scf_iterate(sys, M, w, pscf, P0, cfg,
                                      packed=packed)
        return (P, notconverged), (sys, M, w, pscf, P, notconverged)

    def bwd(res, ct):
        sys, M, w, pscf, Pconv, notconverged = res
        gP0, _ = ct
        fock_of, _ = _layout_fock(sys, packed)

        if packed is not None:
            def step(P, M, w, pscf):
                return sym_eig(sys, fock_of(M, w, pscf, P),
                               pack_heavy=packed[0], prepacked=True)[1]
        else:
            def step(P, M, w, pscf):
                return sym_eig(sys, fock_of(M, w, pscf, P),
                               pack_n=cfg.pack_orbitals,
                               pack_heavy=cfg.pack_heavy)[1]

        _, vjp = jax.vjp(step, Pconv, M, w, pscf)
        converged = ~notconverged

        def gmax(g):
            return jnp.max(jnp.abs(g), axis=(1, 2))

        tadd = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)
        acc0 = jax.tree_util.tree_map(jnp.zeros_like, (M, w, pscf))

        def cond(carry):
            g, acc, k, prev_max, stop = carry
            return (~stop) & (k < cfg.backward_max_iter)

        def body(carry):
            g, acc, k, prev_max, _ = carry
            gP, gM, gw, gp = vjp(g)
            acc = tadd(acc, (gM, gw, gp))
            cur_max = gmax(gP)
            err = jnp.max(jnp.where(converged, cur_max, 0.0))
            diverged = (cur_max > prev_max) & (cur_max >= 1.0)
            stop = (err < cfg.backward_eps) | (
                jnp.any(diverged) & (k + 1 >= cfg.backward_diverge_min_iter))
            return gP, acc, k + 1, cur_max, stop

        gmax0 = gmax(gP0)
        stop0 = jnp.max(gmax0) * 0.0 > 1.0  # varying False under shard_map
        g, acc, k, last_max, _ = jax.lax.while_loop(
            cond, body, (gP0, acc0, jnp.asarray(0), gmax0, stop0))

        # zero gradients of molecules that failed forward or backward
        bad = notconverged | (last_max > cfg.backward_eps) | ~jnp.isfinite(last_max)
        if cfg.raise_on_backward_failure:
            _raise_if_any(bad & ~notconverged, "backward")
        keep = ~bad

        def mask_mol(x):
            k1 = keep.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
            return x * k1

        aM, aw, ap = jax.tree_util.tree_map(mask_mol, acc)
        return (_zero_cotangent(sys), aM, aw, ap, jnp.zeros_like(gP0))

    scf_apply.defvjp(fwd, bwd)
    return scf_apply


def scf_solve(
    const: Constants,
    sys: System,
    M: jnp.ndarray,
    w: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    cfg: SCFConfig,
    P0: Optional[jnp.ndarray] = None,
    packed: Optional[Tuple[int, int]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-level SCF dispatch on cfg.backward (cf. scf_loop, scf_loop.py:671).

    Returns (Pconv, notconverged).  Mode 0 returns a stop_gradient'ed
    density (Hellmann-Feynman forces); mode 1 attaches the adjoint VJP;
    mode 2 is differentiable by unrolling.

    ``packed=(K, n_st)`` runs the ENTIRE fixed point in the static packed
    layout: M must be the packed core matrix (hcore_dense_split
    packed_m=n_st), w the class-segmented grid integrals, and the
    returned Pconv is (nmol, n_st, n_st) — the caller unpacks once at
    the end (models/energy.py).  P0 may be given in either layout.
    """
    pscf = {k: p[k] for k in SCF_PARAM_NAMES}
    if P0 is None or cfg.backward == 2:
        P0 = init_density(const, sys)
    if packed is not None and P0.shape[-1] != packed[1]:
        from .ops.density import static_pack_mat
        P0 = static_pack_mat(P0, packed[0], packed[1])

    def policy(result):
        P, nc = result
        if cfg.raise_on_forward_failure:
            _raise_if_any(nc, "forward")
        return P, nc

    if cfg.backward == 0:
        # stop gradients at the *inputs* so the fixed-point loop is never
        # linearized (Hellmann-Feynman: the converged P is a constant;
        # this also keeps non-differentiable kernels like Pallas SP2 out
        # of AD tracing)
        M0, w0, p0, Pi0 = jax.lax.stop_gradient((M, w, pscf, P0))
        P, nc = scf_iterate(sys, M0, w0, p0, Pi0, cfg, packed=packed)
        return policy((jax.lax.stop_gradient(P), nc))
    if cfg.backward == 1:
        return policy(make_scf_apply(cfg, packed)(sys, M, w, pscf, P0))
    if cfg.backward == 2:
        if cfg.converger[0] not in (0, 1):
            raise ValueError("backward mode 2 requires converger (0, alpha) or (1,)")
        return policy(scf_iterate(sys, M, w, pscf, P0, cfg,
                                  differentiable=True, packed=packed))
    raise ValueError(f"unknown backward mode {cfg.backward}")
