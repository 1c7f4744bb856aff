"""Geometry optimization drivers.

Rebuild of Geometry_Optimization_SD(_LS) (seqm/MolecularDynamics.py:5-156)
plus an L-BFGS path equivalent to the reference's scipy-driven production
workflow (examples/opt.py:63-79) built on optax, fully batched.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import Constants
from ..models.energy import SEQMConfig, energy, force


def _force_fn(const, tables, cfg, species, learned, charges=None):
    def f(coords, P0):
        frc, out = force(const, tables, cfg, species, coords, learned=learned,
                         P0=P0, charges=charges)
        return frc, out.P, out.Hf
    return jax.jit(f)


def geometry_optimize_sd(
    const: Constants, tables, cfg: SEQMConfig, species, coordinates,
    alpha: float = 0.01, force_tol: float = 1.0e-4, max_evl: int = 1000,
    learned=None, log: bool = False, chunk: int = 0, charges=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-step steepest descent; returns (coords, max|F|, dE).

    ``chunk > 0`` runs `chunk` force evaluations per dispatch inside a
    ``lax.scan`` (converged batches freeze in place) and syncs the host
    once per chunk instead of once per evaluation — on the tunneled TPU
    a per-evaluation sync costs ~26 ms plus host scheduling noise.
    """
    from ..scf import init_density
    from ..system import make_system

    P = init_density(const, make_system(const, species, coordinates, charges))
    if chunk > 0:
        run = _make_sd_chunk(const, tables, cfg, species, alpha, force_tol,
                             chunk, learned, charges)
        done = jnp.zeros((), bool)
        nit = jnp.zeros((), jnp.int32)
        Lprev = jnp.zeros((), coordinates.dtype)
        ferr = eerr = float("inf")
        for c in range(-(-max_evl // chunk)):
            coordinates, P, done, nit, Lprev, ferr_d, dE = run(
                coordinates, P, done, nit, Lprev, c == 0)
            ferr, eerr = float(ferr_d), float(dE)
            if log:
                print(f"{int(nit)} {ferr:e} {eerr:e}")
            if bool(done):
                break
        return coordinates, jnp.asarray(ferr), jnp.asarray(eerr)

    f = _force_fn(const, tables, cfg, species, learned, charges)
    Lold = None
    ferr = eerr = float("inf")
    for i in range(max_evl):
        frc, P, L = f(coordinates, P)
        coordinates = coordinates + alpha * frc
        ferr = float(jnp.max(jnp.abs(frc)))
        eerr = float(jnp.sum(L - Lold) / L.shape[0]) if Lold is not None else float("inf")
        Lold = L
        if log:
            print(f"{i + 1} {ferr:e} {eerr:e}")
        if ferr <= force_tol:
            break
    return coordinates, jnp.asarray(ferr), jnp.asarray(eerr)


def _make_sd_chunk(const, tables, cfg, species, alpha, force_tol, chunk,
                   learned, charges=None):
    """One jitted SD chunk: scan `chunk` force+step iterations, freezing
    the whole batch once max|F| <= force_tol (per-molecule freeze would
    save nothing: batched programs run to their slowest member)."""

    @jax.jit
    def run(coords, P, done, nit, Lprev, first):
        def body(carry, _):
            coords, P, done, nit, Lprev, first = carry
            frc, out = force(const, tables, cfg, species, coords,
                             learned=learned, P0=P, charges=charges)
            ferr = jnp.max(jnp.abs(frc))
            Lmean = jnp.sum(out.Hf) / out.Hf.shape[0]
            dE = jnp.where(first, jnp.inf, Lmean - Lprev)
            stop = done | (ferr <= force_tol)
            coords = jnp.where(done, coords, coords + alpha * frc)
            P = jnp.where(done, P, out.P)
            nit = nit + (~done)
            return (coords, P, stop, nit, Lmean, jnp.zeros((), bool)), \
                (ferr, dE)
        (coords, P, done, nit, Lprev, _), (ferrs, dEs) = jax.lax.scan(
            body, (coords, P, done, nit, Lprev,
                   jnp.asarray(first)), length=chunk)
        return coords, P, done, nit, Lprev, ferrs[-1], dEs[-1]

    return run


def geometry_optimize_sd_ls(
    const: Constants, tables, cfg: SEQMConfig, species, coordinates,
    alpha: float = 0.01, force_tol: float = 1.0e-4, max_evl: int = 1000,
    learned=None, log: bool = False, charges=None,
):
    """Steepest descent with a 5-candidate per-molecule line search
    (cf. Geometry_Optimization_SD_LS.onestep, MolecularDynamics.py:28-41)."""
    from ..scf import init_density
    from ..system import make_system

    f = _force_fn(const, tables, cfg, species, learned, charges)
    candidates = jnp.asarray([0.5, 0.75, 1.0, 1.25, 1.5])

    @jax.jit
    def ls_energies(coords, frc, trial, P0):
        def one(a_col):  # (nmol,) step sizes for one candidate
            out = energy(const, tables, cfg, species,
                         coords + frc * a_col[:, None, None], P0=P0,
                         charges=charges)
            return out.Etot
        return jax.vmap(one, in_axes=1)(trial)  # (5, nmol)

    P = init_density(const, make_system(const, species, coordinates, charges))
    alphas = jnp.full((species.shape[0],), alpha, dtype=coordinates.dtype)
    ferr = float("inf")
    for i in range(max_evl):
        frc, P, L = f(coordinates, P)
        trial = alphas[:, None] * candidates[None, :]        # (nmol, 5)
        eng = ls_energies(coordinates, frc, trial, P)        # (5, nmol)
        best = jnp.argmin(eng, axis=0)
        alphas = jnp.maximum(trial[jnp.arange(trial.shape[0]), best], 1.0e-3)
        coordinates = coordinates + alphas[:, None, None] * frc
        ferr = float(jnp.max(jnp.abs(frc)))
        if log:
            print(f"{i + 1} {ferr:e}")
        if ferr <= force_tol:
            break
    return coordinates, jnp.asarray(ferr)


def make_lbfgs(const: Constants, tables, cfg: SEQMConfig, species,
               learned=None, linesearch: str = "zoom",
               max_linesearch_steps: int = 15, charges=None):
    """Build a batched L-BFGS stepper: returns (init_fn, step_fn).

    step_fn(coords, state) -> (new_coords, state, value, max|grad|), one
    jitted outer iteration.  Building the stepper ONCE and reusing it
    matters: the step program nests full SCF evaluations inside the
    linesearch while_loop, and every fresh ``jax.jit`` wrapper re-lowers
    and re-compiles it (minutes at 10k-molecule scale — the round-3
    battery's "opt hang" was the warmup call and the timed call each
    compiling their own copy).

    linesearch: "zoom" (optax default, strong-Wolfe quality),
    "backtracking" (value-only Armijo loop — ~40% faster lowering,
    smaller program), or "none" (fixed unit step on the preconditioned
    direction; cheapest compile).
    """
    import optax

    amask = (species > 0)[..., None]

    def val(coords):
        out = energy(const, tables, cfg, species, coords, learned=learned,
                     charges=charges)
        return jnp.sum(out.Hf)

    if linesearch == "backtracking":
        opt = optax.lbfgs(linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_linesearch_steps, store_grad=True))
    elif linesearch == "none":
        opt = optax.lbfgs(learning_rate=1.0, linesearch=None)
    else:
        opt = optax.lbfgs()

    @jax.jit
    def step(coords, state):
        value, grads = jax.value_and_grad(val)(coords)
        grads = jnp.where(amask, grads, 0.0)
        updates, state = opt.update(grads, state, coords, value=value,
                                    grad=grads, value_fn=val)
        return optax.apply_updates(coords, updates), state, value, \
            jnp.max(jnp.abs(grads))

    return opt.init, step


def make_lbfgs_chunk(const: Constants, tables, cfg: SEQMConfig, species,
                     chunk: int, force_tol: float = 0.0, learned=None,
                     linesearch: str = "zoom",
                     max_linesearch_steps: int = 15, charges=None):
    """Scan-chunked L-BFGS: `chunk` outer iterations per dispatch.

    The per-iteration host loop (:func:`make_lbfgs`) syncs max|grad| to
    Python every step — ~26 ms of tunnel latency plus host-scheduling
    noise per iteration on the TPU (the round-3 battery's 1.9-2.5k
    session variance).  Here the convergence test runs on-device: once
    max|grad| <= force_tol the remaining scan iterations freeze the
    carry in place (batched programs run to their slowest member, so a
    per-molecule freeze would save nothing).

    Returns (init_fn, run_fn); run_fn(coords, state, done, nit) ->
    (coords, state, done, nit, value, max|grad|) with `nit` counting the
    iterations that actually advanced.
    """
    import optax

    amask = (species > 0)[..., None]

    def val(coords):
        out = energy(const, tables, cfg, species, coords, learned=learned,
                     charges=charges)
        return jnp.sum(out.Hf)

    if linesearch == "backtracking":
        opt = optax.lbfgs(linesearch=optax.scale_by_backtracking_linesearch(
            max_backtracking_steps=max_linesearch_steps, store_grad=True))
    elif linesearch == "none":
        opt = optax.lbfgs(learning_rate=1.0, linesearch=None)
    else:
        opt = optax.lbfgs()

    def freeze(stop, new, old):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(stop, b, a), new, old)

    @jax.jit
    def run(coords, state, done, nit):
        def body(carry, _):
            coords, state, done, nit = carry
            value, grads = jax.value_and_grad(val)(coords)
            grads = jnp.where(amask, grads, 0.0)
            updates, new_state = opt.update(grads, state, coords,
                                            value=value, grad=grads,
                                            value_fn=val)
            new_coords = optax.apply_updates(coords, updates)
            ferr = jnp.max(jnp.abs(grads))
            # mirror the host loop: the iteration that detects
            # convergence still counts but does not move the geometry
            stop = done | (ferr <= force_tol)
            coords = jnp.where(stop, coords, new_coords)
            state = freeze(stop, new_state, state)
            nit = nit + (~done)
            return (coords, state, stop, nit), (value, ferr)
        (coords, state, done, nit), (values, ferrs) = jax.lax.scan(
            body, (coords, state, done, nit), length=chunk)
        return coords, state, done, nit, values[-1], ferrs[-1]

    return opt.init, run


class _WarmLBFGSState(NamedTuple):
    x: jnp.ndarray        # (nmol, D) flattened coordinates
    E: jnp.ndarray        # (nmol,) Hf at x
    g: jnp.ndarray        # (nmol, D) dHf/dx at x
    P: jnp.ndarray        # converged density at x (SCF warm start)
    S: jnp.ndarray        # (hist, nmol, D) step history
    Y: jnp.ndarray        # (hist, nmol, D) gradient-difference history
    rho: jnp.ndarray      # (hist, nmol) 1/(s.y); 0 marks an empty slot
    idx: jnp.ndarray      # next ring slot
    done: jnp.ndarray     # (nmol,) per-molecule convergence freeze
    nit: jnp.ndarray      # iterations that advanced at least one molecule
    bad: jnp.ndarray      # (nmol,) consecutive forced (non-Armijo) accepts


def make_lbfgs_warm(const: Constants, tables, cfg: SEQMConfig, species,
                    chunk: int = 10, force_tol: float = 1.0e-3,
                    hist: int = 8, c1: float = 1.0e-4, shrink: float = 0.5,
                    max_backtrack: int = 8, learned=None, charges=None,
                    max_forced: int = 3):
    """Batched L-BFGS with SCF warm starts (the production optimizer).

    Differences vs the optax path (:func:`make_lbfgs_chunk`) that made it
    ~276x the cost of one SD force evaluation per iteration:

    * **warm density**: every energy/gradient evaluation threads the last
      accepted point's converged P as the SCF initial guess (optax's
      ``value_fn`` interface cannot carry auxiliary state, so each of its
      zoom-linesearch evaluations restarted SCF from the atomic guess);
    * **per-molecule Armijo backtracking** in a ``lax.while_loop``: one
      batched value+grad evaluation per backtrack step, exiting as soon
      as every molecule has accepted (typically the first step), instead
      of a fixed-cost strong-Wolfe zoom;
    * per-molecule histories and step lengths; the two-loop recursion is
      batched arithmetic over the (nmol, D) axis (zero per-molecule
      control flow).

    cf. reference production optimization: scipy L-BFGS-B driven by the
    energy+grad predictor (examples/opt.py:63-79) — molecule-at-a-time,
    host-side; this is its batched on-device counterpart.

    Returns (init_fn, run_fn): ``init_fn(coords) -> state`` (runs the
    first SCF), ``run_fn(state) -> (state, E, max|g|)`` advancing `chunk`
    iterations in one dispatch with on-device convergence freeze.
    """
    from ..scf import init_density
    from ..system import make_system

    nmol, A = species.shape
    D = A * 3
    amask = ((species > 0)[..., None] *
             jnp.ones((1, 1, 3), bool)).reshape(nmol, D)

    def eval_vg(xflat, P0):
        def loss(c):
            out = energy(const, tables, cfg, species,
                         c.reshape(nmol, A, 3), learned=learned, P0=P0,
                         charges=charges)
            return jnp.sum(out.Hf), (out.Hf, out.P)
        (_, (Hf, P)), g = jax.value_and_grad(loss, has_aux=True)(xflat)
        return Hf, jnp.where(amask, g, 0.0), jax.lax.stop_gradient(P)

    def init(coords):
        """Array-only state init — NO SCF evaluation (compiling a
        standalone value+grad program just for the starting point cost
        ~500 s at 2048 molecules).  E=+inf makes the first outer
        iteration a bootstrap: d = -g = 0, Armijo accepts x unchanged at
        step 0, and the first real (E, g, P) land in the state from
        inside run()'s already-compiled program."""
        x = coords.reshape(nmol, D)
        P0 = init_density(const, make_system(const, species, coords))
        z = jnp.zeros((hist, nmol, D), x.dtype)
        return _WarmLBFGSState(
            x=x, E=jnp.full((nmol,), jnp.inf, x.dtype),
            g=jnp.zeros((nmol, D), x.dtype), P=P0, S=z, Y=z,
            rho=jnp.zeros((hist, nmol), x.dtype),
            idx=jnp.zeros((), jnp.int32),
            done=jnp.zeros((nmol,), bool),
            nit=jnp.zeros((), jnp.int32),
            bad=jnp.zeros((nmol,), jnp.int32))

    def direction(st: _WarmLBFGSState):
        """Two-loop recursion, batched over molecules; empty ring slots
        have rho=0 and drop out arithmetically."""
        q = st.g
        alphas = []
        for i in range(hist):
            j = (st.idx - 1 - i) % hist
            s, y, r = st.S[j], st.Y[j], st.rho[j]
            a = r * jnp.sum(s * q, axis=-1)
            q = q - a[:, None] * y
            alphas.append((j, a))
        # H0 = gamma I from the newest valid pair
        jn = (st.idx - 1) % hist
        yy = jnp.sum(st.Y[jn] * st.Y[jn], axis=-1)
        sy = jnp.sum(st.S[jn] * st.Y[jn], axis=-1)
        gamma = jnp.where((st.rho[jn] > 0) & (yy > 0), sy / jnp.where(
            yy > 0, yy, 1.0), 1.0)
        r = gamma[:, None] * q
        for j, a in reversed(alphas):
            b = st.rho[j] * jnp.sum(st.Y[j] * r, axis=-1)
            r = r + st.S[j] * (a - b)[:, None]
        d = -r
        # safeguard: fall back to steepest descent on non-descent dirs
        dg = jnp.sum(d * st.g, axis=-1)
        bad = dg >= 0.0
        d = jnp.where(bad[:, None], -st.g, d)
        dg = jnp.where(bad, -jnp.sum(st.g * st.g, axis=-1), dg)
        return d, dg

    def outer(st: _WarmLBFGSState):
        d, dg = direction(st)
        d = jnp.where(st.done[:, None], 0.0, d)
        dg = jnp.where(st.done, 0.0, dg)

        def bt_cond(c):
            _, acc, k = c[0], c[1], c[2]
            return (~jnp.all(acc)) & (k < max_backtrack)

        def bt_body(c):
            t, acc, k, xb, Eb, gb, Pb, fb = c
            xc = jnp.where(acc[:, None], xb, st.x + t[:, None] * d)
            Ec, gc, Pc = eval_vg(xc, st.P)
            ok = Ec <= st.E + c1 * t * dg
            # the final pass force-accepts whatever remains so the
            # optimizer cannot stall on a molecule with a bad model step;
            # forced accepts are flagged and counted in outer() so a
            # molecule cannot walk uphill indefinitely
            forced = (k == max_backtrack - 1) & ~acc & ~ok
            take = (ok & ~acc) | forced
            xb = jnp.where(take[:, None], xc, xb)
            Eb = jnp.where(take, Ec, Eb)
            gb = jnp.where(take[:, None], gc, gb)
            Pb = jnp.where(take[..., None, None], Pc, Pb)
            t = jnp.where(take | acc, t, t * shrink)
            return (t, acc | take, k + 1, xb, Eb, gb, Pb, fb | forced)

        t0 = jnp.ones((nmol,), st.x.dtype)
        c0 = (t0, st.done, jnp.zeros((), jnp.int32), st.x, st.E, st.g, st.P,
              jnp.zeros((nmol,), bool))
        _, _, _, xn, En, gn, Pn, forced = jax.lax.while_loop(
            bt_cond, bt_body, c0)

        s = xn - st.x
        y = gn - st.g
        sy = jnp.sum(s * y, axis=-1)
        ok = sy > 1.0e-10
        S = st.S.at[st.idx].set(jnp.where(ok[:, None], s, 0.0))
        Y = st.Y.at[st.idx].set(jnp.where(ok[:, None], y, 0.0))
        rho = st.rho.at[st.idx].set(
            jnp.where(ok, 1.0 / jnp.where(ok, sy, 1.0), 0.0))
        gerr = jnp.max(jnp.abs(gn), axis=-1)
        # a molecule repeatedly failing Armijo (max_forced consecutive
        # forced accepts) is frozen: its model steps are not descending,
        # so further iterations could walk it uphill indefinitely
        bad = jnp.where(forced & ~st.done, st.bad + 1, 0)
        done = st.done | (gerr <= force_tol) | (bad >= max_forced)
        return _WarmLBFGSState(
            x=xn, E=En, g=gn, P=Pn, S=S, Y=Y, rho=rho,
            idx=(st.idx + 1) % hist, done=done,
            nit=st.nit + (~jnp.all(st.done)), bad=bad)

    @jax.jit
    def run(st: _WarmLBFGSState):
        def body(st, _):
            st = jax.lax.cond(jnp.all(st.done), lambda s: s, outer, st)
            return st, None
        st, _ = jax.lax.scan(body, st, None, length=chunk)
        return st, st.E, jnp.max(jnp.abs(st.g))

    return jax.jit(init), run


def geometry_optimize_lbfgs(
    const: Constants, tables, cfg: SEQMConfig, species, coordinates,
    force_tol: float = 1.0e-4, max_evl: int = 300, learned=None,
    log: bool = False, linesearch: Optional[str] = None, chunk: int = 0,
    charges=None,
):
    """Batched L-BFGS via optax (the production path; the reference drives
    scipy L-BFGS-B with its energy+grad predictor, examples/opt.py:63-79).

    ``chunk > 0`` scans `chunk` iterations per dispatch with an on-device
    convergence freeze.  By default (``linesearch=None``) the chunked path
    uses the warm-start batched L-BFGS (:func:`make_lbfgs_warm` —
    per-molecule Armijo backtracking with the converged density threaded
    through every SCF); an explicit optax linesearch name ("zoom",
    "backtracking", "none") routes to :func:`make_lbfgs_chunk` so the
    request is honored rather than silently ignored.  With ``chunk=0``
    the per-iteration optax host loop runs (default linesearch "zoom")."""
    if chunk > 0 and linesearch is not None:
        init, run = make_lbfgs_chunk(const, tables, cfg, species,
                                     chunk=chunk, force_tol=force_tol,
                                     learned=learned, linesearch=linesearch,
                                     charges=charges)
        state = init(coordinates)
        done = jnp.zeros((), bool)
        nit = jnp.zeros((), jnp.int32)
        ferr = float("inf")
        for c in range(-(-max_evl // chunk)):
            coordinates, state, done, nit, value, ferr_d = run(
                coordinates, state, done, nit)
            ferr = float(ferr_d)
            if log:
                print(f"{int(nit)} {ferr:e} {float(value):e}")
            if bool(done):
                break
        return coordinates, jnp.asarray(ferr), int(nit)
    if chunk > 0:
        init, run = make_lbfgs_warm(const, tables, cfg, species,
                                    chunk=chunk, force_tol=force_tol,
                                    learned=learned, charges=charges)
        state = init(coordinates)
        ferr = float("inf")
        for c in range(-(-max_evl // chunk)):
            state, value, ferr_d = run(state)
            ferr = float(ferr_d)
            if log:
                print(f"{int(state.nit)} {ferr:e} {float(value.sum()):e}")
            if bool(state.done.all()):
                break
        nmol, A = species.shape
        return state.x.reshape(nmol, A, 3), jnp.asarray(ferr), int(state.nit)

    init, step = make_lbfgs(const, tables, cfg, species, learned=learned,
                            linesearch=linesearch or "zoom", charges=charges)
    state = init(coordinates)
    ferr = jnp.inf
    iters = 0
    for i in range(max_evl):
        new_coords, state, value, ferr = step(coordinates, state)
        iters = i + 1
        if log:
            print(f"{i + 1} {float(ferr):e} {float(value):e}")
        if float(ferr) <= force_tol:
            break
        coordinates = new_coords
    # NB: each L-BFGS iteration runs >= 1 internal zoom-linesearch energy
    # evaluations on top of the value_and_grad call; `iters` counts outer
    # iterations only (the honest denominator for iters/sec metrics).
    return coordinates, jnp.asarray(ferr), iters
