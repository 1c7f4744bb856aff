"""Component-level timing of the 884-atom (nanostar-analogue) XL force step.

Times each stage of force_xl with the scan-chained pattern (CLAUDE.md: the
axon tunnel costs ~26 ms per dispatch, so every stage is repeated R times
inside one jit through a data dependency and divided).  Stages:

  integrals_fwd   _integral_stack forward (hcore + two-electron grids)
  integrals_vjp   same, forward + coordinate backward (sum-of-outputs seed)
  fock_fwd        Fock build from fixed integrals
  sp2_fwd         density purification from a fixed Fock matrix
  nuclear_vjp     core-core term forward + backward
  energy_fwd      full energy_xl forward
  force_total     full force_xl (the bench quantity)

`force_total - energy_fwd` bounds the whole backward; the per-stage vjp
lines show where it goes.  Run on the TPU host: python tools/profile_nanostar.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def chain_timer(fn, init, R=3, repeats=3):
    """min over `repeats` of (time of R chained fn applications)/R.

    `fn(carry) -> carry` must make the next call depend on the last
    (defeats replay caching and amortizes the tunnel dispatch)."""
    import jax

    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=R)[0]

    c = jax.block_until_ready(many(init))     # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = jax.block_until_ready(many(c))
        best = min(best, (time.perf_counter() - t0) / R)
    return best, c


def main(n_carbons=294):
    import jax
    import jax.numpy as jnp

    import pyseqm_tpu as pq
    from pyseqm_tpu.models.energy import (_atom_parameters, _integral_stack,
                                          _nuclear_term)
    from pyseqm_tpu.models.xlbomd import energy_xl, force_xl
    from pyseqm_tpu.ops.density import sp2
    from pyseqm_tpu.ops.fock import fock
    from pyseqm_tpu.ops.matrix import grid_to_mat
    from pyseqm_tpu.scf import SCFConfig
    from pyseqm_tpu.system import make_system
    from pyseqm_tpu.utils.molecules import make_alkane

    z, x = make_alkane(n_carbons)
    species = jnp.asarray(z[None])
    coords0 = jnp.asarray(x[None], jnp.float32)
    import os
    # NANOPROF_PACK: 0 = no packing, solver = pack_heavy only (unified
    # integrals), 1 = pack_heavy + class-segmented integrals (pack_pairs)
    mode = os.environ.get("NANOPROF_PACK", "1")
    pack_heavy = pq.packed_heavy_count(z[None]) if mode != "0" else None
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-3, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, sp2_precision="highest",
                      sp2_tight_bounds=True, max_iter=400,
                      pack_orbitals=pq.packed_orbital_size(z[None]),
                      pack_heavy=pack_heavy),
        pack_pairs={"1": True, "solver": False, "0": False}[mode])
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords0))
    P0, F0 = out.P, out.F
    print(f"system: {int((species > 0).sum())} atoms, "
          f"P {tuple(P0.shape)}", file=sys.stderr)

    mmp = jax.default_matmul_precision(cfg.matmul_precision)

    def stack(c):
        with mmp:
            s = make_system(const, species, c, None, cfg.pair_outer_cutoff)
            p = _atom_parameters(tables, cfg.method, s, None, c)
            Kbeta = p.pop("Kbeta", None)
            p.pop("g_ss_nuc", None)
            return s, p, _integral_stack(const, s, p, Kbeta, cfg)

    results = {}

    # --- integrals forward ---------------------------------------------
    def integrals_fwd(c):
        _, _, (M, w, w_f) = stack(c)
        r = jnp.sum(M)
        for leaf in jax.tree_util.tree_leaves(w_f):
            r = r + jnp.sum(leaf)
        return c + 1.0e-12 * r

    results["integrals_fwd"], _ = chain_timer(integrals_fwd, coords0)

    # --- integrals forward + backward ----------------------------------
    def integrals_vjp(c):
        def f(cc):
            _, _, (M, w, w_f) = stack(cc)
            r = jnp.sum(M)
            for leaf in jax.tree_util.tree_leaves(w_f):
                r = r + jnp.sum(leaf)
            return r
        g = jax.grad(f)(c)
        return c + 1.0e-12 * g

    results["integrals_vjp"], _ = chain_timer(integrals_vjp, coords0)

    # --- Fock build from fixed integrals --------------------------------
    s0, p0, (M0, w0, wf0) = jax.jit(lambda c: stack(c))(coords0)
    s0 = jax.block_until_ready(s0)

    def fock_fwd(P):
        with mmp:
            F = fock(s0, P, M0, wf0, p0)
        return P + 1.0e-12 * F

    results["fock_fwd"], _ = chain_timer(fock_fwd, P0)

    # --- SP2 from fixed F ------------------------------------------------
    def sp2_fwd(F):
        with mmp:
            D = sp2(s0, F, cfg.scf.sp2_eps, cfg.scf.sp2_precision,
                    cfg.scf.sp2_dots, cfg.scf.sp2_tight_bounds,
                    pack_n=cfg.scf.pack_orbitals,
                    pack_heavy=cfg.scf.pack_heavy)
        return F + 1.0e-9 * D

    results["sp2_fwd"], _ = chain_timer(sp2_fwd, F0)

    # --- nuclear term fwd+bwd -------------------------------------------
    def nuclear_vjp(c):
        def f(cc):
            s, p, (M, w, w_f) = stack(cc)
            EnucAB, mask = _nuclear_term(const, s, w, cfg, p)
            return jnp.sum(EnucAB)
        return c + 1.0e-12 * jax.grad(f)(c)

    results["nuclear_vjp"], _ = chain_timer(nuclear_vjp, coords0)

    # --- full energy forward ---------------------------------------------
    def energy_fwd(c):
        o = energy_xl(const, tables, cfg, species, c, P0)
        return c + 1.0e-12 * jnp.sum(o.Hf)

    results["energy_fwd"], _ = chain_timer(energy_fwd, coords0)

    # --- full force step (bench quantity) --------------------------------
    def force_total(c):
        frc, _, _ = force_xl(const, tables, cfg, species, c, P0)
        return c + 1.0e-7 * frc

    results["force_total"], _ = chain_timer(force_total, coords0)

    print("--- nanostar force-step breakdown (ms/step, min of 3) ---")
    for k, v in results.items():
        print(f"{k:16s} {v * 1e3:9.1f} ms")
    bwd = results["force_total"] - results["energy_fwd"]
    print(f"{'backward (est.)':16s} {bwd * 1e3:9.1f} ms")
    print(f"steps/s: {1.0 / results['force_total']:.2f}")


def main_packed(n_carbons=294):
    """Profile the FULLY-PACKED electronic chain — the configuration the
    nanostar bench actually runs (bench_nanostar: force_xl packed_io).
    Stages mirror main() but at the packed layout."""
    import jax
    import jax.numpy as jnp

    import pyseqm_tpu as pq
    from pyseqm_tpu.models.energy import (_atom_parameters, _integral_stack,
                                          _nuclear_term)
    from pyseqm_tpu.models.xlbomd import energy_xl, force_xl
    from pyseqm_tpu.ops.density import (packed_solver_size, sp2,
                                        static_pack_mat)
    from pyseqm_tpu.ops.fock import fock_packed_split
    from pyseqm_tpu.scf import SCFConfig
    from pyseqm_tpu.system import make_system
    from pyseqm_tpu.utils.molecules import make_alkane

    z, x = make_alkane(n_carbons)
    species = jnp.asarray(z[None])
    coords0 = jnp.asarray(x[None], jnp.float32)
    A = species.shape[1]
    K = pq.packed_heavy_count(z[None])
    n_st = packed_solver_size(K, A)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-3, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, sp2_precision="highest",
                      sp2_tight_bounds=True, max_iter=400,
                      pack_orbitals=pq.packed_orbital_size(z[None]),
                      pack_heavy=K))
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords0))
    P0 = jax.block_until_ready(static_pack_mat(out.P, K, n_st))
    del out
    print(f"system: {int((species > 0).sum())} atoms, packed n={n_st}",
          file=sys.stderr)

    mmp = jax.default_matmul_precision(cfg.matmul_precision)

    def stack(c):
        with mmp:
            s = make_system(const, species, c, None, cfg.pair_outer_cutoff,
                            heavy_count=K)
            p = _atom_parameters(tables, cfg.method, s, None, c)
            Kbeta = p.pop("Kbeta", None)
            p.pop("g_ss_nuc", None)
            return s, p, _integral_stack(const, s, p, Kbeta, cfg,
                                         packed_m=n_st)

    results = {}

    def integrals_fwd(c):
        _, _, (M, w, _) = stack(c)
        r = jnp.sum(M)
        for leaf in jax.tree_util.tree_leaves(w):
            r = r + jnp.sum(leaf)
        return c + 1.0e-12 * r

    results["integrals_fwd"], _ = chain_timer(integrals_fwd, coords0)

    def integrals_vjp(c):
        def f(cc):
            _, _, (M, w, _) = stack(cc)
            r = jnp.sum(M)
            for leaf in jax.tree_util.tree_leaves(w):
                r = r + jnp.sum(leaf)
            return r
        return c + 1.0e-12 * jax.grad(f)(c)

    results["integrals_vjp"], _ = chain_timer(integrals_vjp, coords0)

    s0, p0, (M0, w0, _) = jax.jit(lambda c: stack(c))(coords0)
    s0 = jax.block_until_ready(s0)

    def fock_fwd(P):
        with mmp:
            F = fock_packed_split(s0, P, M0, w0, p0, K, n_st)
        return P + 1.0e-12 * F

    results["fock_fwd"], F0c = chain_timer(fock_fwd, P0)

    def fock_vjp(P):
        def f(PP):
            with mmp:
                return jnp.sum(fock_packed_split(s0, PP, M0, w0, p0, K, n_st))
        return P + 1.0e-9 * jax.grad(f)(P)

    results["fock_vjp"], _ = chain_timer(fock_vjp, P0)

    F0 = jax.jit(lambda P: fock_packed_split(s0, P, M0, w0, p0, K, n_st))(P0)
    F0 = jax.block_until_ready(F0)

    def sp2_fwd(F):
        with mmp:
            D = sp2(s0, F, cfg.scf.sp2_eps, cfg.scf.sp2_precision,
                    cfg.scf.sp2_dots, cfg.scf.sp2_tight_bounds,
                    pack_heavy=K, prepacked=True)
        return F + 1.0e-9 * D

    results["sp2_fwd"], _ = chain_timer(sp2_fwd, F0)

    def nuclear_vjp(c):
        def f(cc):
            s, p, (M, w, _) = stack(cc)
            EnucAB, mask = _nuclear_term(const, s, w, cfg, p)
            return jnp.sum(EnucAB)
        return c + 1.0e-12 * jax.grad(f)(c)

    results["nuclear_vjp"], _ = chain_timer(nuclear_vjp, coords0)

    def energy_fwd(c):
        o = energy_xl(const, tables, cfg, species, c, P0, packed_io=True)
        return c + 1.0e-12 * jnp.sum(o.Hf)

    results["energy_fwd"], _ = chain_timer(energy_fwd, coords0)

    def force_total(c):
        frc, _, D = force_xl(const, tables, cfg, species, c, P0,
                             packed_io=True)
        return c + 1.0e-7 * frc

    results["force_total"], _ = chain_timer(force_total, coords0)

    print("--- nanostar PACKED force-step breakdown (ms/step, min of 3) ---")
    for k, v in results.items():
        print(f"{k:16s} {v * 1e3:9.1f} ms")
    bwd = results["force_total"] - results["energy_fwd"]
    print(f"{'backward (est.)':16s} {bwd * 1e3:9.1f} ms")
    print(f"steps/s: {1.0 / results['force_total']:.2f}")


if __name__ == "__main__":
    import os
    if os.environ.get("NANOPROF_MODE", "packed") == "packed":
        main_packed()
    else:
        main()
