"""Probe: XLA-SP2 while-chunk length at the 884-atom packed size.

After the packed electronic chain, SP2 is ~16 of the 24 ms nanostar
force step.  lax.while_loop iterations carry ~2 ms of fixed dispatch on
this backend (CLAUDE.md); the solver runs the masked body in fori chunks
(ops/density.py CHUNK, 4 at n >= 1024) and tight_bounds converges in
~12-16 iterations — so up to half the SP2 time may be chunk-boundary
dispatch.  Sweeps SP2_CHUNK_OVERRIDE on the real converged Fock matrix.

Run on the TPU host: python tools/sp2_chunk_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.ops import density as dn
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_alkane

R = 10


def main(n_carbons=294):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    z, x = make_alkane(n_carbons)
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float32)
    K = pq.packed_heavy_count(z[None])
    A = species.shape[1]
    n_st = dn.packed_solver_size(K, A)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-3, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, sp2_precision="highest",
                      sp2_tight_bounds=True, max_iter=400,
                      pack_orbitals=pq.packed_orbital_size(z[None]),
                      pack_heavy=K),
        pack_pairs=True)
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords))
    F = dn.static_pack_mat(out.F, K, n_st)
    del out
    sys_ = jax.jit(lambda c: make_system(
        const, species, c, None, cfg.pair_outer_cutoff,
        heavy_count=K))(coords)
    F = jax.block_until_ready(F)
    print(f"n_st={n_st}", file=sys.stderr)

    mmp = jax.default_matmul_precision(cfg.matmul_precision)

    # iteration count first
    with mmp:
        _, iters = jax.jit(lambda F: dn.sp2(
            sys_, F, 1.0e-4, "highest", tight_bounds=True, pack_heavy=K,
            prepacked=True, debug_iters=True))(F)
    print(f"iterations: {int(iters)}")

    for chunk in (4, 8, 16, 24, 32):
        dn.SP2_CHUNK_OVERRIDE = chunk

        @jax.jit
        def run(F):
            def step(F, _):
                with mmp:
                    P = dn.sp2(sys_, F, 1.0e-4, "highest",
                               tight_bounds=True, pack_heavy=K,
                               prepacked=True)
                return F + 1.0e-9 * P, None
            return jax.lax.scan(step, F, None, length=R)[0]

        out = jax.block_until_ready(run(F))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(out))
            best = min(best, time.perf_counter() - t0)
        print(f"CHUNK={chunk:3d}: {best / R * 1e3:8.2f} ms/call")
        sys.stdout.flush()
    dn.SP2_CHUNK_OVERRIDE = None


if __name__ == "__main__":
    main()
