"""A/B the SP2 while-loop chunk length at nanostar scale, in ONE process.

At n >= 1024 the XLA-SP2 runs fori-chunks of 4 inside the while loop
("overshoot costs more than dispatch there — use short chunks", r2).
But each while iteration costs ~2 ms on this backend: with ~16 SP2
iterations (tight_bounds) that is 4 while-rounds = ~8 ms of loop
overhead on a ~14 ms step, vs an overshoot cost of only ~0.35 ms per
extra n=1792 matmul.  Re-measure the trade at the real workload.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.xlbomd import force_xl
from pyseqm_tpu.ops import density as dn
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_alkane

R = 25


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    z, x = make_alkane(294)
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float32)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-3, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, sp2_precision="highest",
                      sp2_tight_bounds=True, max_iter=400,
                      pack_orbitals=pq.packed_orbital_size(z[None]),
                      pack_heavy=pq.packed_heavy_count(z[None])))
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords))
    K = cfg.scf.pack_heavy
    n_st = dn.packed_solver_size(K, species.shape[1])
    P0 = dn.static_pack_mat(out.P, K, n_st)
    del out

    def build(chunk):
        dn.SP2_CHUNK_OVERRIDE = chunk

        @jax.jit
        def many(c, P):
            def step(c, _):
                frc, _, D = force_xl(const, tables, cfg, species, c, P,
                                     packed_io=True)
                return c + 1.0e-7 * frc, None
            return jax.lax.scan(step, c, None, length=R)[0]
        c = jax.block_until_ready(many(coords, P0))
        return many, c

    runs = {}
    for chunk in (None, 8, 12, 20):
        runs[chunk] = build(chunk)
    for it in range(3):
        line = []
        for chunk, (many, c) in runs.items():
            t0 = time.perf_counter()
            c = jax.block_until_ready(many(c, P0))
            runs[chunk] = (many, c)
            line.append(f"chunk={chunk}: {R / (time.perf_counter() - t0):6.2f}")
        print(f"round {it}: " + " | ".join(line) + " steps/s", flush=True)


if __name__ == "__main__":
    main()
# (r5 result: default chunk 4 best — 59-61 steps/s vs 51 @12, 55.6 @20;
# the ~2 ms/while-iteration overhead no longer dominates at this size,
# overshoot matmuls do.  Keep the size-based default.)
