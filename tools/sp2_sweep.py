"""Sweep SP2 Pallas-kernel tile parameters at the PACKED headline size.

The kernel constants (KPANEL, UNROLL, DOT_MODE) were tuned at n=32; the
static orbital packing moved the headline batch to n=16 where the panel
geometry changes (m = 8 molecules per 128-lane tile, k=16 MXU passes).
This sweeps them on a real converged Fock matrix from the bench batch,
with the data-dependent scan-chain timing from CLAUDE.md.

Run on the TPU host: python tools/sp2_sweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.ops import density as dn
from pyseqm_tpu.ops import sp2_pallas
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_batch

NMOL = 10240
R = 30


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sp, co = make_batch(NMOL, 8, jitter=0.02)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float32)
    K = pq.packed_heavy_count(sp)
    scf = SCFConfig(eps=1.0e-5, converger=(2,), use_sp2=True,
                    sp2_eps=1.0e-4, max_iter=200, pack_heavy=K)
    const, tables, cfg = pq.build("AM1", dtype=jnp.float32, scf=scf)
    sys_ = make_system(const, species, coords, heavy_count=K)

    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
    F = jax.block_until_ready(out.F)
    A = species.shape[1]
    n_st = dn.static_pack_size(K, A, multiple=16)
    print(f"K={K} n_st={n_st} (full {4 * A})")

    # packed, padding-filled, scaled iterate — same prep as ops/density.sp2
    noccd = sys_.nocc.astype(jnp.float32)
    mfull = dn.orbital_mask(sys_).astype(jnp.float32)
    mk = dn.static_pack_vec(mfull, K, n_st)
    eye = jnp.eye(n_st, dtype=jnp.float32)

    @jax.jit
    def prep(F):
        Fp = dn.static_pack_mat(F * mfull[:, :, None] * mfull[:, None, :],
                                K, n_st)
        h1, hN = dn._gershgorin(Fp)
        Fp = Fp + eye[None] * ((1.0 - mk) * hN[:, None])[:, None, :]
        a0 = (eye[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]
        return a0

    a0 = jax.block_until_ready(prep(F))

    def chain():
        @jax.jit
        def run(a0):
            def step(a, _):
                P = sp2_pallas.sp2_purify_tpu(a, noccd, 1.0e-4)
                return a + 1.0e-9 * P, None
            return jax.lax.scan(step, a0, None, length=R)[0]
        return run

    base = None
    for kp, unroll, mode in [
        (32, 2, "highest"),     # current default
        (8, 2, "highest"),
        (16, 2, "highest"),
        (64, 2, "highest"),
        (32, 1, "highest"),
        (32, 4, "highest"),
        (32, 2, "bf16x3"),
    ]:
        sp2_pallas.KPANEL = kp
        sp2_pallas.UNROLL = unroll
        sp2_pallas.DOT_MODE = mode
        sp2_pallas.sp2_purify_tpu.clear_cache()
        run = chain()
        try:
            out = jax.block_until_ready(run(a0))
        except Exception as e:
            print(f"KPANEL={kp:3d} UNROLL={unroll} {mode:8s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}")
            continue
        best = float("inf")
        for _ in range(3):
            # chain the output back in: identical-args jit replay on the
            # axon backend returns cached results in ~0 ms (CLAUDE.md)
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(out))
            best = min(best, time.perf_counter() - t0)
        ms = best / R * 1e3
        if base is None:
            base = ms
        print(f"KPANEL={kp:3d} UNROLL={unroll} {mode:8s}: {ms:7.3f} ms/call "
              f"({ms / base:.2f}x of default)")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
