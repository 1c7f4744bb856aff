"""Probe: size scaling + relayout cost of the SP2 kernel call.

The sort probe showed ~0.77 ms of per-call cost that does not scale with
the molecule count (linear fit over program count).  Candidates: the
XLA-side panel pack/unpack transposes around pallas_call, or per-call
kernel launch overhead.  Measures (a) kernel at several sizes, (b) the
panel transpose round-trip alone.
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
from pyseqm_tpu.ops.sp2_pallas import KPANEL, TILE
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_batch

NMOL = 10240
R = 30


def timed(run, x):
    # feed each call's output back as the next input: identical-args jit
    # replay on the axon backend returns cached results in ~0 ms
    # (CLAUDE.md timing methodology)
    out = jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        best = min(best, time.perf_counter() - t0)
    return best / R * 1e3


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
        return (eye[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]

    a0 = jax.block_until_ready(prep(F))
    n = n_st
    m = TILE // n
    per_prog = m * KPANEL

    # (a) kernel at several sizes
    for B in (2560, 5120, 10240):
        nb = noccd[:B]

        @jax.jit
        def run(a):
            def step(a, _):
                P = sp2_pallas.sp2_purify_tpu(a, nb, 1.0e-4)
                return a + 1.0e-9 * P, None
            return jax.lax.scan(step, a, None, length=R)[0]

        ms = timed(run, a0[:B])
        print(f"kernel B={B:6d} (G={B // per_prog:3d}): {ms:7.3f} ms/call")
        sys.stdout.flush()

    # (b) panel transpose round-trip alone (the XLA-side relayout)
    @jax.jit
    def relayout(a):
        def step(a, _):
            B = a.shape[0]
            G = B // per_prog
            X = (a.reshape(G, KPANEL, m, n, n)
                   .transpose(0, 1, 3, 2, 4)
                   .reshape(G, KPANEL * n, m * n))
            P = (X.reshape(G, KPANEL, n, m, n)
                   .transpose(0, 1, 3, 2, 4)
                   .reshape(B, n, n))
            return a + 1.0e-9 * P, None
        return jax.lax.scan(step, a, None, length=R)[0]

    ms = timed(relayout, a0)
    print(f"panel transpose round-trip @10240 : {ms:7.3f} ms/call")


if __name__ == "__main__":
    main()
