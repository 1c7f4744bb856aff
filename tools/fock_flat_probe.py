"""Probe: how much of the HEADLINE (10240 x 8-atom, flat pair) Fock
build is block-grid relayout vs physics.

The dense-path finding (tools/fock_dense_probe.py): the (A, A, 4, 4)
block-grid interleave runs at ~13 GB/s and dominated the 884-atom Fock.
The flat path relayouts (10240, 32, 32) -> (10240, 8, 8, 4, 4) = 40 MB
each way per Fock build; this measures that roundtrip, the full flat
fock, and a fock variant fed a precomputed grid (physics-only bound).

Run on the TPU host: python tools/fock_flat_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.energy import _atom_parameters, _integral_stack
from pyseqm_tpu.ops.fock import fock
from pyseqm_tpu.ops.matrix import grid_to_mat, mat_to_grid
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_batch

R = 20
NMOL = 10240


def chain_timer(fn, init, repeats=3):
    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=R)[0]

    c = jax.block_until_ready(many(init))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = jax.block_until_ready(many(c))
        best = min(best, (time.perf_counter() - t0) / R)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sp, co = make_batch(NMOL, 8, jitter=0.02)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float32)
    K = pq.packed_heavy_count(sp)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-5, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, max_iter=200, pack_heavy=K),
        pack_pairs=True)
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords))
    P0 = out.P
    del out
    A = species.shape[1]

    mmp = jax.default_matmul_precision(cfg.matmul_precision)
    with mmp:
        sys_ = jax.jit(lambda c: make_system(
            const, species, c, None, cfg.pair_outer_cutoff,
            heavy_count=K))(coords)
        p0 = _atom_parameters(tables, cfg.method, sys_, None, coords)
        p0.pop("Kbeta", None), p0.pop("g_ss_nuc", None)
        M0, w0, wf0 = jax.jit(lambda c: _integral_stack(
            const, sys_, p0, None, cfg))(coords)
    M0 = jax.block_until_ready(M0)

    def relayout(P):
        with mmp:
            Pg = mat_to_grid(P, A)
        return P + 1.0e-9 * grid_to_mat(Pg)

    t = chain_timer(relayout, P0)
    print(f"mat_to_grid + grid_to_mat @ (10240, 32, 32): {t * 1e3:7.3f} ms")

    def full(P):
        with mmp:
            F = fock(sys_, P, M0, wf0, p0)
        return P + 1.0e-9 * F

    t = chain_timer(full, P0)
    print(f"fock full (flat WPackSplit)               : {t * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
