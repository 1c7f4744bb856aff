"""A/B the panel-resident XL electronic state against the matrix state in
ONE process (same session conditions — the ±5% cross-process session
variance swamps the expected ~0.4 ms/step delta)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.md import MDConfig
from pyseqm_tpu.drivers.xlbomd import XLBOMD
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch

NMOL = 10240
CHUNK = 50


def build(panel: bool, species, coords, const, tables, cfg):
    os.environ["PYSEQM_TPU_PANEL_STATE"] = "1" if panel else "0"
    md = XLBOMD(const, tables, cfg, MDConfig(timestep=0.4), k=5)
    init = jax.jit(lambda c: md.initialize(
        species, c, velocities=jnp.zeros_like(c), initial_force=False))
    state = jax.block_until_ready(init(coords))
    chunk = md._build_chunk(species, CHUNK)
    state, obs = jax.block_until_ready(chunk(state))   # compile + warm
    return md, chunk, state


def rate(chunk, state, reps=4):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state, obs = jax.block_until_ready(chunk(state))
        best = min(best, time.perf_counter() - t0)
    return CHUNK / best, state, obs


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sp, co = make_batch(NMOL, 8, jitter=0.02)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float32)
    scf = SCFConfig(eps=1.0e-5, converger=(2,), use_sp2=True,
                    sp2_eps=1.0e-4, max_iter=200,
                    pack_heavy=pq.packed_heavy_count(sp))
    const, tables, cfg = pq.build("AM1", dtype=jnp.float32, scf=scf)

    md_m, ch_m, st_m = build(False, species, coords, const, tables, cfg)
    md_p, ch_p, st_p = build(True, species, coords, const, tables, cfg)

    # interleave measurements to cancel session drift
    for it in range(3):
        r_m, st_m, ob_m = rate(ch_m, st_m)
        r_p, st_p, ob_p = rate(ch_p, st_p)
        print(f"round {it}: matrix {r_m:7.2f} steps/s | panel {r_p:7.2f} "
              f"steps/s", flush=True)
    em = float(jnp.mean(ob_m.Epot[-1]))
    ep = float(jnp.mean(ob_p.Epot[-1]))
    print(f"Epot parity: matrix {em:.6f}  panel {ep:.6f}  d={em - ep:.2e}")


if __name__ == "__main__":
    main()
