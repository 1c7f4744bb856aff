"""Component attribution for the headline XL-BOMD step (scan-chained).

Times, at the bench workload (10240 x molsize-8 AM1, f32, TPU):
  - energy_xl forward only
  - force_xl (forward + backward)
  - force_xl with the SP2 solve ablated (D := P, no purification)
  - force_xl with precise_overlap off (plain-f32 STO chain)
  - hcore forward alone

Every timing is a data-dependent lax.scan chain of R reps inside one jit
(CLAUDE.md timing methodology).  Isolated chains mispredict fused
programs — treat deltas between full-step variants as the trustworthy
numbers and the component rows as rough attribution.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.xlbomd import energy_xl, force_xl
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_batch

NMOL = 10240
R = 30


def timed(label, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s}: {best / R * 1e3:7.3f} ms/call")
    sys.stdout.flush()
    return out


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

    # converged density for a physical P field
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
    P0 = jax.block_until_ready(out.P)

    def chain(body):
        @jax.jit
        def run(c, P):
            def step(carry, _):
                c, P = carry
                dc, P = body(c, P)
                return (c + 1.0e-7 * dc, P), None
            return jax.lax.scan(step, (c, P), None, length=R)[0][0]
        return run

    def full(c, P):
        frc, hf, D = force_xl(const, tables, cfg, species, c, P)
        return frc, 0.5 * (P + D)

    cfg_nosp2 = dataclasses.replace(
        cfg, scf=dataclasses.replace(scf, use_sp2=False, max_iter=1))

    def fwd_only(c, P):
        o = energy_xl(const, tables, cfg, species, c, P)
        return o.Hf[:, None, None] * jnp.ones_like(c), 0.5 * (P + o.D)

    def no_purify(c, P):
        # D := P (skip the solver); keeps integrals + energy + backward
        import pyseqm_tpu.models.xlbomd as mx
        orig_sp2 = mx.sp2
        try:
            mx.sp2 = lambda s, F, *a, **k: 0.5 * (
                jax.lax.stop_gradient(F) * 0.0 + P + P)
            frc, hf, D = force_xl(const, tables, cfg, species, c, P)
        finally:
            mx.sp2 = orig_sp2
        return frc, P

    cfg_plain = dataclasses.replace(cfg, precise_overlap=False)

    def full_plain(c, P):
        frc, hf, D = force_xl(const, tables, cfg_plain, species, c, P)
        return frc, 0.5 * (P + D)

    def hcore_fwd(c, P):
        from pyseqm_tpu.models.energy import (_atom_parameters,
                                              _integral_stack,
                                              _resolve_pair_layout)
        _, packK = _resolve_pair_layout(cfg, species.shape[1])
        sys_ = make_system(const, species, c, None, cfg.pair_outer_cutoff,
                           heavy_count=packK)
        p = _atom_parameters(tables, cfg.method, sys_, None, c)
        p.pop("Kbeta", None), p.pop("g_ss_nuc", None)
        M, w, w_f = _integral_stack(const, sys_, p, None, cfg)
        wsum = jnp.sum(w.gam()) if hasattr(w, "gam") else jnp.sum(w.ri)
        dc = (jnp.sum(M) + wsum) * jnp.ones_like(c)
        return dc * 1.0e-12, P

    timed("force_xl full step", chain(full), coords, P0)
    timed("energy_xl forward only", chain(fwd_only), coords, P0)
    timed("force_xl, D:=P (no SP2)", chain(no_purify), coords, P0)
    timed("force_xl, precise_overlap off", chain(full_plain), coords, P0)
    timed("hcore forward alone", chain(hcore_fwd), coords, P0)


if __name__ == "__main__":
    main()
