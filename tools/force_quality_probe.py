"""Flagship (XL-BOMD f32) force-quality probe — VERDICT r2 item 2.

Measures on the default backend (TPU):

1. --stage force: per-step force error of the XL force model `force_xl`
   at identical (coords, P) inputs, f32 SP2-kernel mode and f32
   Jacobi-eigh mode vs an f64 eigh reference (--stage ref64, run in a
   subprocess because x64 must not leak into the f32 TPU programs) —
   isolates the purifier + arithmetic error that MD forces actually see;
2. --stage drift: XL-BOMD NVE total-energy drift over --steps steps,
   f32+SP2 vs f32+eigh: energy conservation is the self-contained
   in-situ quality metric (no f64 reference trajectory needed); also
   reports amortized steps/sec for the speed/quality trade.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/force_quality_probe.py
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setrecursionlimit(100000)

HERE = os.path.abspath(__file__)


def _setup(x64):
    import jax
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build(dtype, use_sp2, rescue=0.0):
    import jax.numpy as jnp  # noqa: F401
    import pyseqm_tpu as pq
    from pyseqm_tpu.scf import SCFConfig
    const = pq.make_constants(dtype=dtype)
    tables = pq.load_element_tables("AM1", dtype=dtype)
    cfg = pq.SEQMConfig(method="AM1",
                        scf=SCFConfig(eps=1.0e-5, converger=(2,),
                                      use_sp2=use_sp2, sp2_eps=1.0e-4,
                                      sp2_rescue=rescue, max_iter=200))
    return const, tables, cfg


VARIANTS = ((True, 0.0, "sp2"), (True, 1.0 / 64.0, "sp2+rescue"),
            (False, 0.0, "eigh"))


def batch_geom(nmol):
    import numpy as np
    from pyseqm_tpu.utils.molecules import make_batch
    sp, co = make_batch(nmol, 8, jitter=0.02, seed=5)
    return sp, np.float64(np.float32(co))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmol", type=int, default=512)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--stage", choices=["all", "ref64", "force", "drift"],
                    default="all")
    ap.add_argument("--cache", default="/tmp/fq_ref64.npz")
    args = ap.parse_args()

    if args.stage == "ref64":
        _setup(x64=True)
        import jax
        import jax.numpy as jnp
        import numpy as np
        import pyseqm_tpu as pq
        from pyseqm_tpu.models.xlbomd import force_xl
        sp, co = batch_geom(args.nmol)
        species = jnp.asarray(sp, jnp.int32)
        c64, t64, g64 = build(jnp.float64, False)
        out64 = jax.jit(lambda c: pq.energy(c64, t64, g64, species, c))(
            jnp.asarray(co, jnp.float64))
        P64 = np.asarray(out64.P, np.float64)
        f_ref, hf_ref, _ = jax.jit(lambda c, P: force_xl(
            c64, t64, g64, species, c, P))(jnp.asarray(co),
                                           jnp.asarray(P64))
        np.savez(args.cache, P=P64, f=np.asarray(f_ref, np.float64),
                 hf=np.asarray(hf_ref, np.float64))
        print(json.dumps({"probe": "ref64", "cached": args.cache}),
              flush=True)
        return

    if args.stage in ("all", "force"):
        if not os.path.exists(args.cache) or args.stage == "all":
            # f64 reference on CPU: x64 programs crash the axon TPU
            # backend, and TPU f64 is emulated anyway
            env = dict(os.environ, JAX_PLATFORMS="cpu",
                       JAX_PLATFORM_NAME="cpu")
            r = subprocess.run([sys.executable, HERE, "--stage", "ref64",
                                "--nmol", str(args.nmol),
                                "--cache", args.cache], env=env)
            if r.returncode:
                sys.exit(r.returncode)
        _setup(x64=False)
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pyseqm_tpu.models.xlbomd import force_xl
        ref = np.load(args.cache)
        sp, co = batch_geom(args.nmol)
        species = jnp.asarray(sp, jnp.int32)
        for use_sp2, rescue, tag in VARIANTS:
            c32, t32, g32 = build(jnp.float32, use_sp2, rescue)
            f32v, hf32, _ = jax.jit(lambda c, P: force_xl(
                c32, t32, g32, species, c, P))(
                    jnp.asarray(co, jnp.float32),
                    jnp.asarray(ref["P"], jnp.float32))
            df = np.abs(np.asarray(f32v, np.float64) - ref["f"])
            dhf = np.abs(np.asarray(hf32, np.float64) - ref["hf"])
            print(json.dumps({
                "probe": f"force_xl_f32_{tag}_vs_f64",
                "worst_dF_eV_A": float(df.max()),
                "p99_dF_eV_A": float(np.percentile(df, 99)),
                "median_dF_eV_A": float(np.median(df)),
                "worst_dHf_eV": float(dhf.max())}), flush=True)

    if args.stage in ("all", "drift"):
        _setup(x64=False)
        import jax
        import jax.numpy as jnp
        import numpy as np
        from pyseqm_tpu.drivers.md import MDConfig
        from pyseqm_tpu.drivers.xlbomd import XLBOMD
        sp, co = batch_geom(args.nmol)
        species = jnp.asarray(sp, jnp.int32)
        for use_sp2, rescue, tag in VARIANTS:
            c32, t32, g32 = build(jnp.float32, use_sp2, rescue)
            md = XLBOMD(c32, t32, g32, MDConfig(timestep=0.4), k=5)
            st = jax.jit(lambda c: md.initialize(
                species, c, key=jax.random.PRNGKey(11), Temp=300.0))(
                    jnp.asarray(co, jnp.float32))
            chunk = md._build_chunk(species, 50)
            st, obs = jax.block_until_ready(chunk(st))   # warmup/compile
            e_tot = [np.asarray(obs.Ek + obs.Epot, np.float64)]
            t0 = time.perf_counter()
            for _ in range(args.steps // 50 - 1):
                st, obs = jax.block_until_ready(chunk(st))
                e_tot.append(np.asarray(obs.Ek + obs.Epot, np.float64))
            dt = time.perf_counter() - t0
            e = np.concatenate(e_tot)          # (steps, nmol)
            drift = e - e[0][None, :]
            print(json.dumps({
                "probe": f"xlbomd_drift_f32_{tag}",
                "steps": args.steps, "dt_fs": 0.4,
                "worst_abs_drift_eV": float(np.abs(drift).max()),
                "median_final_drift_eV": float(np.median(np.abs(drift[-1]))),
                "steps_per_sec": round((args.steps - 50) / dt, 2)}),
                flush=True)


if __name__ == "__main__":
    main()
