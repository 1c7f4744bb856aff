"""TPU float32 accuracy probe: Hf / force error vs float64.

Measures, on whatever backend JAX defaults to (the real TPU chip under
axon; CPU with JAX_PLATFORM_NAME=cpu):

1. --stage golden: the golden CH2O+H2O batch (tests/golden/
   am1_ch2o_h2o.npz, generated from the f64 PyTorch reference) — worst
   |dHf| and |dforce| for precise_overlap on/off.  Runs pure f32 (no
   jax_enable_x64: the axon TPU backend miscompiles some x64-index
   programs).
2. --stage ref64: computes the f64 reference for a diverse jittered
   small-organics batch (the bench workload) and caches it to --cache.
   Run this on CPU (fast) or TPU-host f64.
3. --stage batch: f32 (precise on/off) on the same f32-rounded batch
   geometries vs the cached f64 reference.

Default --stage all runs golden, then ref64+batch via a subprocess for
the x64 stage.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setrecursionlimit(100000)

HERE = os.path.abspath(__file__)
GOLDEN = os.path.join(os.path.dirname(os.path.dirname(HERE)),
                      "tests", "golden", "am1_ch2o_h2o.npz")


def _setup(x64):
    import jax
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def run(dtype, species, coords, precise, eps, sp2=False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pyseqm_tpu as pq
    from pyseqm_tpu.scf import SCFConfig

    const = pq.make_constants(dtype=dtype)
    tables = pq.load_element_tables("AM1", dtype=dtype)
    # sp2=True mirrors the headline bench density path (SP2 kernel at
    # sp2_eps=1e-4) so the force error the drift table integrates is
    # measured directly, not via the eigh converger
    scf = (SCFConfig(eps=eps, converger=(2,), use_sp2=True,
                     sp2_eps=1.0e-4, max_iter=200) if sp2
           else SCFConfig(eps=eps, converger=(2,)))
    cfg = pq.SEQMConfig(method="AM1", scf=scf, precise_overlap=precise)
    sp = jnp.asarray(species, jnp.int32)
    co = jnp.asarray(coords, dtype)
    f, out = jax.jit(lambda c: pq.force(const, tables, cfg, sp, c))(co)
    return (np.asarray(out.Hf, np.float64), np.asarray(f, np.float64),
            np.asarray(out.notconverged))


def report(tag, hf, f, hf_ref, f_ref):
    import numpy as np
    dh = np.abs(hf - np.asarray(hf_ref, np.float64))
    df = np.abs(f - np.asarray(f_ref, np.float64))
    print(json.dumps({"probe": tag,
                      "worst_dHf_eV": float(dh.max()),
                      "median_dHf_eV": float(np.median(dh)),
                      "worst_dF_eV_A": float(df.max())}), flush=True)


def batch_geom(nmol):
    import numpy as np
    from pyseqm_tpu.utils.molecules import make_batch
    sp, co = make_batch(nmol, 8, jitter=0.02, seed=3)
    return sp, np.float64(np.float32(co))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nmol", type=int, default=256)
    ap.add_argument("--stage", choices=["all", "golden", "ref64", "batch"],
                    default="all")
    ap.add_argument("--cache", default="/tmp/acc_ref64.npz")
    ap.add_argument("--sp2", action="store_true",
                    help="use the headline SP2-kernel density path "
                         "(sp2_eps=1e-4) instead of the eigh converger")
    args = ap.parse_args()

    if args.stage in ("all", "golden"):
        _setup(x64=False)
        import jax.numpy as jnp
        import numpy as np
        g = np.load(GOLDEN)
        eps_g = 1.0e-5 if args.sp2 else 1.0e-7
        for precise in (True, False):
            hf, f, nc = run(jnp.float32, g["species"], g["coordinates"],
                            precise, eps_g, sp2=args.sp2)
            assert not nc.any()
            report(f"golden_f32_sp2={args.sp2}_precise={precise}", hf, f,
                   g["Hf"], g["force"])

    if args.stage == "ref64":
        _setup(x64=True)
        import jax.numpy as jnp
        import numpy as np
        sp, co = batch_geom(args.nmol)
        hf, f, nc = run(jnp.float64, sp, co, False, 1.0e-10)
        assert not nc.any()
        np.savez(args.cache, hf=hf, f=f)
        print(json.dumps({"probe": "ref64", "nmol": args.nmol,
                          "cached": args.cache}), flush=True)
        return

    if args.stage in ("all", "batch"):
        if args.stage == "all":
            # x64 must be set before jax initializes -> subprocess
            r = subprocess.run([sys.executable, HERE, "--stage", "ref64",
                                "--nmol", str(args.nmol),
                                "--cache", args.cache])
            if r.returncode:
                sys.exit(r.returncode)
        _setup(x64=False)
        import jax.numpy as jnp
        import numpy as np
        ref = np.load(args.cache)
        sp, co = batch_geom(args.nmol)
        eps_b = 1.0e-5 if args.sp2 else 1.0e-7
        for precise in (True, False):
            hf, f, nc = run(jnp.float32, sp, np.float32(co), precise, eps_b,
                            sp2=args.sp2)
            assert not nc.any()
            report(f"batch{args.nmol}_f32_sp2={args.sp2}_precise={precise}",
                   hf, f, ref["hf"], ref["f"])


if __name__ == "__main__":
    main()
