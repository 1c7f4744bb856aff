"""f32 error budget: attribute the TPU-f32 batch Hf error to pipeline
stages (VERDICT r4 item 4).

The production f32 path reads worst |dHf| ~1.3e-4 eV over the
256-molecule jittered batch.  This probe decomposes that into the links
of the chain by swapping in f64-computed (then f32-cast) values at each
boundary:

  stage "readout"   : Hf assembled (compensated sums) from fully
                      f64-converged P/F/H cast to f32 -> floor of the
                      energy assembly itself.
  stage "density"   : P re-solved at f32 (SP2 kernel / eigh) from the
                      f64-cast converged F; Hf read out in f64 ->
                      isolates the density-solver subspace floor through
                      the variational functional.
  stage "frozenP"   : one f32 Fock build + readout from the f32 integral
                      stack with P frozen at P64 -> integrals + Fock
                      accumulation + nuclear + readout, NO density/SCF
                      error.
  stage "full"      : the production f32 SCF end to end (the number the
                      battery reports).

full - frozenP - density ~ the SCF fixed-point/DIIS-stop contribution.

Run:  --stage ref64 (x64 CPU subprocess, cached npz)  then  --stage f32
on the target backend; default --stage all chains both.
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.setrecursionlimit(100000)

HERE = os.path.abspath(__file__)
CACHE = "/tmp/error_budget_ref64.npz"
NMOL = 256


def geometry():
    import numpy as np
    from pyseqm_tpu.utils.molecules import make_batch
    sp, co = make_batch(NMOL, 8, jitter=0.02, seed=3)
    return sp, np.float64(np.float32(co))


def _setup(x64):
    import jax
    if x64:
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stage_ref64(cache):
    _setup(True)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pyseqm_tpu as pq
    from pyseqm_tpu.scf import SCFConfig

    sp, co = geometry()
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    # flat pair layout so the cached w has the simple WPack (ri, U) form
    cfg = pq.SEQMConfig(method="AM1", pack_pairs=False,
                        dense_pair_grid=False,
                        scf=SCFConfig(eps=1.0e-11, converger=(2,)))
    out = jax.jit(lambda c: pq.energy(const, tables, cfg,
                                      jnp.asarray(sp), c))(jnp.asarray(co))
    assert not bool(out.notconverged.any())
    np.savez_compressed(
        cache, species=sp, coords=co,
        Hf=np.asarray(out.Hf), P=np.asarray(out.P), F=np.asarray(out.F),
        H=np.asarray(out.Hcore), ri=np.asarray(out.w.ri),
        U=np.asarray(out.w.U), EnucAB=np.asarray(out.EnucAB))
    print(json.dumps({"probe": "ref64", "nmol": NMOL,
                      "Hf0": float(out.Hf[0])}), flush=True)


def stage_f32(cache):
    _setup(False)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pyseqm_tpu as pq
    from pyseqm_tpu.models.energy import _atom_parameters, _integral_stack
    from pyseqm_tpu.ops.density import sp2, sym_eig
    from pyseqm_tpu.ops.energy import (assemble_energies,
                                       elec_energy_isolated_atom,
                                       elec_energy_tf, pair_nuclear_energy)
    from pyseqm_tpu.ops.fock import fock
    from pyseqm_tpu.ops.matrix import grid_to_mat, mat_to_grid
    from pyseqm_tpu.ops.tetci import WPack
    from pyseqm_tpu.scf import SCFConfig
    from pyseqm_tpu.system import make_system

    g = np.load(cache)
    sp = g["species"]
    co = g["coords"]
    Hf64 = np.float64(g["Hf"])
    P64 = jnp.asarray(np.float32(g["P"]))
    F64 = jnp.asarray(np.float32(g["F"]))
    H64 = jnp.asarray(np.float32(g["H"]))
    w64 = WPack(ri=jnp.asarray(np.float32(g["ri"])),
                U=jnp.asarray(np.float32(g["U"])))
    EnucAB64 = jnp.asarray(np.float32(g["EnucAB"]))

    const = pq.make_constants(dtype=jnp.float32)
    tables = pq.load_element_tables("AM1", dtype=jnp.float32)
    cfg = pq.SEQMConfig(method="AM1", pack_pairs=False,
                        dense_pair_grid=False,
                        scf=SCFConfig(eps=1.0e-5, converger=(2,),
                                      use_sp2=True, sp2_eps=1.0e-4,
                                      max_iter=200))
    species = jnp.asarray(sp, jnp.int32)
    coords = jnp.asarray(co, jnp.float32)

    def hf_readout(P, F, H, EnucAB, p, sys):
        Eiso = elec_energy_isolated_atom(const, sys.species, p)
        Hf, *_ = assemble_energies(const, sys, elec_energy_tf(P, F, H),
                                   EnucAB, Eiso, True)
        return Hf

    @jax.jit
    def readout_stage(coords):
        sys = make_system(const, species, coords, None,
                          cfg.pair_outer_cutoff)
        p = _atom_parameters(tables, "AM1", sys, None, coords)
        p.pop("Kbeta", None); p.pop("g_ss_nuc", None)
        return hf_readout(P64, F64, H64, EnucAB64, p, sys)

    @jax.jit
    def density_stage(coords):
        # P from the production f32 solver on the f64-cast F; readout
        # against the f64-cast F/H so only dP shows (variationally)
        sys = make_system(const, species, coords, None,
                          cfg.pair_outer_cutoff)
        p = _atom_parameters(tables, "AM1", sys, None, coords)
        p.pop("Kbeta", None); p.pop("g_ss_nuc", None)
        with jax.default_matmul_precision("highest"):
            P32 = sp2(sys, F64, cfg.scf.sp2_eps)
            Pe = sym_eig(sys, F64)[1]
        return (hf_readout(P32, F64, H64, EnucAB64, p, sys),
                hf_readout(Pe, F64, H64, EnucAB64, p, sys))

    @jax.jit
    def frozenP_stage(coords):
        # f32 integrals + one f32 Fock build + f32 nuclear, P pinned at
        # the f64 converged density
        sys = make_system(const, species, coords, None,
                          cfg.pair_outer_cutoff)
        p = _atom_parameters(tables, "AM1", sys, None, coords)
        p.pop("Kbeta", None); p.pop("g_ss_nuc", None)
        with jax.default_matmul_precision("highest"):
            M, w, w_f = _integral_stack(const, sys, p, None, cfg)
            F = fock(sys, P64, M, w_f, p)
            H = grid_to_mat(M)
            gam = w.gam() if hasattr(w, "gam") else w.ri[..., 0]
            EnucAB = pair_nuclear_energy(const, sys, gam, "AM1", p)
            hf_all = hf_readout(P64, F, H, EnucAB, p, sys)
            # electronic-only: f32 integrals but the f64 nuclear term —
            # splits the integral-stack increment into electronic
            # (overlap/ri through Hcore+Fock) vs core-core (gam + exp
            # chain) halves
            hf_elec = hf_readout(P64, F, H, EnucAB64, p, sys)
            # nuclear-only: f64-cast electronic state + f32 core-core
            hf_nuc = hf_readout(P64, F64, H64, EnucAB, p, sys)
            # fock-accumulation alone: f64-cast integrals + Hcore, f32
            # contraction arithmetic
            A = species.shape[1]
            F2 = fock(sys, P64, mat_to_grid(H64, A), w64, p)
            hf_fock = hf_readout(P64, F2, H64, EnucAB64, p, sys)
            return hf_all, hf_elec, hf_nuc, hf_fock

    @jax.jit
    def full_stage(coords):
        return pq.energy(const, tables, cfg, species, coords).Hf

    def rep(tag, hf):
        d = np.abs(np.asarray(hf, np.float64) - Hf64)
        print(json.dumps({"stage": tag, "worst_dHf_eV": float(d.max()),
                          "median_dHf_eV": float(np.median(d))}),
              flush=True)

    rep("readout(f64 state, f32 assembly)", readout_stage(coords))
    hf_sp2, hf_eigh = density_stage(coords)
    rep("density sp2-kernel (f64 F)", hf_sp2)
    rep("density eigh (f64 F)", hf_eigh)
    hf_frozen, hf_elec, hf_nuc, hf_fockonly = frozenP_stage(coords)
    rep("frozenP integrals+fock+nuc+readout", hf_frozen)
    rep("frozenP electronic integrals only (f64 nuclear)", hf_elec)
    rep("frozenP nuclear only (f64 electronic)", hf_nuc)
    rep("frozenP fock-accum only (f64 integrals)", hf_fockonly)
    rep("full f32 SCF (production)", full_stage(coords))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["all", "ref64", "f32"],
                    default="all")
    ap.add_argument("--cache", default=CACHE)
    args = ap.parse_args()
    if args.stage == "ref64":
        stage_ref64(args.cache)
        return
    if args.stage == "all" and not os.path.exists(args.cache):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = env["JAX_PLATFORM_NAME"] = "cpu"
        r = subprocess.run([sys.executable, HERE, "--stage", "ref64",
                            "--cache", args.cache], env=env)
        if r.returncode:
            sys.exit(r.returncode)
    stage_f32(args.cache)


if __name__ == "__main__":
    main()
