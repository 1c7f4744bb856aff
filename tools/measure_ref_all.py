"""Measure torch-CPU reference baselines for BASELINE configs 2/3/4 and
the 884-atom nanostar analogue (VERDICT round-2 item 6).

Runs the upstream PyTorch implementation (/root/reference) on this host's
CPU with the same workloads as `bench.py --config {scf,opt,bomd,nanostar}`
and merges results into benchmarks/ref_cpu_baseline.json, which becomes a
dict keyed by config name (the legacy single-object "xlbomd" entry is
preserved).

Timing protocol: where the reference API forces a one-shot run() that
includes a bootstrap SCF (BOMD/nanostar), we time two runs of different
lengths and report the marginal per-step cost (t_long - t_short) /
(n_long - n_short) so the bootstrap cancels.  Matches reference usage in
tests/test1.py (Energy), MolecularDynamics.py Geometry_Optimization_SD,
Molecular_Dynamics_Langevin, and tests/test10/test10.py (884-atom scale).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch  # noqa: E402

BASELINE_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "ref_cpu_baseline.json")

NMOL = 10240
MOLSIZE = 8


def _params(eps, converger, sp2, elements, max_iter=200):
    return {
        "method": "AM1", "scf_eps": eps, "scf_converger": converger,
        "sp2": sp2, "elements": elements, "learned": [],
        "pair_outer_cutoff": 1.0e10, "scf_backward": 0,
    }


def _batch(nmol, jitter):
    from pyseqm_tpu.utils.molecules import make_batch
    sp, co = make_batch(nmol, MOLSIZE, jitter=jitter)
    species = torch.as_tensor(sp, dtype=torch.int64)
    coords = torch.tensor(co, dtype=torch.float32)
    elements = [0] + sorted(set(sp.reshape(-1).tolist()))
    return species, coords, elements


def measure_scf(nmol=NMOL):
    """Config 2: batched single-point SCF energy (cf. bench_scf)."""
    from seqm.basics import Energy
    from seqm.seqm_functions.constants import Constants
    species, coords, elements = _batch(nmol, 0.02)
    const = Constants()
    en = Energy(_params(1.0e-3, [2], [True, 1.0e-2], elements))
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        with torch.no_grad():
            en(const, coords, species, all_terms=True)
        times.append(time.perf_counter() - t0)
    v = nmol / min(times)
    return {"metric": "scf_mol_per_sec", "nmol": nmol, "value": v,
            "wall_s": times}


def measure_opt(nmol=2048, evals=4):
    """Config 3: geometry optimization force-eval throughput (cf.
    bench_opt).  Geometry_Optimization_SD does one force eval per
    iteration; report molecule-evals/sec."""
    from seqm.MolecularDynamics import Geometry_Optimization_SD
    from seqm.seqm_functions.constants import Constants
    species, coords, elements = _batch(nmol, 0.05)
    const = Constants()
    opt = Geometry_Optimization_SD(
        _params(1.0e-4, [2], [True, 1.0e-2], elements),
        alpha=0.004, force_tol=1.0e-10, max_evl=evals)
    t0 = time.perf_counter()
    opt.run(const, coords, species, log=False)
    dt = time.perf_counter() - t0
    return {"metric": "opt_molecule_evals_per_sec", "nmol": nmol,
            "evals": evals, "value": nmol * evals / dt, "wall_s": dt}


def _langevin_run(nmol, steps, species, coords, elements):
    from seqm.MolecularDynamics import Molecular_Dynamics_Langevin
    from seqm.seqm_functions.constants import Constants
    const = Constants()
    md = Molecular_Dynamics_Langevin(
        _params(1.0e-4, [2], [True, 1.0e-2], elements),
        timestep=0.4, damp=20.0, Temp=300.0,
        output={"molid": [0], "thermo": 10 ** 9, "dump": 10 ** 9,
                "prefix": "/tmp/ref_bomd"})
    vel = torch.zeros_like(coords)
    t0 = time.perf_counter()
    md.run(const, steps, coords.clone(), vel, species)
    return time.perf_counter() - t0


def measure_bomd(nmol=NMOL):
    """Config 4: Langevin-NVT BOMD, full SCF+force per step (cf.
    bench_bomd).  Marginal cost between 1- and 3-step runs."""
    species, coords, elements = _batch(nmol, 0.02)
    t1 = _langevin_run(nmol, 1, species, coords, elements)
    t3 = _langevin_run(nmol, 3, species, coords, elements)
    v = 2 / max(t3 - t1, 1.0e-9)
    return {"metric": "bomd_steps_per_sec", "nmol": nmol, "value": v,
            "wall_s": [t1, t3]}


def _nanostar_run(steps, species, coords, elements):
    from seqm.XLBOMD import XL_BOMD
    from seqm.seqm_functions.constants import Constants
    const = Constants()
    md = XL_BOMD(_params(1.0e-3, [2], [True, 1.0e-2], elements),
                 timestep=0.4, k=5,
                 output={"molid": [0], "thermo": 10 ** 9, "dump": 10 ** 9,
                         "prefix": "/tmp/ref_nano"})
    vel = torch.zeros_like(coords)
    t0 = time.perf_counter()
    md.run(const, steps, coords.clone(), vel, species)
    return time.perf_counter() - t0


def measure_nanostar():
    """884-atom alkane XL-BOMD step (cf. bench_nanostar; reference scale
    demo is tests/test10).  Marginal cost between 2- and 6-step runs
    cancels the bootstrap SCF."""
    from pyseqm_tpu.utils.molecules import make_alkane
    z, x = make_alkane(294)
    species = torch.as_tensor(z[None], dtype=torch.int64)
    coords = torch.tensor(x[None], dtype=torch.float32)
    elements = [0] + sorted(set(z.tolist()))
    t2 = _nanostar_run(2, species, coords, elements)
    t6 = _nanostar_run(6, species, coords, elements)
    v = 4 / max(t6 - t2, 1.0e-9)
    return {"metric": "xlbomd_force_steps_per_sec", "atoms": 884,
            "value": v, "wall_s": [t2, t6]}


def main():
    torch.set_default_dtype(torch.float32)
    results = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            old = json.load(f)
        # legacy layout: a single flat object for the xlbomd headline
        results = old if "xlbomd" in old else {"xlbomd": old}

    todo = sys.argv[1:] or ["scf", "opt", "bomd", "nanostar"]
    fns = {"scf": measure_scf, "opt": measure_opt, "bomd": measure_bomd,
           "nanostar": measure_nanostar}
    for name in todo:
        print(f"[measure_ref_all] {name} ...", flush=True)
        t0 = time.perf_counter()
        r = fns[name]()
        r["hardware"] = "host CPU (1 core), PyTorch reference, f32"
        results[name] = r
        print(f"[measure_ref_all] {name}: {r['value']:.6g} "
              f"({time.perf_counter() - t0:.1f}s total)", flush=True)
        with open(BASELINE_FILE, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
