"""Charged (ionic) systems: single-point, NVE MD and geometry
optimization with per-molecule net charges.

The reference supports this via the `charges` kwarg its drivers forward
into Parser (MolecularDynamics.py:335 -> basics.py:69-71); here every
driver and sharded fn takes `charges` directly.  Run on CPU:

    JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python examples/ions.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.md import MDConfig, MolecularDynamics
from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
from pyseqm_tpu.scf import SCFConfig

KCAL = 23.060907

# hydronium (+1), ammonium (+1), hydroxide (-1) — all closed shell
SPECIES = np.array([[8, 1, 1, 1, 0],
                    [7, 1, 1, 1, 1],
                    [8, 1, 0, 0, 0]], np.int32)
COORDS = np.array([
    [[0.0, 0.0, 0.0], [0.9014, 0.0, 0.3854],
     [-0.4507, 0.7806, 0.3854], [-0.4507, -0.7806, 0.3854],
     [0.0, 0.0, 0.0]],
    [[0.0, 0.0, 0.0], [0.5947, 0.5947, 0.5947],
     [-0.5947, -0.5947, 0.5947], [-0.5947, 0.5947, -0.5947],
     [0.5947, -0.5947, -0.5947]],
    [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
     [0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]],
])
CHARGES = np.array([1, 1, -1], np.int32)
NAMES = ["H3O+", "NH4+", "OH-"]


def main():
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    species = jnp.asarray(SPECIES)
    coords = jnp.asarray(COORDS, jnp.float64)
    charges = jnp.asarray(CHARGES)

    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c,
                                      charges=charges))(coords)
    print("single point (AM1):")
    for n, hf in zip(NAMES, out.Hf):
        print(f"  {n:6s} Hf = {float(hf) * KCAL:9.2f} kcal/mol")

    # relax the ions
    x, ferr, nit = geometry_optimize_lbfgs(
        const, tables, cfg, species, coords, force_tol=1e-3, max_evl=80,
        chunk=10, charges=charges)
    print(f"L-BFGS: max|F| = {float(ferr):.2e} eV/A after {nit} iters")
    r_oh = float(jnp.linalg.norm(x[0, 1] - x[0, 0]))
    print(f"  relaxed H3O+ O-H bond: {r_oh:.4f} A")

    # 20 NVE steps from the relaxed geometries
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=0.4),
                           charges=charges)
    st = md.initialize(species, x, key=jax.random.PRNGKey(0), Temp=300.0)
    st = md.run(species, st, steps=20, thermo=10, molids=(0, 1, 2))


if __name__ == "__main__":
    main()
