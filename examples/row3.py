"""Row-3 elements (Na..Cl) — beyond the reference's coverage.

The reference PYSEQM raises for any row-3 pair (diat_overlap.py:65-72);
pyseqm_tpu computes them via the generated-coefficient STO overlap
(ops/overlap_general.py, SEQMConfig.row3=True).  This example optimizes
H2S with PM3 and reproduces Stewart's published PM3 values:
dHf -0.9 kcal/mol, r(SH) 1.290 A, angle 93.5 deg.

Run: python examples/row3.py   (CPU f64; a few minutes of compile)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
from pyseqm_tpu.scf import SCFConfig

KCAL = 23.060907


def main():
    ang = np.deg2rad(92.1)
    r = 1.336                      # distorted start (experimental-ish)
    sp = np.array([[16, 1, 1, 0]], np.int32)
    co = np.zeros((1, 4, 3))
    co[0, 1] = [r, 0.0, 0.0]
    co[0, 2] = [r * np.cos(ang), r * np.sin(ang), 0.0]

    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("PM3", dtype=jnp.float64)
    cfg = pq.SEQMConfig(method="PM3", row3=True,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    species = jnp.asarray(sp)

    x, ferr, nit = geometry_optimize_lbfgs(
        const, tables, cfg, species, jnp.asarray(co),
        force_tol=1.0e-5, max_evl=100, chunk=10)
    out = pq.energy(const, tables, cfg, species, x)

    xn = np.asarray(x[0])
    b = np.linalg.norm(xn[1] - xn[0])
    cosang = np.dot(xn[1] - xn[0], xn[2] - xn[0]) / (
        b * np.linalg.norm(xn[2] - xn[0]))
    print(f"PM3 H2S, optimized in {nit} L-BFGS iterations "
          f"(max|F| {float(ferr):.1e} eV/A):")
    print(f"  dHf    = {float(out.Hf[0]) * KCAL:8.3f} kcal/mol "
          "(published PM3: -0.9)")
    print(f"  r(SH)  = {b:8.4f} A        (published PM3: 1.290)")
    print(f"  angle  = {np.degrees(np.arccos(cosang)):8.2f} deg      "
          "(published PM3: 93.5)")


if __name__ == "__main__":
    main()
