"""Harmonic vibrational frequencies from the analytic second-order path.

Optimizes water (AM1, batched L-BFGS), computes the full Cartesian
Hessian by forward-over-reverse AD through the unrolled SCF
(SCFConfig.backward=2 — cf. the reference's tests/test_hess.py double
backward), mass-weights it, and prints the 3N-6 harmonic frequencies in
cm^-1 (AM1 water: ~1885 bend, ~3440/3500 stretches).

Run: JAX_PLATFORMS=cpu python examples/frequencies.py   (~2 min: the
double-backward program compile dominates)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
else:
    import jax

import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.md import atom_masses
from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
from pyseqm_tpu.scf import SCFConfig

# nu[cm^-1] = WAVENUM * sqrt(lambda[eV / (Angstrom^2 amu)])
WAVENUM = 521.47


def main():
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    const, tables, cfg = pq.build(
        "AM1", dtype=dtype,
        scf=SCFConfig(eps=1.0e-11, converger=(2,)))
    species = jnp.asarray([[8, 1, 1]], dtype=jnp.int32)
    coords = jnp.asarray([[[0.0, 0.0, 0.0],
                           [0.96, 0.07, 0.02],
                           [-0.22, 0.93, -0.05]]], dtype)

    coords, ferr, iters = geometry_optimize_lbfgs(
        const, tables, cfg, species, coords, force_tol=1.0e-6, max_evl=100)
    print(f"optimized in {iters} L-BFGS iterations, |F|max = {float(ferr):.2e} eV/A")

    # Hessian d2Hf/dR2 via jacfwd(grad): mode-2 (unrolled) SCF backward
    # supports the double derivative; converger (0,0) keeps the unroll a
    # pure fixed-point map
    cfg2 = pq.SEQMConfig(
        method="AM1",
        scf=SCFConfig(eps=1.0e-11, converger=(0, 0.0), backward=2,
                      backward_scan_iters=30))

    def hf(c):
        return jnp.sum(pq.energy(const, tables, cfg2, species, c).Hf)

    n = coords.size
    H = np.asarray(jax.jit(jax.jacfwd(jax.grad(hf)))(coords)).reshape(n, n)
    print(f"Hessian: {n}x{n}, max asymmetry {np.abs(H - H.T).max():.2e}")

    m = np.repeat(np.asarray(atom_masses(const, species))[0, :, 0], 3)
    Hw = H / np.sqrt(m[:, None] * m[None, :])
    lam = np.linalg.eigvalsh(0.5 * (Hw + Hw.T))
    freqs = np.sign(lam) * WAVENUM * np.sqrt(np.abs(lam))
    vib = freqs[np.abs(freqs) > 50.0]   # drop translations/rotations
    print("harmonic frequencies (cm^-1):",
          " ".join(f"{f:8.1f}" for f in vib))


if __name__ == "__main__":
    main()
