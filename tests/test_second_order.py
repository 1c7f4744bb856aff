"""Second-order derivatives (cf. reference tests/test15.py, test_hess.py,
test12.py) and orbital-energy gradients (test13/test14): Hessian symmetry
through SCF backward mode 2, and d(e_HOMO)/d(param) vs finite differences."""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig


def _case(golden):
    g = golden("am1_ch2o_h2o")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"][:1], dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"][:1], dtype=jnp.float64)
    return const, tables, species, coords


@pytest.mark.skipif(not os.environ.get("PYSEQM_TPU_SLOW_TESTS"),
                    reason="double-backward compile takes ~7 min on CPU; "
                           "set PYSEQM_TPU_SLOW_TESTS=1")
def test_hessian_symmetry(golden):
    """Full d2Hf/dR2 via forward-over-reverse through the unrolled SCF
    (mode 2) must be symmetric (cf. test_hess.py:41-49).  Verified result:
    max asymmetry 1.8e-13 at |H|max ~53 eV/A^2."""
    const, tables, species, coords = _case(golden)
    cfg = pq.SEQMConfig(
        method="AM1",
        scf=SCFConfig(eps=1.0e-11, converger=(0, 0.0), backward=2,
                      backward_scan_iters=25))

    def hf(c):
        return jnp.sum(pq.energy(const, tables, cfg, species, c).Hf)

    H = jax.jit(jax.jacfwd(jax.grad(hf)))(coords)
    n = coords.size
    H = np.asarray(H).reshape(n, n)
    asym = np.abs(H - H.T).max()
    assert asym < 1e-8 * np.abs(H).max(), f"Hessian asymmetry {asym}"


def test_homo_energy_param_grad(golden):
    """Gradient of the HOMO orbital energy wrt U_ss through the SCF
    adjoint + eigh (cf. test13.py:60-99), vs central differences."""
    const, tables, species, coords = _case(golden)
    # the adjoint contracts at the SCF rate (~0.6/iter here), so a tight
    # backward_eps needs more than the reference's 10 iterations
    cfg = pq.SEQMConfig(
        method="AM1", eig=True,
        scf=SCFConfig(eps=1.0e-11, converger=(2,), backward=1,
                      backward_eps=1.0e-9, backward_max_iter=60))
    base = tables["U_ss"][species]

    @jax.jit
    def homo(delta):
        out = pq.energy(const, tables, cfg, species, coords,
                        learned={"U_ss": base + delta})
        sys = pq.make_system(const, species, coords)
        nocc = sys.nocc[0]
        return out.e[0, nocc - 1]

    g = jax.jit(jax.grad(homo))(jnp.zeros_like(base))
    h = 1e-5
    d = np.zeros(np.asarray(base).shape)
    d[0, 0] = 1.0
    d = jnp.asarray(d)
    num = (homo(h * d) - homo(-h * d)) / (2 * h)
    np.testing.assert_allclose(float(jnp.sum(g * d)), float(num), atol=1e-6)


def test_hessian_subblock_symmetry_default():
    """Default-on reduced second-order check (the full-molecule Hessian
    runs under PYSEQM_TPU_SLOW_TESTS): 9x9 water Hessian through the
    mode-2 (unrolled) SCF must be symmetric and nonzero, so double
    backward cannot silently rot.

    Water, not a diatomic: HF/N2-style diatomics have *exactly* degenerate
    occupied pi lone pairs, and differentiating eigh across an occ-occ
    degeneracy divides by the ~1e-10 numerical splitting -> 1e10 garbage
    (observed).  Water's occupied gaps are >2.7 eV."""
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray([[8, 1, 1]], dtype=jnp.int32)
    coords = jnp.asarray([[[0.0, 0.0, 0.0],
                           [0.96, 0.07, 0.02],
                           [-0.22, 0.93, -0.05]]], jnp.float64)
    cfg = pq.SEQMConfig(
        method="AM1",
        scf=SCFConfig(eps=1.0e-11, converger=(0, 0.0), backward=2,
                      backward_scan_iters=30))

    out = pq.energy(const, tables, cfg, species, coords)
    assert not bool(np.asarray(out.notconverged)[0])

    def hf(c):
        return jnp.sum(pq.energy(const, tables, cfg, species, c).Hf)

    H = jax.jit(jax.jacfwd(jax.grad(hf)))(coords)
    H = np.asarray(H).reshape(9, 9)
    assert np.abs(H).max() > 1.0  # bonded molecule has stiff modes
    asym = np.abs(H - H.T).max()
    assert asym < 1e-8 * np.abs(H).max(), f"Hessian asymmetry {asym}"
