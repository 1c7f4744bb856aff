"""Large-single-molecule path (reference tests/test10 analogue): a C30
alkane (92 atoms, 362 orbitals) through SCF energy + forces.  Exercises
the long-range pair regime (overlap-cutoff masking, near-axis frame
stability, exp-overflow clamps) that only appears beyond ~50 Angstrom."""
import jax
import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_alkane


def test_c100_alkane_forces():
    """~C100 regime (302 atoms, 1202 orbitals; VERDICT r2 item 8): pins the
    long-range masked pair regime — 40-Bohr overlap cutoff + frame poles
    activate well below the 884-atom bench — in the default f64 suite.
    Runs through the dense-A^2 integral pipeline (auto at A >= 64)."""
    z, x = make_alkane(100)
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float64)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-8, converger=(2,)))
    f, out = jax.jit(lambda c: pq.force(const, tables, cfg, species, c))(coords)
    assert not bool(out.notconverged[0])
    hf = float(out.Hf[0])
    # ~ -2.3 kcal/mol per CH2: C100H202 lands near -26 eV
    assert -30.0 < hf < -22.0, hf
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(np.asarray(f[0]).sum(axis=0), 0.0, atol=1e-7)


def test_large_alkane_energy_forces():
    z, x = make_alkane(30)
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float64)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    f, out = jax.jit(lambda c: pq.force(const, tables, cfg, species, c))(coords)
    assert not bool(out.notconverged[0])
    hf = float(out.Hf[0])
    # ~ -2.3 kcal/mol per CH2 group: C30H62 lands near -7.6 eV
    assert -9.0 < hf < -6.0, hf
    assert np.isfinite(np.asarray(f)).all()
    # translational invariance: forces sum to ~0
    np.testing.assert_allclose(np.asarray(f[0]).sum(axis=0), 0.0, atol=1e-7)
