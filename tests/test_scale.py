"""Large-single-molecule path (reference tests/test10 analogue): a C30
alkane (92 atoms, 362 orbitals) through SCF energy + forces.  Exercises
the long-range pair regime (overlap-cutoff masking, near-axis frame
stability, exp-overflow clamps) that only appears beyond ~50 Angstrom."""
import dataclasses

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


def test_f32_forces_finite_beyond_overlap_cutoff():
    """Regression: pairs far beyond the 40-Bohr overlap cutoff must not
    poison the f32 force backward.  The precise (two-float) overlap path
    evaluated at raw rij produces inf intermediates past ~85 Bohr whose
    zero masked cotangents turn into NaN (found on the 884-atom nanostar:
    every step-1 force was NaN, which fed back into coordinates and drove
    SP2 to its iteration cap).  hcore now sanitizes rij to 1 outside the
    overlap mask before the integral."""
    # water dimer at 60 A (113 Bohr) separation: O-H cross pairs have the
    # largest zeta mismatch (worst B-integral magnitude)
    z = np.array([[8, 1, 1, 8, 1, 1]])
    x = np.zeros((1, 6, 3))
    x[0, 1] = [0.96, 0.0, 0.0]
    x[0, 2] = [-0.24, 0.93, 0.0]
    x[0, 3:] = x[0, :3] + np.array([60.0, 0.0, 0.0])
    # canonical descending-Z order (the entry check now enforces the
    # convention the flat pair classes rely on); the far O-H cross pairs
    # this regression needs survive the sort
    z, x = pq.system.sort_species(z, x)
    species = jnp.asarray(z)
    coords = jnp.asarray(x, jnp.float32)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-5, converger=(2,)))
    assert cfg.precise_overlap
    for dense in (False, True):
        c = dataclasses.replace(cfg, dense_pair_grid=dense)
        f, out = jax.jit(
            lambda cc, c=c: pq.force(const, tables, c, species, cc))(coords)
        assert np.isfinite(np.asarray(f)).all(), f"dense={dense}"
        assert np.isfinite(float(out.Hf[0]))


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


def test_packed_orbital_solvers_match_full():
    """SCFConfig.pack_orbitals (compact-orbital density solve, the 8x
    FLOP saver for hydrogen-rich large molecules): packed SP2 and eigh
    agree with the full-4A solve in f64, through both the direct solvers
    and the XL-BOMD force step."""
    from pyseqm_tpu.models.xlbomd import force_xl
    from pyseqm_tpu.ops.density import packed_orbital_size, sp2, sym_eig
    from pyseqm_tpu.system import make_system

    z, x = make_alkane(10)                       # 32 atoms, 4A=128
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float64)
    pk = packed_orbital_size(species, multiple=16)
    assert pk < 4 * species.shape[1]

    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
    sys_ = jax.jit(lambda c: make_system(const, species, c))(coords)
    F = out.F

    P_full = jax.jit(lambda F: sp2(sys_, F, 1e-7))(F)
    P_pack = jax.jit(lambda F: sp2(sys_, F, 1e-7, pack_n=pk))(F)
    np.testing.assert_allclose(P_pack, P_full, atol=5e-7)

    e1, Pf, _ = jax.jit(lambda F: sym_eig(sys_, F))(F)
    e2, Pp, _ = jax.jit(lambda F: sym_eig(sys_, F, pack_n=pk))(F)
    np.testing.assert_allclose(Pp, Pf, atol=1e-9)
    np.testing.assert_allclose(e2, e1, atol=1e-9)

    cfg_pack = dataclasses.replace(
        cfg, scf=dataclasses.replace(cfg.scf, use_sp2=True, sp2_eps=1e-7,
                                     pack_orbitals=pk))
    cfg_full = dataclasses.replace(
        cfg, scf=dataclasses.replace(cfg.scf, use_sp2=True, sp2_eps=1e-7))
    f0, hf0, _ = jax.jit(lambda c: force_xl(const, tables, cfg_full, species,
                                            c, out.P))(coords)
    f1, hf1, _ = jax.jit(lambda c: force_xl(const, tables, cfg_pack, species,
                                            c, out.P))(coords)
    np.testing.assert_allclose(hf1, hf0, atol=1e-6)
    np.testing.assert_allclose(f1, f0, atol=1e-6)


def test_static_packed_sp2_matches_full():
    """SCFConfig.pack_heavy (gather-free static compact layout): packed
    SP2 agrees with the full-4A solve in f64 through the XLA path, on a
    heterogeneous batch where molecules with fewer heavies than K carry
    *interior* dead p-rows, and through the XL-BOMD force step."""
    from pyseqm_tpu.models.xlbomd import force_xl
    from pyseqm_tpu.ops.density import (packed_heavy_count, sp2,
                                        static_pack_mat, static_pack_size,
                                        static_unpack_mat)
    from pyseqm_tpu.system import make_system
    from pyseqm_tpu.utils.molecules import make_batch

    sp, co = make_batch(12, 8, jitter=0.02)      # mixed templates, K=2
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float64)
    K = packed_heavy_count(sp)
    assert K == 2
    A = species.shape[1]
    n_st = static_pack_size(K, A, multiple=16)
    assert n_st == 16

    # pack/unpack roundtrip is exact on masked matrices
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64, scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
    sys_ = jax.jit(lambda c: make_system(const, species, c))(coords)
    from pyseqm_tpu.ops.density import orbital_mask
    m = np.asarray(orbital_mask(sys_)).astype(np.float64)
    Fm = np.asarray(out.F) * m[:, :, None] * m[:, None, :]
    rt = static_unpack_mat(static_pack_mat(jnp.asarray(Fm), K, n_st), K, A)
    np.testing.assert_array_equal(np.asarray(rt), Fm)

    P_full = jax.jit(lambda F: sp2(sys_, F, 1e-7))(out.F)
    P_pack = jax.jit(lambda F: sp2(sys_, F, 1e-7, pack_heavy=K))(out.F)
    np.testing.assert_allclose(P_pack, P_full, atol=5e-7)

    from pyseqm_tpu.ops.density import sym_eig
    e1, Pf, _ = jax.jit(lambda F: sym_eig(sys_, F))(out.F)
    e2, Pp = jax.jit(
        lambda F: sym_eig(sys_, F, pack_heavy=K)[:2])(out.F)
    np.testing.assert_allclose(Pp, Pf, atol=1e-9)
    np.testing.assert_allclose(e2, e1, atol=1e-9)

    cfg_pack = dataclasses.replace(
        cfg, scf=dataclasses.replace(cfg.scf, use_sp2=True, sp2_eps=1e-7,
                                     pack_heavy=K))
    cfg_full = dataclasses.replace(
        cfg, scf=dataclasses.replace(cfg.scf, use_sp2=True, sp2_eps=1e-7))
    f0, hf0, _ = jax.jit(lambda c: force_xl(const, tables, cfg_full, species,
                                            c, out.P))(coords)
    f1, hf1, _ = jax.jit(lambda c: force_xl(const, tables, cfg_pack, species,
                                            c, out.P))(coords)
    np.testing.assert_allclose(hf1, hf0, atol=1e-6)
    np.testing.assert_allclose(f1, f0, atol=1e-6)

    # sorted-species validation: heavies must lead every molecule
    bad = np.array(sp).copy()
    bad[0] = bad[0][::-1]
    import pytest
    with pytest.raises(ValueError):
        packed_heavy_count(bad)
