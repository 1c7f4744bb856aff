"""The reference's shipped trained HIP-NN parameter model (models/hipnn.py).

The fixture params/hipnn_pm3.npz is extracted offline from the reference's
examples/model/model.pt by tools/extract_hipnn.py (the gen_golden.py
pattern).  hippynn itself is unavailable, so parity with hippynn's forward
cannot be asserted bit-for-bit; these tests pin the physics contract
instead: predictions are trained-base + small environment corrections,
equivariant under permutation/translation/rotation, local beyond the 6 A
cutoff, and drive the full PM3 SCF + force path stably (the reference's
production workflow, examples/test.py:26-41).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.models.hipnn import (load_hipnn, make_hipnn_callable,
                                     predict_seqm_parameters)
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


@pytest.fixture(scope="module")
def model():
    return load_hipnn(dtype=jnp.float64)


@pytest.fixture(scope="module")
def geom():
    sp, co = make_batch(6, 8, jitter=0.02, seed=11)
    return jnp.asarray(sp), jnp.asarray(co, jnp.float64)


def test_predictions_near_trained_base(model, geom):
    """Environment corrections are small relative to the trained
    per-element base table (HCharge head norms ~0.05-0.1)."""
    w, meta = model
    species, coords = geom
    pars = jax.jit(lambda c: predict_seqm_parameters(w, meta, species, c))(coords)
    assert sorted(pars) == sorted(meta["learned"])
    base = np.asarray(w["seqm_p"])
    for i, name in enumerate(meta["learned"]):
        v = np.asarray(pars[name])
        b = base[np.asarray(species), i]
        m = np.asarray(species > 0)
        assert np.isfinite(v).all()
        # padding atoms predict exactly zero
        np.testing.assert_array_equal(v[~m], 0.0)
        # corrections bounded by a few eV (unit weight is 27.2 eV/Hartree)
        assert np.abs(v[m] - b[m]).max() < 5.0, name


def test_equivariance(model, geom):
    w, meta = model
    species, coords = geom
    f = jax.jit(lambda s, c: predict_seqm_parameters(w, meta, s, c))
    p0 = f(species, coords)

    # translation
    p_t = f(species, coords + jnp.asarray([3.0, -1.0, 0.5]))
    # rotation (90 deg about z)
    R = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    coords.dtype)
    p_r = f(species, coords @ R.T)
    # atom permutation within molecule 0: swap slots 1 and 2
    perm = np.arange(species.shape[1])
    perm[1], perm[2] = 2, 1
    p_p = f(species[:, perm], coords[:, perm])

    for name in meta["learned"]:
        np.testing.assert_allclose(p_t[name], p0[name], atol=1e-10)
        np.testing.assert_allclose(p_r[name], p0[name], atol=1e-10)
        np.testing.assert_allclose(p_p[name], p0[name][:, perm], atol=1e-10)


def test_locality_cutoff(model):
    """Atoms farther than the 6 A hard cutoff do not interact: moving a
    remote water does not change the first molecule's parameters."""
    w, meta = model
    sp = np.zeros((1, 6), np.int64)
    co = np.zeros((1, 6, 3))
    sp[0, :3] = [8, 1, 1]
    co[0, 1] = [0.96, 0.0, 0.0]
    co[0, 2] = [-0.24, 0.93, 0.0]
    sp[0, 3:] = [8, 1, 1]
    co[0, 3:] = co[0, :3] + np.asarray([20.0, 0.0, 0.0])
    species = jnp.asarray(sp)
    f = jax.jit(lambda c: predict_seqm_parameters(w, meta, species, c))
    p0 = f(jnp.asarray(co))
    co2 = co.copy()
    co2[0, 3:] += np.asarray([5.0, 2.0, 1.0])   # still > 6 A away
    p1 = f(jnp.asarray(co2))
    for name in meta["learned"]:
        np.testing.assert_allclose(p1[name][0, :3], p0[name][0, :3],
                                   atol=1e-12)


def test_drives_pm3_scf_and_forces(model):
    """The production workflow: trained parameters through full SCF +
    analytic forces, converging for organics (cf. examples/test.py)."""
    learned = make_hipnn_callable(dtype=jnp.float64)
    const, tables, cfg = pq.build(
        "PM3", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-8, converger=(2,), max_iter=300))
    sp, co = make_batch(4, 8, jitter=0.02, seed=13)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float64)
    frc, out = jax.jit(
        lambda c: pq.force(const, tables, cfg, species, c, learned=learned)
    )(coords)
    assert int(out.notconverged.sum()) == 0
    assert np.isfinite(np.asarray(frc)).all()
    # Hf lands in a physical window (trained model shifts vs the table)
    assert np.abs(np.asarray(out.Hf)).max() < 20.0
    # forces sum to ~zero per molecule (translation invariance through SCF)
    np.testing.assert_allclose(
        np.asarray(frc).sum(axis=1), 0.0, atol=1e-6)


def test_torch_replay_parity():
    """Pin the JAX forward to the reference artifact (VERDICT r3 #3).

    tools/replay_hipnn.py re-executes the pickled GraphModule's exact
    computation (wiring + layer classes + trained tensors all read from
    examples/model/model.pt; structure asserted by verify_structure) in
    float64 torch with flat pair lists + index_add — structurally
    independent of the JAX dense-grid implementation.  Every feature
    level, every hierarchical-head term, and the final per-atom PM3
    parameters must match at float64 to ~1e-6 relative."""
    from pyseqm_tpu.models.hipnn import hipnn_features

    d = np.load("tests/golden/hipnn_replay.npz")
    species = jnp.asarray(d["species"])
    coords = jnp.asarray(d["coords"], jnp.float64)
    w, meta = load_hipnn(dtype=jnp.float64)
    mask = np.asarray(species > 0)

    levels = jax.jit(lambda c: hipnn_features(w, meta, species, c))(coords)
    for li in range(3):
        got = np.asarray(levels[li])[mask]
        ref = d[f"level{li}"][mask]
        scale = max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, atol=1e-9 * scale, rtol=1e-9,
                                   err_msg=f"level{li}")
        head = np.asarray(levels[li] @ w[f"head{li}_w"].T
                          + w[f"head{li}_b"])[mask]
        np.testing.assert_allclose(head, d[f"head{li}"][mask],
                                   atol=1e-9, rtol=1e-7,
                                   err_msg=f"head{li}")

    pars = jax.jit(lambda c: predict_seqm_parameters(w, meta, species,
                                                     c))(coords)
    learned = list(meta["learned"])
    ref_par = d["params"]
    for i, name in enumerate(learned):
        got = np.asarray(pars[name])[mask]
        np.testing.assert_allclose(got, ref_par[..., i][mask],
                                   atol=1e-6, rtol=1e-9, err_msg=name)
