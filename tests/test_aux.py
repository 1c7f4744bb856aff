"""Auxiliary subsystems: Nose-Hoover NVT, degeneracy-aware occupations,
checkpoint/resume round-trip, sanitizers, compat shim, xyz IO."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig


def _setup(golden):
    g = golden("am1_md")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"], dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"], dtype=jnp.float64) * 1.03
    cfg = pq.SEQMConfig(method="AM1", scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    return const, tables, cfg, species, coords


def test_nose_hoover_nvt(golden):
    from pyseqm_tpu.drivers.md import MDConfig, NoseHooverDynamics
    const, tables, cfg, species, coords = _setup(golden)
    md = NoseHooverDynamics(const, tables, cfg,
                            MDConfig(timestep=0.4, temperature=300.0),
                            tau=10.0)
    st = md.initialize(species, coords, key=jax.random.PRNGKey(0), Temp=300.0)
    chunk = md._build_chunk(species, 15)
    st, obs = chunk(st)
    T = np.asarray(obs.T)
    assert np.isfinite(T).all()
    assert (T > 50).all() and (T < 1200).all()
    assert np.isfinite(np.asarray(st.coordinates)).all()


def test_checkpoint_roundtrip(tmp_path, golden):
    from pyseqm_tpu.drivers.md import MDConfig, MolecularDynamics
    from pyseqm_tpu.utils.checkpoint import load_state, save_state
    const, tables, cfg, species, coords = _setup(golden)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=0.5))
    st = md.initialize(species, coords, key=jax.random.PRNGKey(1))
    path = os.path.join(tmp_path, "ck.npz")
    save_state(path, st)
    st2 = load_state(path, st)
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resumed trajectory identical to uninterrupted one
    chunk = md._build_chunk(species, 3)
    s_direct, _ = chunk(st)
    s_resumed, _ = chunk(st2)
    np.testing.assert_allclose(np.asarray(s_direct.coordinates),
                               np.asarray(s_resumed.coordinates), atol=0)


def test_degenerate_occupations():
    from pyseqm_tpu.ops.density import _occupations
    e = jnp.asarray([[-2.0, -1.0, -1.0, -1.0, 3.0, 9.0]])
    nocc = jnp.asarray([2])
    occ = _occupations(e, nocc, jnp.float64, check_degeneracy=True)
    # 1 electron pair over 3 degenerate levels after the first
    np.testing.assert_allclose(np.asarray(occ)[0],
                               [1.0, 1 / 3, 1 / 3, 1 / 3, 0.0, 0.0])
    # trace preserved
    assert abs(float(occ.sum()) - 2.0) < 1e-12
    # no degeneracy -> standard aufbau
    occ2 = _occupations(jnp.asarray([[-2.0, -1.0, 0.0, 1.0, 2.0, 3.0]]),
                        nocc, jnp.float64, check_degeneracy=True)
    np.testing.assert_allclose(np.asarray(occ2)[0], [1, 1, 0, 0, 0, 0])


def test_sanitizer():
    from pyseqm_tpu.utils.check import check, check_gradient
    x = jnp.asarray([1.0, 2.0])
    assert np.allclose(np.asarray(check(x, "ok")), [1.0, 2.0])
    with pytest.raises(FloatingPointError):
        jax.block_until_ready(check(jnp.asarray([1.0, jnp.nan]), "bad"))
    g = jax.grad(lambda x: jnp.sum(check_gradient(x, "t") ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_compat_shim():
    from pyseqm_tpu.compat import from_seqm_parameters
    cfg = from_seqm_parameters({
        "method": "PM3", "scf_eps": 1e-6, "scf_converger": [0, 0.3],
        "sp2": [True, 1e-5], "elements": [0, 1, 6, 8], "learned": [],
        "pair_outer_cutoff": 10.0, "eig": True, "scf_backward": 2,
    })
    assert cfg.method == "PM3"
    assert cfg.scf.converger == (0, 0.3)
    assert cfg.scf.use_sp2 and cfg.scf.sp2_eps == 1e-5
    assert cfg.eig and cfg.scf.backward == 2
    assert cfg.pair_outer_cutoff == 10.0


def test_xyz_io(tmp_path):
    from pyseqm_tpu.utils.io import read_xyz
    p = os.path.join(tmp_path, "m.xyz")
    with open(p, "w") as f:
        f.write("3\ncomment\nO 0 0 0.1\nH 0 0.75 -0.4\nH 0 -0.75 -0.4\n")
    z, x = read_xyz(p)
    assert list(z) == [8, 1, 1]
    assert x.shape == (3, 3)


def test_on_axis_pair_force_finite():
    """Bonds exactly along z hit the frame-rotation pole; gradients must
    stay finite (guarded sqrt in frame_matrix)."""
    from pyseqm_tpu.utils.molecules import make_batch
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    cfg = pq.SEQMConfig(method="AM1", scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    sp, co = make_batch(1, molsize=8, names=["C2H6"])  # C-C along z
    f, out = jax.jit(lambda s, c: pq.force(const, tables, cfg, s, c))(
        jnp.asarray(sp), jnp.asarray(co, jnp.float64))
    assert np.isfinite(np.asarray(f)).all()


def test_net_charge(golden):
    """Net molecular charge (reference tests/test.py charges kwarg):
    H3O+ runs closed-shell and differs from neutral-ish references."""
    const, tables, cfg, _, _ = _setup(golden)
    species = jnp.asarray([[8, 1, 1, 1]], dtype=jnp.int32)
    coords = jnp.asarray([[[0.0, 0.0, 0.0], [0.0, 0.94, -0.25],
                           [0.82, -0.47, -0.25], [-0.82, -0.47, -0.25]]],
                         dtype=jnp.float64)
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c,
                                      charges=jnp.asarray([1])))(coords)
    assert not bool(out.notconverged[0])
    sys_ = pq.make_system(const, species, coords, jnp.asarray([1]))
    assert int(sys_.nocc[0]) == 4  # 8 electrons, closed shell
    assert np.isfinite(float(out.Hf[0]))
    # validate() flags the odd-electron neutral radical
    with pytest.raises(ValueError):
        pq.system.validate(np.asarray(species))


def test_converger_consistency(golden):
    """All three convergers reach the same fixed point (f64)."""
    const, tables, _, species, coords = _setup(golden)
    hfs = []
    for conv in ((0, 0.0), (1,), (2,)):
        cfg = pq.SEQMConfig(method="AM1",
                            scf=SCFConfig(eps=1.0e-10, converger=conv))
        out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
        assert not np.asarray(out.notconverged).any()
        hfs.append(np.asarray(out.Hf))
    np.testing.assert_allclose(hfs[0], hfs[2], atol=1e-8)
    np.testing.assert_allclose(hfs[1], hfs[2], atol=1e-8)
