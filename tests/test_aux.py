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
    const, tables, _, species, coords = _setup(golden)
    cfg = pq.SEQMConfig(method="AM1", scf=SCFConfig(eps=1.0e-6, converger=(2,)))
    md = NoseHooverDynamics(const, tables, cfg,
                            MDConfig(timestep=0.4, temperature=300.0),
                            tau=10.0)
    st = md.initialize(species, coords, key=jax.random.PRNGKey(0), Temp=300.0)
    chunk = md._build_chunk(species, 100)
    Ts = []
    for _ in range(5):
        st, obs = chunk(st)
        Ts.append(np.asarray(obs.T))
    T = np.concatenate(Ts[2:], axis=0)  # 200-step equilibration
    assert np.isfinite(T).all()
    assert np.isfinite(np.asarray(st.coordinates)).all()
    # time-averaged temperature per molecule near the 300 K target: a
    # thermostat holding 2x (or half) the setpoint fails this
    meanT = T.mean(axis=0)
    assert (np.abs(meanT - 300.0) < 75.0).all(), f"NH mean T {meanT}"


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


def test_hamiltonian_outputs(golden):
    """Hamiltonian-level outputs (F, Hcore, w) are exposed and consistent
    (cf. Hamiltonian.forward contract, basics.py:216-249): an ML-style
    consumer can rebuild Eelec = 0.5 Tr[P (Hcore + F)] from them."""
    const, tables, cfg, species, coords = _setup(golden)
    h = jax.jit(lambda c: pq.hamiltonian(const, tables, cfg, species, c))(coords)
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(coords)
    F, H, P = np.asarray(h.F), np.asarray(h.Hcore), np.asarray(h.P)
    assert F.shape == H.shape == P.shape
    np.testing.assert_allclose(F, np.swapaxes(F, -1, -2), atol=1e-12)
    Eel = 0.5 * np.sum(P * (H + F), axis=(1, 2))
    np.testing.assert_allclose(Eel, np.asarray(out.Eelec), atol=1e-9)
    # two-electron integrals ride along: gamma_AB = w.ri[..., 0] > 0 on
    # real pairs
    assert np.asarray(h.w.ri).shape[-1] == 22
    assert not bool(np.asarray(h.notconverged).any())


def test_raise_on_scf_failure(golden):
    """Opt-in raise-on-nonconvergence (cf. RAISE_ERROR_IF_SCF_FORWARD_FAILS,
    scf_loop.py:23-27); default policy still warns-and-masks."""
    from pyseqm_tpu.scf import SCFConvergenceError
    const, tables, _, species, coords = _setup(golden)
    bad_scf = SCFConfig(eps=1.0e-12, max_iter=2, converger=(0, 0.0),
                        raise_on_forward_failure=True)
    cfg = pq.SEQMConfig(method="AM1", scf=bad_scf)
    with pytest.raises(Exception) as ei:
        out = pq.energy(const, tables, cfg, species, coords)
        jax.block_until_ready(out.Hf)
    assert "SCF forward failed" in str(ei.value) or isinstance(
        ei.value, SCFConvergenceError)
    # same config without the flag: masks, does not raise
    cfg2 = pq.SEQMConfig(method="AM1", scf=SCFConfig(
        eps=1.0e-12, max_iter=2, converger=(0, 0.0)))
    out = pq.energy(const, tables, cfg2, species, coords)
    assert np.asarray(out.notconverged).any()


def test_checkpoint_mismatch_raises(tmp_path, golden):
    from pyseqm_tpu.drivers.md import MDConfig, MolecularDynamics
    from pyseqm_tpu.utils.checkpoint import load_state, save_state
    const, tables, cfg, species, coords = _setup(golden)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=0.5))
    st = md.initialize(species, coords, key=jax.random.PRNGKey(1))
    path = os.path.join(tmp_path, "ck.npz")
    save_state(path, st)
    # structurally different target -> clear error, not silent reassignment
    with pytest.raises(ValueError):
        load_state(path, {"a": np.zeros(3)})
    # same structure, different leaf shape -> clear error
    import dataclasses as dc
    bigger = dc.replace(st, coordinates=jnp.zeros((3, 7, 3)))
    with pytest.raises(ValueError, match="shape"):
        load_state(path, bigger)


def test_validate_rejects_row3():
    """Row-3 atoms are rejected unless the caller opts into the
    generated-coefficient overlap path (SEQMConfig.row3 — a capability
    the reference lacks: it always raises, diat_overlap.py:71-72).
    Full row-3 coverage lives in tests/test_row3.py."""
    with pytest.raises(ValueError, match="row3"):
        pq.system.validate(np.array([[16, 1, 1, 0]]))
    with pytest.raises(ValueError, match="row3"):
        pq.system.validate(np.array([[11, 1, 1, 1]]))


def test_md_dump_stride_and_forces(tmp_path, golden):
    """dump intervals that are not multiples of thermo still write frames;
    frames carry the reference's full column set incl. forces
    (MolecularDynamics.py:300-320)."""
    from pyseqm_tpu.drivers.md import MDConfig, MolecularDynamics
    const, tables, cfg, species, coords = _setup(golden)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=0.5))
    st = md.initialize(species, coords, key=jax.random.PRNGKey(4))
    prefix = os.path.join(tmp_path, "tr")
    # thermo=2, dump=3: boundaries at 3 (inside chunk 2) and 6
    st = md.run(species, st, steps=7, thermo=2, dump=3,
                dump_prefix=prefix, log=False)
    fn = f"{prefix}.0.xyz"
    assert os.path.exists(fn)
    lines = open(fn).read().strip().splitlines()
    natom = int(lines[0])
    nframes = len(lines) // (natom + 2)
    assert nframes == 2, f"expected 2 frames, got {nframes}"
    cols = lines[2].split()
    # symbol + 3 coords + 3 velocities + 3 forces + charge
    assert len(cols) == 11
    fx = np.array([float(c) for c in lines[2].split()[7:10]])
    assert np.isfinite(fx).all() and (np.abs(fx) > 0).any()
