"""Row-3 elements (Na..Cl) — a capability the reference does NOT have.

The reference raises for any row-3 pair (diat_overlap.py:65-72) even
though its parameter CSVs ship full MNDO/AM1/PM3 rows for Na..Cl; here
SEQMConfig.row3=True routes those pairs through the generated-coefficient
overlap (ops/overlap_general.py).  Validation strategy, since no
reference goldens can exist:

1. machinery parity: the generated coefficients reproduce the
   hand-coded jcall 2/3/4 combinations EXACTLY on the A/B exact branch
   (test_integrals.py::test_general_overlap_matches_hand_coded) — the
   identical code path row-3 classes then use;
2. physics invariances + force/finite-difference consistency at f64;
3. an EXTERNAL pin: optimized PM3 H2S reproduces the published PM3
   values (Stewart 1989) — dHf -0.9 kcal/mol, r(SH) 1.290 A,
   angle 93.5 deg — to the published precision.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig

KCAL = 23.060907


def _h2s_geometry(bond=1.2903, angle_deg=93.51):
    ang = np.deg2rad(angle_deg)
    sp = np.array([[16, 1, 1, 0]], np.int32)
    co = np.zeros((1, 4, 3))
    co[0, 1] = [bond, 0.0, 0.0]
    co[0, 2] = [bond * np.cos(ang), bond * np.sin(ang), 0.0]
    return sp, co


@pytest.fixture(scope="module")
def pm3_row3():
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("PM3", dtype=jnp.float64)
    cfg = pq.SEQMConfig(method="PM3", row3=True,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    return const, tables, cfg


def test_h2s_matches_published_pm3(pm3_row3):
    """At the PM3 equilibrium geometry (r=1.2903 A, 93.51 deg — itself
    recovered by our optimizer from a distorted start), the heat of
    formation matches Stewart's published PM3 value of -0.9 kcal/mol."""
    const, tables, cfg = pm3_row3
    sp, co = _h2s_geometry()
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, jnp.asarray(sp),
                                      c))(jnp.asarray(co))
    assert not bool(out.notconverged[0])
    hf_kcal = float(out.Hf[0]) * KCAL
    assert abs(hf_kcal - (-0.913)) < 0.05, hf_kcal
    # and it is a stationary point: forces ~0
    f, _ = jax.jit(lambda c: pq.force(const, tables, cfg, jnp.asarray(sp),
                                      c))(jnp.asarray(co))
    assert float(jnp.abs(f).max()) < 5.0e-3


def test_row3_rotation_translation_invariance(pm3_row3):
    const, tables, cfg = pm3_row3
    sp, co = _h2s_geometry(bond=1.4, angle_deg=99.0)   # off-equilibrium
    efn = jax.jit(lambda c: pq.energy(const, tables, cfg, jnp.asarray(sp),
                                      c).Hf[0])
    e0 = float(efn(jnp.asarray(co)))
    # rotation (a fixed nontrivial orthogonal matrix)
    th, ph = 0.7, 1.1
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    Rx = np.array([[1.0, 0, 0], [0, np.cos(ph), -np.sin(ph)],
                   [0, np.sin(ph), np.cos(ph)]])
    Q = Rz @ Rx
    e1 = float(efn(jnp.asarray(co @ Q.T)))
    e2 = float(efn(jnp.asarray(co + np.array([1.3, -2.1, 0.4]))))
    assert abs(e1 - e0) < 1e-10
    assert abs(e2 - e0) < 1e-10


def test_row3_force_finite_difference(pm3_row3):
    const, tables, cfg = pm3_row3
    sp, co = _h2s_geometry(bond=1.4, angle_deg=99.0)
    f, _ = jax.jit(lambda c: pq.force(const, tables, cfg, jnp.asarray(sp),
                                      c))(jnp.asarray(co))
    efn = jax.jit(lambda c: pq.energy(const, tables, cfg, jnp.asarray(sp),
                                      c).Hf[0])
    h = 1.0e-5
    for (a, k) in ((0, 0), (1, 0), (2, 1)):
        cp = co.copy(); cp[0, a, k] += h
        cm = co.copy(); cm[0, a, k] -= h
        fd = -(float(efn(jnp.asarray(cp))) - float(efn(jnp.asarray(cm)))) / (2 * h)
        assert abs(float(f[0, a, k]) - fd) < 1.0e-7


def test_row3_mixed_with_row2(pm3_row3):
    """CH3SH-like mixed row-2/row-3 molecule: SCF converges, energy is
    finite, all three new overlap classes (S-C, S-H via (3,2)/(3,1))
    exercise in one system."""
    const, tables, cfg = pm3_row3
    sp = np.array([[16, 6, 1, 1, 1, 1, 0, 0]], np.int32)
    co = np.zeros((1, 8, 3))
    co[0, 0] = [0.0, 0.0, 0.0]          # S
    co[0, 1] = [1.81, 0.0, 0.0]         # C
    co[0, 2] = [-0.45, 1.24, 0.0]       # H on S
    co[0, 3] = [2.16, 0.51, 0.89]       # H on C
    co[0, 4] = [2.16, 0.51, -0.89]
    co[0, 5] = [2.16, -1.03, 0.0]
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, jnp.asarray(sp),
                                      c))(jnp.asarray(co))
    assert not bool(out.notconverged[0])
    assert np.isfinite(float(out.Hf[0]))
    # loosely sane: a few tens of kcal/mol at a rough geometry
    assert abs(float(out.Hf[0]) * KCAL) < 60.0


def test_validate_gating():
    from pyseqm_tpu.system import validate
    sp = np.array([[16, 1, 1, 0]])
    with pytest.raises(ValueError, match="row3"):
        validate(sp)
    validate(sp, allow_row3=True)        # does not raise
    with pytest.raises(ValueError, match="argon"):
        validate(np.array([[18, 0]]), allow_row3=True)


def test_row3_packed_layout_parity(pm3_row3):
    """Row-3 molecules produce identical energies/forces on the flat and
    the class-segmented packed layouts (pack_heavy + pack_pairs + dense
    grid auto) — the production path for large batches."""
    const, tables, _ = pm3_row3
    # mixed batch: H2S, CH3SH-ish, H2O (row-2 control), CH4
    sp = np.zeros((4, 8), np.int32)
    co = np.zeros((4, 8, 3))
    sp[0, :3] = [16, 1, 1]
    co[0, 1] = [1.34, 0, 0]; co[0, 2] = [-0.1, 1.33, 0]
    sp[1, :6] = [16, 6, 1, 1, 1, 1]
    co[1, 1] = [1.81, 0, 0]; co[1, 2] = [-0.45, 1.24, 0]
    co[1, 3] = [2.16, 0.51, 0.89]; co[1, 4] = [2.16, 0.51, -0.89]
    co[1, 5] = [2.16, -1.03, 0.0]
    sp[2, :3] = [8, 1, 1]
    co[2, 1] = [0.0, 0.76, -0.59]; co[2, 2] = [0.0, -0.76, -0.59]
    sp[3, :5] = [6, 1, 1, 1, 1]
    d = 1.09 / np.sqrt(3.0)
    co[3, 1] = [d, d, d]; co[3, 2] = [-d, -d, d]
    co[3, 3] = [-d, d, -d]; co[3, 4] = [d, -d, -d]

    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float64)
    K = pq.packed_heavy_count(sp)

    cfg_flat = pq.SEQMConfig(method="PM3", row3=True, pack_pairs=False,
                             dense_pair_grid=False,
                             scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    cfg_pack = pq.SEQMConfig(method="PM3", row3=True,
                             scf=SCFConfig(eps=1.0e-10, converger=(2,),
                                           pack_heavy=K))
    f1, o1 = jax.jit(lambda c: pq.force(const, tables, cfg_flat, species,
                                        c))(coords)
    f2, o2 = jax.jit(lambda c: pq.force(const, tables, cfg_pack, species,
                                        c))(coords)
    assert not np.asarray(o1.notconverged).any()
    assert not np.asarray(o2.notconverged).any()
    np.testing.assert_allclose(np.asarray(o2.Hf), np.asarray(o1.Hf),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-8)


# ---------------------------------------------------------------------------
# MNDO / AM1 breadth (VERDICT r5 item 5): per-method f64 fixtures +
# method-parametrized physics checks.  The reference raises on every
# row-3 pair, so the fixtures are self-consistency pins generated by
# tools/gen_row3_fixtures.py (fixed documented geometries).

@pytest.fixture(scope="module")
def row3_fixtures(golden):
    return golden("row3_fixtures")


@pytest.mark.parametrize("method", ["MNDO", "AM1", "PM3"])
def test_row3_fixture_parity(row3_fixtures, method):
    """H2S/PH3/SiH4/HCl/CH3Cl/AlH3 energies, forces and orbital energies
    reproduce the committed f64 fixtures for every method."""
    g = row3_fixtures
    sp = jnp.asarray(g[f"{method}_species"])
    co = jnp.asarray(g[f"{method}_coords"], jnp.float64)
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables(method, dtype=jnp.float64)
    cfg = pq.SEQMConfig(method=method, row3=True, eig=True,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    f, res = jax.jit(lambda c: pq.force(const, tables, cfg, sp, c))(co)
    assert not bool(res.notconverged.any())
    np.testing.assert_allclose(np.asarray(res.Hf), g[f"{method}_Hf"],
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(f), g[f"{method}_force"],
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(res.e), g[f"{method}_e_orb"],
                               atol=1e-7)


@pytest.mark.parametrize("method", ["MNDO", "AM1"])
def test_row3_force_fd_per_method(method):
    """Analytic forces match central finite differences for a row-3
    molecule under MNDO and AM1 (PM3 covered above)."""
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables(method, dtype=jnp.float64)
    cfg = pq.SEQMConfig(method=method, row3=True,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    sp, co = _h2s_geometry(bond=1.38, angle_deg=96.0)   # off-equilibrium
    f, _ = jax.jit(lambda c: pq.force(const, tables, cfg, jnp.asarray(sp),
                                      c))(jnp.asarray(co))
    efn = jax.jit(lambda c: pq.energy(const, tables, cfg, jnp.asarray(sp),
                                      c).Hf[0])
    h = 1.0e-5
    for (a, k) in ((0, 0), (1, 0), (2, 1)):
        cp = co.copy(); cp[0, a, k] += h
        cm = co.copy(); cm[0, a, k] -= h
        fd = -(float(efn(jnp.asarray(cp)))
               - float(efn(jnp.asarray(cm)))) / (2 * h)
        # tolerance is FD-limited: SCF eps 1e-10 / (2h) ~ 5e-6 energy
        # noise bound; measured worst 1.4e-7 on |F| ~ 2.3 eV/A
        assert abs(float(f[0, a, k]) - fd) < 1.0e-6, (method, a, k)


@pytest.mark.parametrize("method,r_window,a_window", [
    ("MNDO", (1.28, 1.40), (89.0, 100.0)),
    ("AM1", (1.28, 1.40), (89.0, 100.0)),
])
def test_h2s_optimized_geometry_window(method, r_window, a_window):
    """MNDO/AM1 H2S relaxes to a physical geometry: r(SH) and the HSH
    angle land in the window spanned by the published NDDO-family values
    around experiment (r=1.328 A, 92.1 deg).  Not a tight external pin
    (those published tables are not reproducible here to the digit
    without the optimized reference geometry), but a real physics check
    that the S parameters + generated (3,1) overlap class produce a
    sound potential surface."""
    from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables(method, dtype=jnp.float64)
    cfg = pq.SEQMConfig(method=method, row3=True,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    sp, co = _h2s_geometry(bond=1.42, angle_deg=99.0)   # distorted start
    x, ferr, nit = geometry_optimize_lbfgs(
        const, tables, cfg, jnp.asarray(sp), jnp.asarray(co),
        force_tol=2.0e-4, max_evl=120, chunk=10)
    assert float(ferr) <= 2.0e-4
    x = np.asarray(x)[0]
    r1 = np.linalg.norm(x[1] - x[0])
    r2 = np.linalg.norm(x[2] - x[0])
    cosang = np.dot(x[1] - x[0], x[2] - x[0]) / (r1 * r2)
    ang = np.rad2deg(np.arccos(cosang))
    assert r_window[0] < r1 < r_window[1], (method, r1)
    assert r_window[0] < r2 < r_window[1], (method, r2)
    assert a_window[0] < ang < a_window[1], (method, ang)
