"""Molecular dynamics drivers: deterministic trajectory parity vs the
reference (zero initial velocities), conservation behavior, thermostats,
and geometry optimization."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.md import (LangevinDynamics, MDConfig,
                                   MolecularDynamics, kinetic_energy,
                                   zero_com, initialize_velocity)
from pyseqm_tpu.drivers.xlbomd import XLBOMD
from pyseqm_tpu.scf import SCFConfig


def _setup(golden, method="AM1"):
    g = golden(f"{method.lower()}_md")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables(method, dtype=jnp.float64)
    species = jnp.asarray(g["species"], dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"], dtype=jnp.float64) * 1.03
    cfg = pq.SEQMConfig(method=method,
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    return g, const, tables, cfg, species, coords


# AM1 pins a 25-step horizon (integrator drift), MNDO/PM3 5 steps
@pytest.mark.parametrize("method,steps",
                         [("AM1", 25), ("MNDO", 5), ("PM3", 5)])
def test_nve_trajectory_parity(golden, method, steps):
    g, const, tables, cfg, species, coords = _setup(golden, method)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=1.0))
    state = md.initialize(species, coords,
                          velocities=jnp.zeros_like(coords))
    state = md.run(species, state, steps=steps, thermo=steps, log=False)
    np.testing.assert_allclose(np.asarray(state.coordinates),
                               g["nve_coords"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.velocities),
                               g["nve_vel"], atol=1e-7)


@pytest.mark.parametrize("method", ["AM1", "MNDO", "PM3"])
def test_xlbomd_trajectory_parity(golden, method):
    g, const, tables, cfg, species, coords = _setup(golden, method)
    md = XLBOMD(const, tables, cfg, MDConfig(timestep=1.0), k=5)
    state = md.initialize(species, coords,
                          velocities=jnp.zeros_like(coords))
    state = md.run(species, state, steps=5, thermo=5, log=False)
    np.testing.assert_allclose(np.asarray(state.coordinates),
                               g["xl_coords"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.velocities),
                               g["xl_vel"], atol=1e-7)


def test_xlbomd_packed_state_parity(golden):
    """pack_heavy holds the XL electronic history (P/D/Pt) in the static
    compact-orbital layout; the trajectory and observables must match the
    full-layout path exactly up to roundoff.  Uses the molsize-8 bench
    batch so the packed size (16) is genuinely smaller than 4A (32)."""
    from pyseqm_tpu.utils.molecules import make_batch
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    cfg = pq.SEQMConfig(method="AM1",
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    sp, co = make_batch(6, 8, jitter=0.02)
    species = jnp.asarray(sp, dtype=jnp.int32)
    coords = jnp.asarray(co, dtype=jnp.float64)
    md_full = XLBOMD(const, tables, cfg, MDConfig(timestep=1.0), k=5)
    cfg_p = dataclasses.replace(
        cfg, scf=dataclasses.replace(
            cfg.scf, pack_heavy=pq.packed_heavy_count(species)))
    md_pack = XLBOMD(const, tables, cfg_p, MDConfig(timestep=1.0), k=5)

    sf = md_full.initialize(species, coords,
                            velocities=jnp.zeros_like(coords))
    sp_ = md_pack.initialize(species, coords,
                             velocities=jnp.zeros_like(coords))
    A = species.shape[1]
    assert sp_.Pt.shape[-1] < 4 * A  # actually packed
    for _ in range(5):
        sf, of = md_full.step(species, sf)
        sp_, op = md_pack.step(species, sp_)
    np.testing.assert_allclose(np.asarray(sp_.coordinates),
                               np.asarray(sf.coordinates), atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.charges),
                               np.asarray(of.charges), atol=1e-10)
    np.testing.assert_allclose(np.asarray(op.Epot),
                               np.asarray(of.Epot), atol=1e-10)
    from pyseqm_tpu.ops.density import static_unpack_mat
    Pu = static_unpack_mat(sp_.P, cfg_p.scf.pack_heavy, A)
    np.testing.assert_allclose(np.asarray(Pu), np.asarray(sf.P), atol=1e-10)


def test_nve_energy_conservation(golden):
    g, const, tables, cfg, species, coords = _setup(golden)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=0.2))
    key = jax.random.PRNGKey(42)
    state = md.initialize(species, coords, key=key, Temp=300.0)
    Ek0, _ = kinetic_energy(const, species, state.velocities)
    e0 = np.asarray(state.E0)
    chunk = md._build_chunk(species, 20)
    state, obs = chunk(state)
    etot = np.asarray(obs.Ek + obs.Epot)
    assert np.isfinite(etot).all()
    drift = np.abs(etot - e0[None, :]).max()
    assert drift < 5e-3, f"energy drift {drift}"


def test_langevin_and_thermostats(golden):
    g, const, tables, _, species, coords = _setup(golden)
    # long-run temperature statistics: mean T over the sampled tail must
    # sit near the 300 K target (a thermostat at 2x target must fail here)
    cfg = pq.SEQMConfig(method="AM1", scf=SCFConfig(eps=1.0e-6, converger=(2,)))
    md = LangevinDynamics(const, tables, cfg,
                          MDConfig(timestep=0.5, damp=10.0, temperature=300.0))
    state = md.initialize(species, coords, key=jax.random.PRNGKey(1), Temp=300.0)
    chunk = md._build_chunk(species, 100)
    Ts = []
    for _ in range(6):
        state, obs = chunk(state)
        Ts.append(np.asarray(obs.T))
    T = np.concatenate(Ts[2:], axis=0)  # discard 200-step equilibration
    assert np.isfinite(T).all()
    assert np.isfinite(np.asarray(state.coordinates)).all()
    meanT = T.mean()
    assert abs(meanT - 300.0) < 45.0, f"Langevin mean T {meanT:.1f} K"

    # velocity-rescale thermostat drives T toward the target
    md2 = MolecularDynamics(const, tables, cfg,
                            MDConfig(timestep=0.5, scale_vel=(1, 200.0)))
    st2 = md2.initialize(species, coords, key=jax.random.PRNGKey(2), Temp=500.0)
    chunk2 = md2._build_chunk(species, 5)
    st2, obs2 = chunk2(st2)
    np.testing.assert_allclose(np.asarray(obs2.T[-1]), 200.0, rtol=1e-6)


def test_zero_com(golden):
    g, const, tables, cfg, species, coords = _setup(golden)
    v = initialize_velocity(const, species, coords, jax.random.PRNGKey(3),
                            Temp=300.0, vel_com=False)
    x2, v2 = zero_com(const, species, coords, v)
    mass = np.asarray(const.mass)[np.asarray(species)]
    mass[np.asarray(species) == 0] = 0.0
    mom = (mass[..., None] * np.asarray(v2)).sum(axis=1)
    np.testing.assert_allclose(mom, 0.0, atol=1e-12)
    L = (mass[..., None] * np.cross(np.asarray(x2), np.asarray(v2))).sum(axis=1)
    np.testing.assert_allclose(L, 0.0, atol=1e-12)
    # temperature preserved
    _, T0 = kinetic_energy(const, species, v)
    _, T1 = kinetic_energy(const, species, v2)
    np.testing.assert_allclose(np.asarray(T1), np.asarray(T0), rtol=1e-10)


def test_geometry_optimization(golden):
    from pyseqm_tpu.drivers.opt import geometry_optimize_sd
    g, const, tables, cfg, species, coords = _setup(golden)
    x, ferr, eerr = geometry_optimize_sd(
        const, tables, cfg, species, coords, alpha=0.003, force_tol=1e-2,
        max_evl=300)
    assert float(ferr) <= 1e-2


def test_geometry_optimization_chunked_parity(golden):
    """Scan-chunked SD / L-BFGS (one dispatch per chunk, on-device
    convergence freeze) reproduce the per-iteration host loops exactly
    at f64 — same trajectory, same iteration count."""
    from pyseqm_tpu.drivers.opt import (geometry_optimize_lbfgs,
                                        geometry_optimize_sd)
    g, const, tables, cfg, species, coords = _setup(golden)
    xa, fa, _ = geometry_optimize_sd(
        const, tables, cfg, species, coords, alpha=0.004, force_tol=0.0,
        max_evl=12)
    xb, fb, _ = geometry_optimize_sd(
        const, tables, cfg, species, coords, alpha=0.004, force_tol=0.0,
        max_evl=12, chunk=4)
    np.testing.assert_allclose(np.asarray(xb), np.asarray(xa), atol=1e-12)
    np.testing.assert_allclose(float(fb), float(fa), atol=1e-12)

    # chunk>0 now selects the warm-start batched L-BFGS (per-molecule
    # Armijo backtracking + converged-P threading) — a different
    # algorithm from the optax zoom host loop, so assert both reach the
    # same minimum rather than the same trajectory
    from pyseqm_tpu.models.energy import energy
    xl, fl, il = geometry_optimize_lbfgs(
        const, tables, cfg, species, coords, force_tol=1e-4, max_evl=60)
    xm, fm, im = geometry_optimize_lbfgs(
        const, tables, cfg, species, coords, force_tol=1e-4, max_evl=60,
        chunk=10)
    assert float(fl) <= 1e-4
    assert float(fm) <= 1e-4
    El = energy(const, tables, cfg, species, xl).Hf
    Em = energy(const, tables, cfg, species, xm).Hf
    np.testing.assert_allclose(np.asarray(Em), np.asarray(El), atol=1e-8)


def _setup_charged(golden):
    g = golden("am1_charged")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"], dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"], dtype=jnp.float64)
    charges = jnp.asarray(g["charges"], dtype=jnp.int32)
    cfg = pq.SEQMConfig(method="AM1",
                        scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    return g, const, tables, cfg, species, coords, charges


def test_charged_energy_force_parity(golden):
    """Ions (H3O+/NH4+/OH-): single-point energies and forces with net
    charges match the reference (charges kwarg, basics.py:69-71)."""
    from pyseqm_tpu.models.energy import force
    g, const, tables, cfg, species, coords, charges = _setup_charged(golden)
    f, out = jax.jit(lambda c: force(const, tables, cfg, species, c,
                                     charges=charges))(coords)
    np.testing.assert_allclose(np.asarray(out.Hf), g["Hf"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.Etot), g["Etot"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(f), g["force"], atol=1e-6)
    # without charges the same species are odd-electron: the entry check
    # mirrors the reference Parser raise (basics.py:73-74)
    with pytest.raises(ValueError, match="closed-shell"):
        force(const, tables, cfg, species, coords)


def test_charged_nve_trajectory_parity(golden):
    """Ionic NVE MD: net charges thread through the dynamics driver
    (cf. reference MolecularDynamics.py:335 kwargs pass-through)."""
    g, const, tables, cfg, species, coords, charges = _setup_charged(golden)
    md = MolecularDynamics(const, tables, cfg, MDConfig(timestep=1.0),
                           charges=charges)
    state = md.initialize(species, coords * 1.03,
                          velocities=jnp.zeros_like(coords))
    state = md.run(species, state, steps=5, thermo=5, log=False)
    np.testing.assert_allclose(np.asarray(state.coordinates),
                               g["nve_coords"], atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.velocities),
                               g["nve_vel"], atol=1e-7)


def test_charged_geometry_optimization(golden):
    """Ionic geometry optimization: charges thread through the warm
    L-BFGS driver; hydronium/ammonium/hydroxide relax to max|F|<=1e-3."""
    from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
    from pyseqm_tpu.models.energy import energy
    g, const, tables, cfg, species, coords, charges = _setup_charged(golden)
    x, ferr, nit = geometry_optimize_lbfgs(
        const, tables, cfg, species, coords * 1.05, force_tol=1e-3,
        max_evl=80, chunk=10, charges=charges)
    assert float(ferr) <= 1e-3
    E0 = energy(const, tables, cfg, species, coords * 1.05,
                charges=charges).Hf
    E1 = energy(const, tables, cfg, species, x, charges=charges).Hf
    assert bool(jnp.all(E1 <= E0 + 1e-10))
