"""Born-Oppenheimer molecular dynamics: NVE + thermostats.

Rebuild of seqm/MolecularDynamics.py:158-432 as functional, scan-compiled
dynamics: the per-step work (velocity Verlet around an SCF force call,
thermostat transforms, observables) is one pure ``step`` function; ``run``
drives chunks of ``lax.scan`` and performs host I/O (thermo lines, xyz
dumps) between chunks — the TPU-friendly replacement for the reference's
per-step Python loop with inline printing.

Units: Angstrom, fs, eV, g/mol, Kelvin (same as reference).
"""
from __future__ import annotations

import dataclasses
import types
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..constants import Constants
from ..scf import SCFConfig
from ..models.energy import SEQMConfig, energy
from ..utils import io as xyz_io

# Unit conversions (derivations in the reference's appendix,
# MolecularDynamics.py:438-490):
# 1 (eV/Angstrom)/(g/mol) = 0.009648... Angstrom/fs^2
ACC_SCALE = 0.009648532800137615
# sqrt(Kelvin / (g/mol)) = 0.000911836... Angstrom/fs
VEL_SCALE = 0.9118367323190634e-3
# (g/mol) (Angstrom/fs)^2 = 103.64... eV
KE_SCALE = 1.0364270099032438e2
# sqrt(Kelvin * (g/mol)) / fs = 0.0945... eV/Angstrom (Langevin random force)
FR_SCALE = 0.09450522179973914
# 1 eV = 11604.5 Kelvin
EV_PER_KELVIN = 1.160451812e4


def atom_masses(const: Constants, species):
    """(..., 1) masses for F/m; padding gets mass 1 to keep acc finite
    (cf. MASS[0]=1.0, MolecularDynamics.py:337-340)."""
    m = const.mass[species]
    return jnp.where(species > 0, m, 1.0)[..., None]


def atom_masses_zero_pad(const: Constants, species):
    """(..., 1) masses with 0 for padding — used for kinetic energy, COM
    and inertia sums (const.mass[0] == 0 in the reference)."""
    return const.mass[species][..., None]


def kinetic_energy(const: Constants, species, velocities):
    """(Ek [eV], T [K]) per molecule (cf. MolecularDynamics.py:229-233)."""
    mass = atom_masses_zero_pad(const, species)
    Ek = jnp.sum(0.5 * mass * velocities ** 2, axis=(1, 2)) * KE_SCALE
    ndof = 1.5 * jnp.sum(species > 0, axis=1).astype(Ek.dtype)
    return Ek, Ek * EV_PER_KELVIN / ndof


def initialize_velocity(const: Constants, species, coordinates, key,
                        Temp=300.0, vel_com=True):
    """Maxwell-Boltzmann velocities at Temp (cf. MolecularDynamics.py:181)."""
    mass = atom_masses(const, species)
    scale = jnp.sqrt(Temp / mass) * VEL_SCALE
    v = jax.random.normal(key, coordinates.shape, coordinates.dtype) * scale
    v = jnp.where((species > 0)[..., None], v, 0.0)
    if vel_com:
        _, v = zero_com(const, species, coordinates, v)
    return v


def zero_com(const: Constants, species, coordinates, velocities):
    """Remove COM position/velocity and rigid-body angular momentum, then
    rescale to conserve temperature (cf. MolecularDynamics.py:195-227)."""
    mass = atom_masses_zero_pad(const, species)
    Mtot = jnp.sum(mass, axis=1, keepdims=True)
    _, T0 = kinetic_energy(const, species, velocities)

    r_com = jnp.sum(mass * coordinates, axis=1, keepdims=True) / Mtot
    x = coordinates - r_com
    v_com = jnp.sum(mass * velocities, axis=1, keepdims=True) / Mtot
    v = velocities - v_com

    L = jnp.sum(mass * jnp.cross(x, v), axis=1)
    r2 = jnp.sum(x * x, axis=-1, keepdims=True)
    eye = jnp.eye(3, dtype=x.dtype)
    inertia = (jnp.sum(mass[..., None] * r2[..., None] * eye, axis=1)
               - jnp.sum(mass[..., None] * x[..., :, None] * x[..., None, :], axis=1))
    omega = jnp.linalg.solve(inertia, L[..., None])[..., 0]
    v = v + jnp.cross(x, jnp.broadcast_to(omega[:, None, :], x.shape))
    _, T1 = kinetic_energy(const, species, v)
    alpha = jnp.sqrt(T0 / jnp.where(T1 > 0, T1, 1.0))
    v = v * alpha[:, None, None]
    v = jnp.where((species > 0)[..., None], v, 0.0)
    return x, v


@dataclasses.dataclass(frozen=True)
class MDConfig:
    timestep: float = 1.0               # fs
    # thermostat: None | ("scale_vel", freq, T0) | ("energy_shift",)
    scale_vel: Optional[Tuple[int, float]] = None
    control_energy_shift: bool = False
    remove_com: Optional[int] = None    # every N steps
    # Langevin
    damp: float = 1.0                   # fs
    temperature: float = 300.0          # K


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MDState:
    """Serializable MD state pytree — (coords, vel, acc, P, E0, key, step)
    make checkpoint/resume first-class (the reference threads these through
    run() by hand)."""
    coordinates: jnp.ndarray
    velocities: jnp.ndarray
    acc: jnp.ndarray
    P: jnp.ndarray                     # converged density (next-step SCF guess)
    E0: jnp.ndarray                    # initial total energy (drift control)
    key: jnp.ndarray
    step: jnp.ndarray


class Observables(NamedTuple):
    Ek: jnp.ndarray
    T: jnp.ndarray
    Epot: jnp.ndarray
    dipole: jnp.ndarray
    charges: jnp.ndarray


def atomic_charges(const: Constants, species, P):
    """Mulliken charges from the density diagonal (MolecularDynamics.py:275)."""
    nmol, A = species.shape
    q_el = jnp.diagonal(P, axis1=1, axis2=2).reshape(nmol, A, 4).sum(axis=2)
    return const.tore[species] - q_el


def atomic_charges_packed(const: Constants, species, Pp, K: int):
    """Mulliken charges from a static-packed density (ops/density.py
    static_pack_mat layout: atoms [0, K) keep their 4-orbital block, every
    later atom slot keeps only its s orbital)."""
    nmol, A = species.shape
    d = jnp.diagonal(Pp, axis1=1, axis2=2)
    heavy = d[:, :4 * K].reshape(nmol, K, 4).sum(axis=2)
    q_el = jnp.concatenate([heavy, d[:, 4 * K:4 * K + (A - K)]], axis=1)
    return const.tore[species] - q_el


def dipole(q, coordinates):
    return jnp.sum(q[..., None] * coordinates, axis=1)


class MolecularDynamics:
    """NVE velocity-Verlet driver (cf. Molecular_Dynamics_Basic)."""

    def __init__(self, const: Constants, tables, seqm_cfg: SEQMConfig,
                 md_cfg: MDConfig = MDConfig(), learned=None, timing=None,
                 charges=None):
        self.const = const
        self.tables = tables
        self.seqm_cfg = seqm_cfg
        self.md_cfg = md_cfg
        self.learned = learned
        self._chunk_fn = None
        # net molecular charges (nmol,), threaded into every energy/force
        # evaluation (the reference forwards a `charges` kwarg from its
        # drivers into Energy/Parser, MolecularDynamics.py:335 ->
        # basics.py:69-71, so ionic MD works)
        self.charges = None if charges is None else jnp.asarray(charges)
        # opt-in phase wall-clock accounting (cf. Constants.do_timing,
        # reference constants.py:133-140): pass a utils.timing.Timing()
        self.timing = timing

    def _charges_arg(self, charges):
        return self.charges if charges is None else charges

    # -- force model ---------------------------------------------------
    def compute_force(self, species, state: MDState, charges=None):
        """(force, P, Epot-per-mol).  Override for thermo-/bias-forces."""
        charges = self._charges_arg(charges)

        def loss(coords):
            out = energy(self.const, self.tables, self.seqm_cfg, species,
                         coords, learned=self.learned, P0=state.P,
                         charges=charges)
            return jnp.sum(out.Hf), out

        g, out = jax.grad(loss, has_aux=True)(state.coordinates)
        return -g, out.P, out.Hf

    # -- one velocity-Verlet step --------------------------------------
    def step(self, species, state: MDState,
             charges=None) -> Tuple[MDState, Observables]:
        dt = self.md_cfg.timestep
        mass = atom_masses(self.const, species)

        v = state.velocities + 0.5 * state.acc * dt
        x = state.coordinates + v * dt
        st1 = dataclasses.replace(state, coordinates=x, velocities=v)
        force, P, Epot = self.compute_force(species, st1,
                                            self._charges_arg(charges))
        acc = force / mass * ACC_SCALE
        v = v + 0.5 * acc * dt
        state = dataclasses.replace(
            state, coordinates=x, velocities=v, acc=acc,
            P=jax.lax.stop_gradient(P), step=state.step + 1)

        state = self._thermostat(species, state, Epot)
        Ek, T = kinetic_energy(self.const, species, state.velocities)
        q = atomic_charges(self.const, species, state.P)
        obs = Observables(Ek, T, Epot, dipole(q, state.coordinates), q)
        return state, obs

    def _thermostat(self, species, state: MDState, Epot):
        cfg = self.md_cfg
        if cfg.scale_vel is not None and cfg.control_energy_shift:
            raise ValueError("cannot fix temperature and energy shift together")
        if cfg.scale_vel is not None:
            freq, T0 = cfg.scale_vel
            _, T = kinetic_energy(self.const, species, state.velocities)
            alpha = jnp.sqrt(T0 / jnp.where(T > 0, T, 1.0))
            do = (state.step % freq) == 0
            v = jnp.where(do, state.velocities * alpha[:, None, None],
                          state.velocities)
            state = dataclasses.replace(state, velocities=v)
        if cfg.control_energy_shift:
            Ek, _ = kinetic_energy(self.const, species, state.velocities)
            shift = Ek + Epot - state.E0
            ratio = (Ek - shift) / jnp.where(Ek > 0, Ek, 1.0)
            alpha = jnp.sqrt(jnp.maximum(ratio, 0.0))
            alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
            state = dataclasses.replace(
                state, velocities=state.velocities * alpha[:, None, None])
        return state

    # -- initialization ------------------------------------------------
    def initialize(self, species, coordinates, velocities=None, key=None,
                   Temp=300.0) -> MDState:
        """Build the initial MDState (velocities, bootstrap SCF force).

        Runs as ONE jitted program: eager dispatch costs ~0.5 s/op
        through the remote-TPU tunnel, which made the bootstrap SCF take
        ~10 minutes at 512 molecules (the r3 bomd-bench 50-min timeout
        was entirely this)."""
        from ..models.energy import check_species
        check_species(self.seqm_cfg, self.tables, species, self.charges)
        key = key if key is not None else jax.random.PRNGKey(0)
        have_vel = velocities is not None

        def _init(coordinates, velocities, key):
            k1, k2 = jax.random.split(key)
            if not have_vel:
                velocities = initialize_velocity(self.const, species,
                                                 coordinates, k1, Temp)
            nmol = species.shape[0]
            from ..scf import init_density
            from ..system import make_system
            sys = make_system(self.const, species, coordinates)
            st = MDState(
                coordinates=coordinates, velocities=velocities,
                acc=jnp.zeros_like(coordinates),
                # first force evaluation (SCF from scratch) fills acc and P
                P=init_density(self.const, sys),
                E0=jnp.zeros(nmol, coordinates.dtype),
                key=k2, step=jnp.asarray(0),
            )
            force, P, Epot = self.compute_force(species, st)
            mass = atom_masses(self.const, species)
            Ek, _ = kinetic_energy(self.const, species, velocities)
            return dataclasses.replace(
                st, acc=force / mass * ACC_SCALE, P=jax.lax.stop_gradient(P),
                E0=Epot + Ek)

        if velocities is None:
            velocities = jnp.zeros_like(coordinates)
        return jax.jit(_init)(coordinates, velocities, key)

    # -- scan-compiled execution ---------------------------------------
    def _build_chunk(self, species, nsteps: int, with_frames: bool = False):
        """``with_frames=True`` additionally scans out per-step
        (coordinates, velocities, acc) so run() can write a trajectory
        frame at EVERY dump boundary inside a compiled chunk — matching
        the reference's every-`dump`-steps resolution
        (MolecularDynamics.py:300-320) instead of one frame per chunk."""
        def chunk(state):
            def body(st, _):
                st, obs = self.step(species, st)
                if with_frames:
                    return st, (obs, (st.coordinates, st.velocities, st.acc))
                return st, obs
            return jax.lax.scan(body, state, None, length=nsteps)
        return jax.jit(chunk)

    def run(self, species, state: MDState, steps: int, thermo: int = 1,
            dump: Optional[int] = None, dump_prefix: str = "md",
            molids=(0,), log: bool = True) -> MDState:
        """Drive `steps` steps in thermo-sized scan chunks with host I/O
        between chunks (thermo lines / extended-xyz dumps,
        cf. MolecularDynamics.py:291-320).

        The final chunk is clamped so exactly `steps` steps run; dump /
        remove_com intervals need not be multiples of `thermo` — they fire
        whenever their boundary is crossed within a chunk.  When dumping,
        the chunk additionally scans out per-step frames, so a frame is
        written at EVERY `dump` boundary — full reference dump resolution
        (MolecularDynamics.py:300-320) even when several boundaries fall
        inside one compiled chunk."""
        chunks = {}

        def get_chunk(n, frames):
            # per-step frame stacks (3 full-system arrays x chunk length)
            # are scanned out only for chunks that actually contain a dump
            # boundary — at headline batch sizes the stacks dominate the
            # chunk's HBM output, so boundary-free chunks skip them
            if (n, frames) not in chunks:
                chunks[(n, frames)] = self._build_chunk(species, n,
                                                        with_frames=frames)
            return chunks[(n, frames)]

        done = 0
        if log:
            print("Step, Temp, E(kinetic), E(potential), E(total), "
                  "dipole(x,y,z)")
        mass = atom_masses(self.const, species)
        while done < steps:
            n = min(thermo, steps - done)
            want_frames = bool(dump) and (done + n) // dump > done // dump
            if self.timing is not None:
                with self.timing.phase("MD"):
                    state, obs = get_chunk(n, want_frames)(state)
                    jax.block_until_ready(obs)
            else:
                state, obs = get_chunk(n, want_frames)(state)
            frames = None
            if want_frames:
                obs, frames = obs
            prev = done
            done += n
            last = jax.tree_util.tree_map(lambda x: x[-1], obs)
            if log:
                cols = " ".join(
                    f"{float(last.T[m]):8.2f} {float(last.Ek[m]):.6e} "
                    f"{float(last.Epot[m]):.6e} "
                    f"{float(last.Ek[m] + last.Epot[m]):.6e} "
                    f"{float(last.dipole[m, 0]):.6e} "
                    f"{float(last.dipole[m, 1]):.6e} "
                    f"{float(last.dipole[m, 2]):.6e}"
                    for m in molids)
                print(f"{done:6d} {cols}", flush=True)
            if want_frames:
                xs, vs, accs = frames
                for s in range(n):
                    gstep = prev + s + 1
                    if gstep % dump:
                        continue
                    snap = types.SimpleNamespace(
                        coordinates=xs[s], velocities=vs[s],
                        step=jnp.asarray(gstep))
                    obs_s = jax.tree_util.tree_map(lambda x: x[s], obs)
                    xyz_io.dump_frame(dump_prefix, self.const, species,
                                      snap, obs_s, molids,
                                      forces=accs[s] * mass / ACC_SCALE)
            rc = self.md_cfg.remove_com
            if rc and (done // rc) > (prev // rc):
                x, v = zero_com(self.const, species, state.coordinates,
                                state.velocities)
                if hasattr(state, "base"):  # thermostat wrapper (NHState)
                    state = dataclasses.replace(
                        state, base=dataclasses.replace(
                            state.base, coordinates=x, velocities=v))
                else:
                    state = dataclasses.replace(state, coordinates=x,
                                                velocities=v)
        return state


class NoseHooverDynamics(MolecularDynamics):
    """NVT via a Nose-Hoover chain (length 2, Martyna-Klein-Tuckerman).

    The reference declares this class but leaves it a stub
    (MolecularDynamics.py:435-436); this is a working implementation.
    Per-molecule thermostat positions/momenta extend the MD state
    (NHState wraps MDState).
    """

    CHAIN = 2

    def __init__(self, const, tables, seqm_cfg, md_cfg=MDConfig(),
                 tau: float = 20.0, learned=None, timing=None, charges=None):
        super().__init__(const, tables, seqm_cfg, md_cfg, learned, timing,
                         charges)
        self.tau = tau  # thermostat time constant (fs)

    def initialize(self, species, coordinates, velocities=None, key=None,
                   Temp=300.0):
        st = super().initialize(species, coordinates, velocities, key, Temp)
        nmol = species.shape[0]
        z = jnp.zeros((nmol, self.CHAIN), coordinates.dtype)
        # piggyback thermostat momenta on the state via a wrapper dataclass
        return NHState(base=st, vxi=z, xi=z)

    def _nhc_half(self, species, st: "NHState", dt):
        """Half-step Nose-Hoover chain update of the thermostat momenta and
        velocity scale (factorized MTK scheme)."""
        cfg = self.md_cfg
        kT = cfg.temperature / EV_PER_KELVIN  # eV
        ndf = 3.0 * jnp.sum(species > 0, axis=1).astype(st.base.velocities.dtype)
        Q1 = ndf * kT * self.tau ** 2 / KE_SCALE  # (g/mol A^2) units folded
        Q2 = kT * self.tau ** 2 / KE_SCALE

        Ek, _ = kinetic_energy(self.const, species, st.base.velocities)
        vxi, xi = st.vxi, st.xi
        G2 = (Q1 * vxi[:, 0] ** 2 * KE_SCALE - kT) / (Q2 * KE_SCALE)
        vxi = vxi.at[:, 1].add(0.25 * dt * G2)
        G1 = (2.0 * Ek - ndf * kT) / (Q1 * KE_SCALE)
        vxi = vxi.at[:, 0].set(
            (vxi[:, 0] * jnp.exp(-0.125 * dt * vxi[:, 1])
             + 0.25 * dt * G1) * jnp.exp(-0.125 * dt * vxi[:, 1]))
        scale = jnp.exp(-0.5 * dt * vxi[:, 0])
        v = st.base.velocities * scale[:, None, None]
        xi = xi + 0.5 * dt * vxi
        Ek2 = Ek * scale ** 2
        G1 = (2.0 * Ek2 - ndf * kT) / (Q1 * KE_SCALE)
        vxi = vxi.at[:, 0].set(
            (vxi[:, 0] * jnp.exp(-0.125 * dt * vxi[:, 1])
             + 0.25 * dt * G1) * jnp.exp(-0.125 * dt * vxi[:, 1]))
        G2 = (Q1 * vxi[:, 0] ** 2 * KE_SCALE - kT) / (Q2 * KE_SCALE)
        vxi = vxi.at[:, 1].add(0.25 * dt * G2)
        base = dataclasses.replace(st.base, velocities=v)
        return NHState(base=base, vxi=vxi, xi=xi)

    def step(self, species, st: "NHState", charges=None):
        dt = self.md_cfg.timestep
        st = self._nhc_half(species, st, dt)
        base, obs = super().step(species, st.base, charges)
        st = NHState(base=base, vxi=st.vxi, xi=st.xi)
        st = self._nhc_half(species, st, dt)
        # report Ek/T of the *returned* (post-thermostat) velocities, not
        # the mid-step ones computed inside super().step
        Ek, T = kinetic_energy(self.const, species, st.base.velocities)
        return st, obs._replace(Ek=Ek, T=T)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NHState:
    base: MDState
    vxi: jnp.ndarray
    xi: jnp.ndarray

    # passthroughs so run()/dump work on the wrapped state
    @property
    def coordinates(self):
        return self.base.coordinates

    @property
    def velocities(self):
        return self.base.velocities

    @property
    def acc(self):
        return self.base.acc

    @property
    def P(self):
        return self.base.P

    @property
    def step(self):
        return self.base.step


class LangevinDynamics(MolecularDynamics):
    """NVT Langevin thermostat (LAMMPS formula, MolecularDynamics.py:395-432):
    F = Fc - (m/damp) v + sqrt(2 kB T m / (dt damp)) N(0,1)."""

    def compute_force(self, species, state: MDState, charges=None):
        Fc, P, Epot = super().compute_force(species, state, charges)
        cfg = self.md_cfg
        mass = atom_masses(self.const, species)
        Ff = -mass * state.velocities / cfg.damp / ACC_SCALE
        key = jax.random.fold_in(state.key, state.step)
        noise = jax.random.normal(key, Fc.shape, Fc.dtype)
        Fr = FR_SCALE * jnp.sqrt(
            2.0 * cfg.temperature * mass / self.md_cfg.timestep / cfg.damp) * noise
        F = Fc + Ff + Fr
        F = jnp.where((species > 0)[..., None], F, 0.0)
        return F, P, Epot
