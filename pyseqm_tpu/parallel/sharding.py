"""Data parallelism over the molecule batch axis.

The reference's only parallelism is the molecule batch dimension on one
GPU (plus torch DataParallel in its training script, tests/test-train.py:
314-317).  The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over ICI
with the batch axis sharded via ``shard_map``.  Each shard runs its own
SCF ``while_loop`` with *local* convergence masks — molecules are
independent, so no cross-chip sync per SCF iteration (a global
all-converged check would serialize every iteration on a collective).
Collectives appear only where physics requires them: batch-level loss /
gradient reductions in the training step (``jax.lax.pmean`` over 'mol').

Parameter tables and learned element offsets are replicated; molecular
data (species, coordinates, densities, MD state) shard along axis 0.
"""
from __future__ import annotations

import functools
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import Constants
from ..models.energy import SEQMConfig, energy, force
from ..scf import SCFConfig


def molecule_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name 'mol'."""
    import numpy as np
    devices = np.array(jax.devices() if devices is None else devices)
    return Mesh(devices, ("mol",))


def shard_molecules(mesh: Mesh, tree):
    """Place batch-major arrays with the leading axis sharded over 'mol'.

    The leading axis must be divisible by the mesh size (``shard_map``
    with P('mol') requires equal shards) — pad ragged batches first with
    :func:`pad_to_mesh`."""
    sh = NamedSharding(mesh, P("mol"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_mesh(mesh: Mesh, species, coordinates, charges=None):
    """Pad a molecule batch to a multiple of the mesh size.

    Padding molecules are entirely empty (species=0 rows): every kernel
    already masks padding atoms, so they flow through SCF/MD as inert
    work and their outputs are ignored.  Returns
    ``(species, coordinates, charges, nreal)`` — slice outputs back to
    ``[:nreal]`` after the sharded call.
    """
    import numpy as np
    n = species.shape[0]
    d = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    m = (-n) % d
    if m == 0:
        return species, coordinates, charges, n
    species = jnp.concatenate(
        [jnp.asarray(species),
         jnp.zeros((m,) + tuple(species.shape[1:]), jnp.asarray(species).dtype)])
    coordinates = jnp.concatenate(
        [jnp.asarray(coordinates),
         jnp.zeros((m,) + tuple(coordinates.shape[1:]),
                   jnp.asarray(coordinates).dtype)])
    if charges is not None:
        charges = jnp.concatenate(
            [jnp.asarray(charges),
             jnp.zeros((m,), jnp.asarray(charges).dtype)])
    return species, coordinates, charges, n


def _shard_spec(tree):
    return jax.tree_util.tree_map(lambda _: P("mol"), tree)


def sharded_energy_fn(const: Constants, tables, cfg: SEQMConfig, mesh: Mesh):
    """jit-compiled batched energy with the molecule axis sharded.

    The returned fn accepts an optional per-molecule net ``charges``
    array, sharded like the batch (mirrors the reference drivers
    forwarding a `charges` kwarg into Energy/Parser, basics.py:69-71)."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("mol"), P("mol"), P("mol")),
        out_specs=P("mol"))
    def efn_c(species, coords, charges):
        out = energy(const, tables, cfg, species, coords, charges=charges)
        return out.Hf

    def efn(species, coords, charges=None):
        if charges is None:
            charges = jnp.zeros((species.shape[0],), jnp.int32)
        return efn_c(species, coords, charges)

    return efn


def sharded_force_fn(const: Constants, tables, cfg: SEQMConfig, mesh: Mesh):
    """jit-compiled batched forces with the molecule axis sharded.
    Optional per-molecule net ``charges`` shard like the batch."""

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("mol"), P("mol"), P("mol")),
        out_specs=(P("mol"), P("mol")))
    def ffn_c(species, coords, charges):
        f, out = force(const, tables, cfg, species, coords, charges=charges)
        return f, out.Hf

    def ffn(species, coords, charges=None):
        if charges is None:
            charges = jnp.zeros((species.shape[0],), jnp.int32)
        return ffn_c(species, coords, charges)

    return ffn


def xlbomd_state_specs():
    """PartitionSpec tree for an XLBOMDState sharded over 'mol'.

    Every field is batch-major except the Pt history ring buffer
    (m, nmol, n, n) — sharded on axis 1 — and the RNG key / step
    counter, which are replicated."""
    from ..drivers.xlbomd import XLBOMDState
    return XLBOMDState(
        coordinates=P("mol"), velocities=P("mol"), acc=P("mol"),
        D=P("mol"), P=P("mol"), Pt=P(None, "mol"),
        E0=P("mol"), key=P(), step=P())


def sharded_xlbomd_step(md, mesh: Mesh):
    """Compile one XL-BOMD step with MD state sharded over the mesh.

    The electronic propagation, Hcore/Fock build, SP2 purification and
    Verlet update are all molecule-local, so the step runs with zero
    collectives — each shard owns its slice of the trajectory (the
    TPU-native equivalent of the reference's single-GPU batch loop,
    MolecularDynamics.py/XLBOMD.py).

    Returns step(species, state) -> (state, observables), jitted.  If the
    driver was built with per-molecule net charges (``md.charges``), they
    are sharded alongside the batch (a closure constant would stay
    full-size inside shard_map and break the local shapes)."""
    st_specs = xlbomd_state_specs()
    from ..drivers.md import Observables
    obs_specs = Observables(*([P("mol")] * 5))

    if getattr(md, "charges", None) is not None:
        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("mol"), st_specs, P("mol")),
            out_specs=(st_specs, obs_specs))
        def step_c(species, state, charges):
            return md.step(species, state, charges=charges)

        charges = jnp.asarray(md.charges)

        def step(species, state):
            return step_c(species, state, charges)

        return step

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P("mol"), st_specs),
        out_specs=(st_specs, obs_specs))
    def step(species, state):
        return md.step(species, state)

    return step


def make_train_step(const: Constants, tables, cfg: SEQMConfig, mesh: Mesh,
                    param_names=("U_ss", "zeta_s"), lr: float = 1.0e-4):
    """Data-parallel learned-Hamiltonian training step.

    Trains per-element offset tables (the standalone analogue of the
    HIPNN-predicted per-atom parameters, cf. tests/test-train.py):
    replicated parameters, sharded molecule batch, gradients averaged
    over the mesh with ``pmean``.  Molecules whose SCF failed are masked
    out of the loss (cf. tests/test-train.py:133-147).

    Returns step(deltas, species, coords, hf_target[, charges]) ->
    (deltas, loss); ``charges`` (optional per-molecule net charge) shards
    with the batch.
    """

    def local_loss(deltas, species, coords, hf_target, charges):
        learned = {n: (tables[n] + deltas[n])[species] for n in param_names}
        out = energy(const, tables, cfg, species, coords, learned=learned,
                     charges=charges)
        ok = (~out.notconverged).astype(coords.dtype)
        se = ok * (out.Hf - hf_target) ** 2
        # local sums; pmean'd by the caller
        return jnp.sum(se) / hf_target.shape[0]

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("mol"), P("mol"), P("mol"), P("mol")),
        out_specs=(P(), P()))
    def step_c(deltas, species, coords, hf_target, charges):
        loss, grads = jax.value_and_grad(local_loss)(
            deltas, species, coords, hf_target, charges)
        loss = jax.lax.pmean(loss, "mol")
        grads = jax.lax.pmean(grads, "mol")
        new = {n: deltas[n] - lr * grads[n] for n in deltas}
        return new, loss

    def step(deltas, species, coords, hf_target, charges=None):
        if charges is None:
            charges = jnp.zeros((species.shape[0],), jnp.int32)
        return step_c(deltas, species, coords, hf_target, charges)

    return step
