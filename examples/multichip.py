"""Molecule-sharded XL-BOMD over a device mesh.

Demonstrates the distributed path (pyseqm_tpu.parallel): a 1-D
``jax.sharding.Mesh`` over the molecule batch axis, sharded single-point
energies/forces, and a zero-collective sharded XL-BOMD trajectory —
the TPU-pod-native equivalent of the reference's single-GPU batch loop
(seqm/MolecularDynamics.py).

Runs anywhere: on a multi-chip TPU host it uses the real chips; on CPU it
creates 8 virtual devices (set before jax import below), which is also
how tests/conftest.py and __graft_entry__.dryrun_multichip validate the
sharding.  Run: JAX_PLATFORMS=cpu python examples/multichip.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.md import MDConfig
from pyseqm_tpu.drivers.xlbomd import XLBOMD
from pyseqm_tpu.parallel import (molecule_mesh, shard_molecules,
                                 sharded_force_fn, sharded_xlbomd_step)
from pyseqm_tpu.parallel.sharding import xlbomd_state_specs
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    mesh = molecule_mesh()
    ndev = len(mesh.devices.ravel())
    print(f"mesh: {ndev} x {mesh.devices.ravel()[0].platform}")

    dtype = jnp.float32
    const, tables, cfg = pq.build(
        "AM1", dtype=dtype,
        scf=SCFConfig(eps=1.0e-5, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4))
    nmol = 16 * ndev                      # batch divisible by the mesh
    sp, co = make_batch(nmol, molsize=8, jitter=0.02)
    species, coords = shard_molecules(
        mesh, (jnp.asarray(sp), jnp.asarray(co, dtype)))

    # sharded single-point forces: each device solves its own SCF slice
    ffn = sharded_force_fn(const, tables, cfg, mesh)
    f, hf = ffn(species, coords)
    print(f"forces sharded over {ndev} devices: "
          f"Hf[0]={float(hf[0]):.4f} eV, |F|max={float(jnp.abs(f).max()):.4f}")

    # sharded XL-BOMD: initialize on one device, place the state on the
    # mesh, then step with zero per-step collectives
    md = XLBOMD(const, tables, cfg, MDConfig(timestep=0.4), k=5)
    state = md.initialize(species, coords, Temp=300.0)
    specs = xlbomd_state_specs()
    state = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(
            x, jax.sharding.NamedSharding(mesh, s)), state, specs)
    step = sharded_xlbomd_step(md, mesh)
    for i in range(10):
        state, obs = step(species, state)
    e_tot = np.asarray(obs.Ek + obs.Epot)
    print(f"10 sharded XL-BOMD steps: T={float(obs.T.mean()):.1f} K, "
          f"Etot[0]={e_tot[0]:.4f} eV")

    # parity vs the unsharded driver on the same batch
    state1 = md.initialize(species, coords, Temp=300.0)
    sstep = jax.jit(md.step, static_argnums=())
    for i in range(10):
        state1, obs1 = sstep(species, state1)
    err = float(jnp.abs(obs.Epot - obs1.Epot).max())
    print(f"sharded vs single-device Epot parity: {err:.2e} eV")


if __name__ == "__main__":
    main()
