"""Learned-Hamiltonian training: fit per-element parameter offsets to
reference heats of formation with the data-parallel train step.

The standalone analogue of the reference's HIPNN-coupled training script
(tests/test-train.py): parameters replicated, molecule batch sharded over
the mesh, gradients pmean'd, SCF-failed molecules masked out of the loss.
Here the "dataset" is synthetic — target Hf values computed with slightly
shifted U_ss/zeta_s tables — so the loss has a known minimum and the run
verifies end-to-end gradient flow through SCF (scf_backward mode 1).

Run: JAX_PLATFORMS=cpu python examples/train.py
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

import pyseqm_tpu as pq
from pyseqm_tpu.parallel import (make_train_step, molecule_mesh,
                                 shard_molecules)
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    mesh = molecule_mesh()
    ndev = len(mesh.devices.ravel())

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    # scf_backward=1: recursive-adjoint gradients through the SCF fixed
    # point (needed because the loss depends on the converged density
    # through non-variational parameters; cf. scf_loop.py backward modes)
    const, tables, cfg = pq.build(
        "AM1", dtype=dtype,
        scf=SCFConfig(eps=1.0e-8, converger=(2,), backward=1,
                      backward_eps=1.0e-7, backward_max_iter=100))

    nmol = 8 * ndev
    sp, co = make_batch(nmol, molsize=8, jitter=0.01)
    species, coords = shard_molecules(
        mesh, (jnp.asarray(sp), jnp.asarray(co, dtype)))

    # synthetic targets: Hf computed with shifted tables (known optimum)
    names = ("U_ss", "zeta_s")
    true_delta = {"U_ss": 0.05, "zeta_s": 0.002}
    shifted = dict(tables)
    for n in names:
        shifted[n] = tables[n] + true_delta[n] * (tables[n] != 0)
    out = jax.jit(lambda c: pq.energy(
        const, shifted, cfg, species, c))(coords)
    hf_target = shard_molecules(mesh, out.Hf)

    step = make_train_step(const, tables, cfg, mesh, param_names=names,
                           lr=2.0e-5)
    deltas = {n: jnp.zeros_like(tables[n]) for n in names}
    for i in range(30):
        deltas, loss = step(deltas, species, coords, hf_target)
        if i % 5 == 0 or i == 29:
            print(f"iter {i:3d}  loss {float(loss):.6e} eV^2")
    print("fitted U_ss offsets (nonzero elements):",
          [f"{float(v):+.4f}" for v in deltas["U_ss"][deltas["U_ss"] != 0][:4]])


if __name__ == "__main__":
    main()
