"""Diatomic dissociation curve (cf. reference tests/test.py): batch the
distance sweep — the batch axis doubles as the scan grid, so one jitted
call produces the whole curve.

Usage: python examples/dissociation.py [Z1 Z2 method]  (default: C O AM1)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu: the axon TPU plugin ignores the env var alone,
# and with the tunnel down the import would hang trying to reach the chip
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax

jax.config.update("jax_enable_x64", True)  # full f64 on CPU

import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig

SYM = {s.strip(): z for z, s in enumerate(pq.constants.ELEMENT_LABELS)}


def main():
    z1 = SYM.get(sys.argv[1], 6) if len(sys.argv) > 1 else 6
    z2 = SYM.get(sys.argv[2], 8) if len(sys.argv) > 2 else 8
    method = sys.argv[3] if len(sys.argv) > 3 else "AM1"
    if z1 < z2:
        z1, z2 = z2, z1  # descending-Z convention

    const, tables, cfg = pq.build(
        method, dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-9, converger=(2,)))
    r = np.linspace(0.7, 3.5, 101)
    n = len(r)
    species = jnp.asarray(np.tile([[z1, z2]], (n, 1)), dtype=jnp.int32)
    coords = np.zeros((n, 2, 3))
    coords[:, 1, 0] = r
    out = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(
        jnp.asarray(coords))

    labels = pq.constants.ELEMENT_LABELS
    print(f"# {labels[z1].strip()}-{labels[z2].strip()} {method} "
          f"dissociation curve")
    print("# r(A)  Etot(eV)  converged")
    for ri, e, nc in zip(r, np.asarray(out.Etot), np.asarray(out.notconverged)):
        print(f"{ri:6.3f}  {e: 14.8f}  {not nc}")


if __name__ == "__main__":
    main()
