"""Single-point AM1 energy + forces for a small batch (cf. the reference
examples/test.py workflow)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu: the axon TPU plugin ignores the env var alone,
# and with the tunnel down the import would hang trying to reach the chip
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-6, converger=(2,)))
    sp, co = make_batch(8, molsize=8)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, dtype=jnp.float32)

    f, out = jax.jit(lambda s, c: pq.force(const, tables, cfg, s, c))(
        species, coords)
    print("Hf (eV):", out.Hf)
    print("max |F| (eV/A):", jnp.abs(f).max(axis=(1, 2)))
    print("converged:", ~out.notconverged)


if __name__ == "__main__":
    main()
