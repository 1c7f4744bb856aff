"""Batched geometry optimization with L-BFGS (cf. reference examples/opt.py,
which drives scipy L-BFGS-B; here it is optax, fully batched on device)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# honor JAX_PLATFORMS=cpu: the axon TPU plugin ignores the env var alone,
# and with the tunnel down the import would hang trying to reach the chip
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.drivers.opt import geometry_optimize_lbfgs
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32, scf=SCFConfig(eps=1.0e-7, converger=(2,)))
    sp, co = make_batch(4, molsize=8, jitter=0.05)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, dtype=jnp.float32)
    x, ferr, iters = geometry_optimize_lbfgs(const, tables, cfg, species,
                                             coords, force_tol=5e-3,
                                             max_evl=30, log=True)
    print(f"final max|F|: {float(ferr)} after {iters} iterations")


if __name__ == "__main__":
    main()
