"""XL-BOMD dynamics on a batch of small organics with trajectory dump
(cf. reference tests/test8.py)."""
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
from pyseqm_tpu.drivers.md import MDConfig
from pyseqm_tpu.drivers.xlbomd import XLBOMD
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-5, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4))
    sp, co = make_batch(64, molsize=8, jitter=0.02)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, dtype=jnp.float32)

    md = XLBOMD(const, tables, cfg, MDConfig(timestep=0.4), k=5)
    state = md.initialize(species, coords, Temp=300.0)
    state = md.run(species, state, steps=50, thermo=10,
                   dump=50, dump_prefix="/tmp/xlbomd", molids=(0, 1))


if __name__ == "__main__":
    main()
