"""Energy + forces from the reference's shipped trained HIP-NN model
(the examples/test.py workflow): per-atom PM3 parameters predicted by the
network, fed through the standard learned-parameters interface.

The trained weights live in pyseqm_tpu/params/hipnn_pm3.npz (extracted
offline from the reference's examples/model/model.pt by
tools/extract_hipnn.py); models/hipnn.py evaluates the network natively
in JAX.
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
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.hipnn import make_hipnn_callable
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def main():
    learned = make_hipnn_callable()
    const, tables, cfg = pq.build(
        "PM3", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-6, converger=(2,)))
    sp, co = make_batch(8, molsize=8)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, dtype=jnp.float32)

    frc, out = jax.jit(
        lambda c: pq.force(const, tables, cfg, species, c, learned=learned)
    )(coords)
    frc_tab, out_tab = jax.jit(
        lambda c: pq.force(const, tables, cfg, species, c))(coords)

    print("Hf (trained model) [eV]:", out.Hf)
    print("Hf (PM3 table)     [eV]:", out_tab.Hf)
    print("max |force| [eV/A]:", float(jnp.abs(frc).max()))
    print("unconverged:", int(out.notconverged.sum()))


if __name__ == "__main__":
    main()
