"""Probe: compile wall-time of the batched L-BFGS step by linesearch kind.

bench.py --config opt hung >15 min in compile through the axon tunnel
(round 3 battery).  The suspect is optax's default zoom linesearch, which
nests full SCF value+grad programs inside its while_loop.  This measures
.lower()+.compile() time for zoom / backtracking / no-linesearch variants
at a small nmol (program structure, not shapes, drives the compile cost).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch

NMOL = int(os.environ.get("NMOL", "256"))


def main():
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-4, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, max_iter=200))
    sp, co = make_batch(NMOL, 8, jitter=0.05)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, dtype=jnp.float32)
    amask = (species > 0)[..., None]

    def val(c):
        return jnp.sum(pq.energy(const, tables, cfg, species, c).Hf)

    variants = {
        "backtracking15": optax.lbfgs(
            linesearch=optax.scale_by_backtracking_linesearch(
                max_backtracking_steps=15, store_grad=True)),
        "none_lr0.5": optax.lbfgs(learning_rate=0.5, linesearch=None),
        "zoom_default": optax.lbfgs(),
    }
    for name, opt in variants.items():
        def step(c, state):
            value, grads = jax.value_and_grad(val)(c)
            grads = jnp.where(amask, grads, 0.0)
            updates, state = opt.update(grads, state, c, value=value,
                                        grad=grads, value_fn=val)
            return optax.apply_updates(c, updates), state, value, \
                jnp.max(jnp.abs(grads))

        state = opt.init(coords)
        t0 = time.perf_counter()
        lowered = jax.jit(step).lower(coords, state)
        t1 = time.perf_counter()
        try:
            compiled = lowered.compile()
            t2 = time.perf_counter()
            print(f"{name:16s} lower {t1 - t0:7.1f}s  compile {t2 - t1:7.1f}s")
        except Exception as e:
            print(f"{name:16s} lower {t1 - t0:7.1f}s  compile FAILED: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
