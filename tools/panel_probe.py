"""Probe: panel-resident XL electronic state (round-5 perf item #2).

Hypothesis (VERDICT r4 weak #1): the headline XL step pays for
(a) the panel pack/unpack transposes around the SP2 pallas_call
    (~0.94 ms measured round-trip), and
(b) lane padding on every elementwise op touching the (B, 16, 16)
    packed electronic state — XLA tiles the two minor dims to (8, 128),
    so n_st=16 arrays occupy 8x their logical bytes in HBM; the XL ring
    sum reads m+1 such buffers per step.

If the state lives in the kernel's dense (G, K*n, TILE) panel layout the
ring sum runs at 1x bytes and the kernel output transpose disappears.
This probe times each piece in isolation (scan-amortized, data-dependent
chains per CLAUDE.md); the end-to-end decision is made by bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pyseqm_tpu.ops import sp2_pallas
from pyseqm_tpu.ops.sp2_pallas import KPANEL, TILE

B = 10240
N = 16          # headline packed size
M_RING = 6      # XL k=5 ring depth
R = 30


def timed(run, x):
    out = jax.block_until_ready(run(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(out))
        best = min(best, time.perf_counter() - t0)
    return best / R * 1e3


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    key = jax.random.PRNGKey(0)
    m = TILE // N
    per_prog = m * KPANEL
    G = B // per_prog
    cs = jnp.linspace(0.1, 0.2, M_RING)

    # -- ring sum: padded (M, B, n, n) vs dense panel (M, G, K*n, TILE) --
    Pt_mat = jax.random.normal(key, (M_RING, B, N, N), jnp.float32)
    Pt_pan = jax.random.normal(key, (M_RING, G, KPANEL * N, TILE),
                               jnp.float32)

    @jax.jit
    def ring_mat(Pt):
        def step(Pt, _):
            P = jnp.einsum('k,knij->nij', cs, Pt)
            Pt = jnp.concatenate([Pt[1:], P[None]], axis=0)
            return Pt, None
        return jax.lax.scan(step, Pt, None, length=R)[0]

    @jax.jit
    def ring_pan(Pt):
        def step(Pt, _):
            P = jnp.einsum('k,kgrt->grt', cs, Pt)
            Pt = jnp.concatenate([Pt[1:], P[None]], axis=0)
            return Pt, None
        return jax.lax.scan(step, Pt, None, length=R)[0]

    print(f"ring sum (M={M_RING}) padded (B,{N},{N}) : "
          f"{timed(ring_mat, Pt_mat):7.3f} ms")
    print(f"ring sum (M={M_RING}) panel dense       : "
          f"{timed(ring_pan, Pt_pan):7.3f} ms")
    sys.stdout.flush()

    # -- trace readout: sum(D * F) on padded mats vs panels --------------
    D_mat = jax.random.normal(key, (B, N, N), jnp.float32)
    F_mat = jax.random.normal(key, (B, N, N), jnp.float32)
    D_pan = jax.random.normal(key, (G, KPANEL * N, TILE), jnp.float32)
    F_pan = jax.random.normal(key, (G, KPANEL * N, TILE), jnp.float32)

    @jax.jit
    def tr_mat(D):
        def step(D, _):
            t = jnp.sum(D * F_mat, axis=(-2, -1))
            return D + 1e-12 * t[:, None, None], None
        return jax.lax.scan(step, D, None, length=R)[0]

    @jax.jit
    def tr_pan(D):
        def step(D, _):
            t = jnp.sum(D * F_pan)
            return D + 1e-12 * t, None
        return jax.lax.scan(step, D, None, length=R)[0]

    print(f"readout sum(D*F) padded mats        : "
          f"{timed(tr_mat, D_mat):7.3f} ms")
    print(f"readout sum(D*F) panels             : "
          f"{timed(tr_pan, D_pan):7.3f} ms")
    sys.stdout.flush()

    # -- kernel: mat->kernel->mat (today) vs panels->kernel->panels ------
    nocc = jnp.full((B,), 4.0, jnp.float32)
    a0 = 0.01 * jax.random.normal(key, (B, N, N), jnp.float32)
    a0 = 0.5 * (a0 + jnp.swapaxes(a0, 1, 2)) + 0.4 * jnp.eye(N)[None]

    @jax.jit
    def k_mat(a):
        def step(a, _):
            P = sp2_pallas.sp2_purify_tpu(a, nocc, 1.0e-4)
            return a + 1.0e-9 * P, None
        return jax.lax.scan(step, a, None, length=R)[0]

    X0 = sp2_pallas.panel_pack(a0)

    @jax.jit
    def k_pan(X):
        def step(X, _):
            P = sp2_pallas.sp2_purify_panels(X, nocc, N, 1.0e-4)
            return X + 1.0e-9 * P, None
        return jax.lax.scan(step, X, None, length=R)[0]

    print(f"sp2 kernel mat io (today)           : "
          f"{timed(k_mat, a0):7.3f} ms")
    print(f"sp2 kernel panel io                 : "
          f"{timed(k_pan, X0):7.3f} ms")


if __name__ == "__main__":
    main()
