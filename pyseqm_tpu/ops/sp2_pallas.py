"""Pallas TPU kernel for SP2 density purification.

The XLA formulation of SP2 (ops/density.py) round-trips the (B, n, n)
density iterate through HBM every iteration and hits a fusion pathology
when the trace-steering predicate mixes reductions; this kernel keeps the
whole iteration in VMEM:

* Each grid program packs m = 128 // n molecules **block-diagonally** into
  one 128x128 tile, so every SP2 iteration is a single full-size MXU
  matmul (block-diag x block-diag = block-diag, exactly).
* Pack/unpack are expressed as matmuls with constant placement matrices
  (A = sum_i P_i^T a_i P_i) and every per-molecule scalar lives in a
  row-space (128, 1) vector — Mosaic supports dots, elementwise ops,
  iota and SMEM scalar reads, but not small-vector concats/bools.
* The trace-correction branch choice, per-molecule convergence masks and
  the f32 no-improvement stopping rule (cf. reference SP2.py:11-70) are
  arithmetic lerps on those row vectors.

Supports n = 4*molsize <= 128 and float32 (the TPU production dtype);
callers fall back to the XLA path otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
MAX_ITER = 100


def _sp2_kernel(n: int, m: int, eps: float, nocc_ref, a_ref, out_ref):
    """One program: m molecules of n x n, packed block-diagonally."""
    dtype = a_ref.dtype
    g = pl.program_id(0)

    # constant placement matrices: P_i (n, TILE) with I_n at lane offset i*n
    r_idx = jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 1)
    row_mol = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0) // n
    valid_row = jnp.where(row_mol < m, 1.0, 0.0).astype(dtype)

    def placement(i):
        return jnp.where(c_idx == r_idx + i * n, 1.0, 0.0).astype(dtype)

    # pack: A = sum_i P_i^T a_i P_i  (pure dots, no slicing/concat)
    A = jnp.zeros((TILE, TILE), dtype=dtype)
    for i in range(m):
        Pi = placement(i)
        A = A + jnp.dot(Pi.T, jnp.dot(a_ref[i], Pi,
                                      preferred_element_type=jnp.float32),
                        preferred_element_type=jnp.float32)

    # per-row nocc from scalar prefetch
    nocc_rows = jnp.zeros((TILE, 1), dtype=dtype)
    for i in range(m):
        sc = nocc_ref[g * m + i]
        nocc_rows = nocc_rows + jnp.where(row_mol == i, sc, 0.0).astype(dtype)

    # same-molecule row mask for broadcasting per-molecule sums to rows
    rm_r = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) // n
    rm_c = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1) // n
    S = jnp.where(rm_r == rm_c, 1.0, 0.0).astype(dtype)

    def seg_rows(col):
        """(TILE,1) per-row values -> (TILE,1) per-molecule sums, by row."""
        return jnp.dot(S, col, preferred_element_type=jnp.float32)

    eye = jnp.eye(TILE, dtype=dtype)
    tr = seg_rows(jnp.sum(A * eye, axis=1, keepdims=True))
    e0 = jnp.abs(tr - nocc_rows)
    notconv = valid_row

    def cond(carry):
        _, _, _, _, _, notconv, k = carry
        return (jnp.max(notconv) > 0.0) & (k < MAX_ITER)

    def body(carry):
        A, tr, errm0, errm1, errm2, notconv, k = carry
        A2 = jnp.dot(A, A, preferred_element_type=jnp.float32)
        # block-diagonal + symmetric => per-molecule tr(A^2) equals the
        # squared Frobenius norm of that molecule's rows
        tr2 = seg_rows(jnp.sum(A * A, axis=1, keepdims=True))
        take = jnp.where(jnp.abs(tr2 - nocc_rows)
                         < jnp.abs(2.0 * tr - tr2 - nocc_rows),
                         1.0, 0.0).astype(dtype)
        # both branches are A +- (A^2 - A): one fused full-tile update
        s = notconv * (2.0 * take - 1.0)
        A = A + s * (A2 - A)
        tr_new = take * tr2 + (1.0 - take) * (2.0 * tr - tr2)
        tr = tr + notconv * (tr_new - tr)
        e0 = errm0 + notconv * (jnp.abs(tr - nocc_rows) - errm0)
        e1 = errm1 + notconv * (errm0 - errm1)
        e2 = errm2 + notconv * (errm1 - errm2)
        # f32 no-improvement rule: done = (e0 < eps) and not (e0 < e2)
        lt_eps = jnp.where(e0 < eps, 1.0, 0.0).astype(dtype)
        lt_e2 = jnp.where(e0 < e2, 1.0, 0.0).astype(dtype)
        notconv = notconv * (1.0 - lt_eps * (1.0 - lt_e2))
        return A, tr, e0, e1, e2, notconv, k + 1

    A, *_ = jax.lax.while_loop(
        cond, body, (A, tr, e0, e0, e0, notconv, jnp.asarray(0)))

    # unpack: a_i = P_i A P_i^T
    for i in range(m):
        Pi = placement(i)
        out_ref[i] = 2.0 * jnp.dot(
            jnp.dot(Pi, A, preferred_element_type=jnp.float32), Pi.T,
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("eps",))
def sp2_purify_tpu(a0: jnp.ndarray, nocc: jnp.ndarray, eps: float = 1.0e-2):
    """P = 2 * purify(a0) for a batch of pre-scaled iterates.

    a0: (B, n, n) float32, n <= 128; nocc: (B,) float occupied counts.
    """
    B, n, _ = a0.shape
    m = TILE // n
    pad = (-B) % m
    if pad:
        a0 = jnp.concatenate(
            [a0, jnp.zeros((pad, n, n), a0.dtype)], axis=0)
        nocc = jnp.concatenate([nocc, jnp.zeros((pad,), nocc.dtype)])
    G = a0.shape[0] // m

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((m, n, n), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, n, n), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_sp2_kernel, n, m, float(max(eps, 1.0e-2))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(a0.shape, a0.dtype),
    )(nocc.astype(a0.dtype), a0)
    return out[:B]


def supported(n: int, dtype) -> bool:
    return (n <= TILE and dtype == jnp.float32
            and jax.default_backend() == "tpu")
