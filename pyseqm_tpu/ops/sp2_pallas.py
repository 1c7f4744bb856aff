"""Pallas TPU kernel for SP2 density purification.

The XLA formulation of SP2 (ops/density.py) round-trips the (B, n, n)
density iterate through HBM every iteration and hits a fusion pathology
when the trace-steering predicate mixes reductions; this kernel keeps the
whole iteration in VMEM.

Packing (v3): molecules are stacked side by side in horizontal panels
X_k (n, TILE), columns [i*n:(i+1)*n] = A_i, and each grid program owns K
such panels (a (K*n, TILE) block).  For symmetric blocks, one transposed
MXU pass per panel yields every squared block:

    B    = X^T @ X              # (TILE, TILE): B[ni+r, nj+c] = (A_i A_j)[r, c]
    A2   = sum_i B[i*n:(i+1)*n, :] * [col in block i]     # exact, VPU only

i.e. the diagonal blocks of B are *copied out* with static sublane slices
and column masks — no second matmul, no pack/unpack placement matmuls
(the panel layout is a pure XLA-side reshape).  Compared with the v1
block-diagonal packing this does 2x less MXU work and K panels per
program amortize MXU/loop latency (the grid would otherwise be thousands
of microscopic sequential programs).

Numerics: Mosaic lowers f32 `dot` at DEFAULT precision to a *single*
bf16 MXU pass on this hardware (measured 9e-2 abs error on unit-scale
data) — every X-carrying dot here pins precision=HIGHEST (6-pass, ~1e-5).
The VPU extraction path and the X*X column sums are exact f32, so only
the X^T X products and the tiny per-molecule segment-sum dots touch the
MXU at all.

Per-molecule scalars (traces, convergence state) live in (K, TILE)
column-space rows — segment sums over a molecule's panel are one
(K,TILE) @ S matvec with the constant same-molecule mask S.  The
trace-correction branch, per-molecule convergence masks and the f32
no-improvement stopping rule (cf. reference SP2.py:11-70) are arithmetic
lerps on those rows (Mosaic supports dots/elementwise/iota but not
small-vector concats or bools).

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
KPANEL = 32         # panels per grid program (measured best of 8/32)
MAX_ITER = 100
# SP2 iterations per while-loop body (cond checks + carry traffic are
# per-body; converged molecules are masked so the at-most-one extra
# iteration per program is a no-op).  Measured at (10240, 32, 32):
# 1/2/4 all within 0.1 ms of 10.9 ms — the loop overhead is negligible;
# kept at 2 (free, and helps if a future body gets cheaper).
UNROLL = 2
# per-molecule segment sums: "roll" = in-block butterfly lane reduction
# (log2(n) pltpu.roll+add VPU steps, exact, power-of-two n only); "dot" =
# one (K,TILE)@S HIGHEST 6-pass MXU matvec with the same-molecule mask.
# Measured identical (the seg matvec was never on the critical path);
# "roll" keeps the MXU free for the panel dots.
SEGSUM = "roll"
# NB: Mosaic supports only DEFAULT (single bf16 pass) and HIGHEST (6-pass)
# dot precisions; HIGH raises NotImplementedError
_HI = jax.lax.Precision.HIGHEST
# X^T X strategy: "highest" = one 6-pass dot; "bf16x3" = manual 3-pass
# split (X = hi + lo in bf16; hi*hi + hi*lo + lo*hi).  Measured on v5e:
# bf16x3 is ~10% SLOWER than one HIGHEST dot (the three separate dot ops
# + hi/lo cast VPU passes outweigh the three saved MXU passes) — kept as
# a documented experiment, default "highest".
# "compensated": bf16x3 split of BOTH operands, 6 single-pass dots whose
# partial outputs are combined with error-free two_sum accumulation —
# SP2 doubles injected dot noise every linear-phase iteration, so the
# per-dot error sets the converged P's occ-virt subspace noise (and with
# it the MD force noise); HIGHEST's plain pass combination leaves ~3e-6
# relative, the compensated sum reaches the single-partial f32
# accumulator floor (~3e-7).
DOT_MODE = "highest"


def _tdot(Xk, Yk, mode=None):
    """B = Xk^T Yk at f32-faithful precision (see DOT_MODE)."""
    mode = DOT_MODE if mode is None else mode
    dn = (((0,), (0,)), ((), ()))
    if mode == "bf16x3":
        Xh = Xk.astype(jnp.bfloat16)
        Xl = (Xk - Xh.astype(jnp.float32)).astype(jnp.bfloat16)
        Yh = Yk.astype(jnp.bfloat16)
        Yl = (Yk - Yh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32)
        return d(Xh, Yh) + (d(Xh, Yl) + d(Xl, Yh))
    if mode == "compensated":
        # split into exactly-bf16-representable f32 parts; the DEFAULT
        # (single-pass) dot's internal bf16 cast is then lossless.
        # (Mosaic rejects bf16-typed dot operands outright: "Bad lhs type")
        def split3(V):
            h = V.astype(jnp.bfloat16).astype(jnp.float32)
            r = V - h
            m = r.astype(jnp.bfloat16).astype(jnp.float32)
            l = (r - m).astype(jnp.bfloat16).astype(jnp.float32)
            return h, m, l
        Xh, Xm, Xl = split3(Xk)
        Yh, Ym, Yl = split3(Yk)
        d = lambda a, b: jax.lax.dot_general(
            a, b, dn, preferred_element_type=jnp.float32)
        # partials in decreasing magnitude; two_sum keeps their
        # combination error-free (dropped m*l / l*l terms ~ 2^-32)
        s = d(Xh, Yh)
        err = jnp.zeros_like(s)
        for t in (d(Xh, Ym), d(Xm, Yh), d(Xh, Yl), d(Xl, Yh), d(Xm, Ym)):
            new = s + t
            z = new - s
            err = err + ((s - (new - z)) + (t - z))
            s = new
        return s + err
    return jax.lax.dot_general(Xk, Yk, dn, precision=_HI,
                               preferred_element_type=jnp.float32)


def _sp2_kernel(n: int, m: int, K: int, eps: float, dot_mode: str,
                nocc_ref, x_ref, out_ref):
    """One program: K panels of m molecules (n x n each), (K*n, TILE)."""
    dtype = x_ref.dtype
    g = pl.program_id(0)

    # column-space constants
    col_mol = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) // n  # (1,T)
    valid_col = jnp.where(col_mol < m, 1.0, 0.0).astype(dtype)
    # same-molecule column mask (TILE, TILE): segment sums as one matvec
    cm_r = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) // n
    cm_c = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1) // n
    S = jnp.where(cm_r == cm_c, 1.0, 0.0).astype(dtype)
    # horizontally tiled identity: diagonal positions of each molecule
    eh_r = jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 0)
    eh_c = jax.lax.broadcasted_iota(jnp.int32, (n, TILE), 1)
    Eh = jnp.where(eh_c % n == eh_r, 1.0, 0.0).astype(dtype)
    Dmask = Eh * valid_col
    blockmask = [
        jnp.where(col_mol == i, 1.0, 0.0).astype(dtype) for i in range(m)
    ]  # m x (1, TILE)

    loc_rows = jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 1) % n

    def seg_cols(rows):
        """(K,TILE) per-column values -> per-molecule sums, per column.

        Power-of-two n: in-block XOR butterfly of lane rolls — log2(n)
        exact VPU add steps, no MXU (blocks are n-aligned so partners
        j ^ b never cross a block).  Otherwise one (K,TILE) @ S matvec
        with the 0/1 same-molecule mask; S is 0/1 so a single-pass bf16
        product would *round the data* — HIGHEST keeps it exact to f32.
        """
        if SEGSUM == "roll" and n & (n - 1) == 0:
            out = rows
            b = 1
            while b < n:
                down = pltpu.roll(out, shift=TILE - b, axis=1)
                up = pltpu.roll(out, shift=b, axis=1)
                out = out + jnp.where((loc_rows & b) > 0, up, down)
                b <<= 1
            return out
        return jax.lax.dot(rows, S, precision=_HI,
                           preferred_element_type=jnp.float32)

    # per-column nocc from scalar prefetch: rows (K, TILE)
    noccc = jnp.zeros((K, TILE), dtype=dtype)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 0)
    for k in range(K):
        for i in range(m):
            sc = nocc_ref[(g * K + k) * m + i]
            noccc = noccc + jnp.where((kcol == k) & (col_mol == i),
                                      sc, 0.0).astype(dtype)

    X = x_ref[0] * valid_col  # (K*n, TILE); padding columns zeroed

    def diag_rows(X):
        """(K, TILE) diagonal entry of each column's molecule."""
        d = X * jnp.concatenate([Dmask] * K, axis=0) if K > 1 else X * Dmask
        # per-panel column sums of the masked diagonal
        return sum_panels(d)

    def sum_panels(V):
        """(K*n, TILE) -> (K, TILE) column sums within each panel."""
        parts = [jnp.sum(V[k * n:(k + 1) * n], axis=0, keepdims=True)
                 for k in range(K)]
        return jnp.concatenate(parts, axis=0) if K > 1 else parts[0]

    tr = seg_cols(diag_rows(X))
    e0 = jnp.abs(tr - noccc)
    notconv = jnp.ones((K, TILE), dtype=dtype) * valid_col

    def cond(carry):
        _, _, _, _, _, notconv, k = carry
        return (jnp.max(notconv) > 0.0) & (k < MAX_ITER)

    def body(carry):
        X, tr, errm0, errm1, errm2, notconv, it = carry
        # squared blocks: one transposed MXU pass per panel, then exact
        # VPU extraction of B's diagonal blocks
        a2_panels = []
        for k in range(K):
            Xk = X[k * n:(k + 1) * n]
            Bk = _tdot(Xk, Xk, dot_mode)
            A2k = blockmask[0] * Bk[0:n]
            for i in range(1, m):
                A2k = A2k + blockmask[i] * Bk[i * n:(i + 1) * n]
            a2_panels.append(A2k)
        A2 = (jnp.concatenate(a2_panels, axis=0) if K > 1 else a2_panels[0])
        # tr(A^2) per molecule = squared Frobenius norm of its panel slice
        tr2 = seg_cols(sum_panels(X * X))
        take = jnp.where(jnp.abs(tr2 - noccc)
                         < jnp.abs(2.0 * tr - tr2 - noccc),
                         1.0, 0.0).astype(dtype)
        # both branches are X +- (A2 - X): one fused panel update; the
        # (K,TILE) steering rows broadcast onto (K*n,TILE) via repeat
        s = notconv * (2.0 * take - 1.0)
        s_full = jnp.repeat(s, n, axis=0)
        X = X + s_full * (A2 - X)
        tr_new = take * tr2 + (1.0 - take) * (2.0 * tr - tr2)
        tr = tr + notconv * (tr_new - tr)
        e0 = errm0 + notconv * (jnp.abs(tr - noccc) - errm0)
        e1 = errm1 + notconv * (errm0 - errm1)
        e2 = errm2 + notconv * (errm1 - errm2)
        # f32 no-improvement rule: done = (e0 < eps) and not (e0 < e2)
        lt_eps = jnp.where(e0 < eps, 1.0, 0.0).astype(dtype)
        lt_e2 = jnp.where(e0 < e2, 1.0, 0.0).astype(dtype)
        notconv = notconv * (1.0 - lt_eps * (1.0 - lt_e2))
        return X, tr, e0, e1, e2, notconv, it + 1

    if UNROLL > 1:
        def body_u(carry):
            for _ in range(UNROLL):
                carry = body(carry)
            return carry
    else:
        body_u = body
    X, *_ = jax.lax.while_loop(
        cond, body_u, (X, tr, e0, e0, e0, notconv, jnp.asarray(0)))

    # McWeeny polish: SP2's linear phase doubles injected rounding noise
    # every iteration (lambda -> 2 lambda until the quadratic clamp), so
    # the converged iterate carries ~2^k-amplified dot noise (~2e-3
    # measured).  One 3X^2 - 2X^3 step is contractive around idempotency
    # (delta -> 3 delta^2), collapsing that to ~1e-5 for the gradients'
    # sake; energies are variational and already quadratic in the error.
    polish = []
    for k in range(K):
        Xk = X[k * n:(k + 1) * n]
        Bk = _tdot(Xk, Xk, dot_mode)
        A2k = blockmask[0] * Bk[0:n]
        for i in range(1, m):
            A2k = A2k + blockmask[i] * Bk[i * n:(i + 1) * n]
        B3k = _tdot(Xk, A2k, dot_mode)
        A3k = blockmask[0] * B3k[0:n]
        for i in range(1, m):
            A3k = A3k + blockmask[i] * B3k[i * n:(i + 1) * n]
        polish.append(3.0 * A2k - 2.0 * A3k)
    X = jnp.concatenate(polish, axis=0) if K > 1 else polish[0]
    out_ref[0] = 2.0 * X


def panel_geometry(B: int, n: int):
    """(m, per_prog, pad, G): molecules per panel, per program, batch
    padding, grid size for a (B, n, n) batch in the kernel's layout."""
    m = TILE // n
    per_prog = m * KPANEL
    pad = (-B) % per_prog
    return m, per_prog, pad, (B + pad) // per_prog


def panel_pack(a0: jnp.ndarray) -> jnp.ndarray:
    """(B, n, n) -> (G, K*n, TILE) horizontal panel stacking (the kernel's
    resident layout; fully lane-dense, vs the 8x lane padding XLA gives
    small trailing dims)."""
    B, n, _ = a0.shape
    m, per_prog, pad, G = panel_geometry(B, n)
    if pad:
        a0 = jnp.concatenate(
            [a0, jnp.zeros((pad, n, n), a0.dtype)], axis=0)
    X = (a0.reshape(G, KPANEL, m, n, n)
           .transpose(0, 1, 3, 2, 4)
           .reshape(G, KPANEL * n, m * n))
    if m * n < TILE:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, TILE - m * n)))
    return X


def panel_unpack(X: jnp.ndarray, B: int, n: int) -> jnp.ndarray:
    """(G, K*n, TILE) -> (B, n, n), inverse of :func:`panel_pack`."""
    G = X.shape[0]
    m, per_prog, _, _ = panel_geometry(B, n)
    P = (X[:, :, :m * n]
         .reshape(G, KPANEL, n, m, n)
         .transpose(0, 1, 3, 2, 4)
         .reshape(G * per_prog, n, n))
    return P[:B]


def panel_diagonal(X: jnp.ndarray, B: int, n: int) -> jnp.ndarray:
    """(G, K*n, TILE) -> (B, n) per-molecule matrix diagonals, without
    leaving the panel layout (reshape + strided diagonal — no transpose
    copy; used for Mulliken charges on a panel-resident density)."""
    G = X.shape[0]
    m, per_prog, _, _ = panel_geometry(B, n)
    X5 = X[:, :, :m * n].reshape(G, KPANEL, n, m, n)
    # d[g, k, i, r] = X5[g, k, r, i, r]
    d = jnp.diagonal(X5, axis1=2, axis2=4)          # (G, K, m, n)
    return d.reshape(G * per_prog, n)[:B]


@functools.partial(jax.jit,
                   static_argnames=("n", "eps", "dot_mode", "interpret"))
def sp2_purify_panels(X: jnp.ndarray, nocc: jnp.ndarray, n: int,
                      eps: float = 1.0e-2, dot_mode: str = "highest",
                      interpret: bool = False) -> jnp.ndarray:
    """Panel-resident SP2: input AND output stay in the (G, K*n, TILE)
    panel layout (see :func:`panel_pack`), so a caller holding its
    electronic state in panels pays zero relayout at the kernel boundary.
    ``nocc`` is (B,) for the logical batch; padded internally."""
    G = X.shape[0]
    m = TILE // n
    per_prog = m * KPANEL
    pad = G * per_prog - nocc.shape[0]
    if pad:
        nocc = jnp.concatenate([nocc, jnp.zeros((pad,), nocc.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, KPANEL * n, TILE), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KPANEL * n, TILE), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        # eps floor 1e-5: the HIGHEST-precision dots put the f32 trace
        # noise floor near 1e-6 (measured) — the 1e-2 floor documented for
        # the v1 kernel was an artifact of Mosaic's single-pass-bf16
        # default dots, not of f32 SP2 itself
        functools.partial(_sp2_kernel, n, m, KPANEL, float(max(eps, 1.0e-5)),
                          dot_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
        interpret=interpret,
    )(nocc.astype(X.dtype), X)


@functools.partial(jax.jit, static_argnames=("eps", "dot_mode", "interpret"))
def sp2_purify_tpu(a0: jnp.ndarray, nocc: jnp.ndarray, eps: float = 1.0e-2,
                   dot_mode: str = "highest", interpret: bool = False):
    """P = 2 * purify(a0) for a batch of pre-scaled iterates.

    a0: (B, n, n) float32, n <= 128; nocc: (B,) float occupied counts.
    ``interpret`` runs the kernel in Pallas interpret mode (any backend) —
    used by the CPU test suite for exact-math parity checks.
    """
    B, n, _ = a0.shape
    X = panel_pack(a0)
    out = sp2_purify_panels(X, nocc, n, eps, dot_mode, interpret)
    return panel_unpack(out, B, n)


def supported(n: int, dtype) -> bool:
    return (n <= TILE and dtype == jnp.float32
            and jax.default_backend() == "tpu")
