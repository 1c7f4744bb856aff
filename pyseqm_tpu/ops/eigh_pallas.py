"""Pallas TPU kernel: batched symmetric eigensolver (one-sided Jacobi).

Replaces `jnp.linalg.eigh` on batches of small Fock matrices — XLA's
batched eigh costs ~481 ms at (10240, 32, 32) on this hardware, making
the eigh-SCF converger and the eig=True output paths (orbital energies /
charges, cf. reference diag.py:102-173) unusably slow relative to the
SP2 density path.

Design — chosen for the TPU's strengths (wide VPU, cheap lane/sublane
rolls) and around its weaknesses (MXU is latency-bound on tiny matmuls,
Mosaic's default f32 dot is a single bf16 pass):

* **One-sided (Hestenes) Jacobi on the shifted-and-reflected matrix**
  G0 = (hN + delta - A): columns of the converged iterate are
  (lam_shift * u_j), so eigenvectors fall out by normalization — no
  accumulated-V update, no row-side rotations, and the *occupied*
  (lowest-e) eigenvectors get the LARGEST column norms, i.e. the best
  relative accuracy, exactly where the density needs it.
* **XOR pair ordering**: in round d (1..n-1), column j rotates against
  column j^d.  Every pair meets exactly once per sweep (n power of two),
  and the partner permutation j -> j^d decomposes into masked lane rolls
  by the set bits of d — pure VPU `pltpu.roll` + selects, no gathers and
  no permutation matmuls.  (The classical round-robin tournament ordering
  would need arbitrary lane permutations = matmuls with 0/1 matrices,
  which Mosaic lowers to precision-losing bf16 MXU passes.)
* **Panel packing** as in sp2_pallas: molecules side by side in (n, TILE)
  panels, K panels stacked per grid program -> all per-pair inner
  products are per-*column* values, so rotation angles live in (K, TILE)
  rows and the whole sweep is elementwise arithmetic.  The entire kernel
  contains zero matmuls: f32 exact regardless of MXU precision quirks.

Rotation math per column j (partner k = j^d), Hestenes:
    alpha = <g_j, g_j>, beta = <g_k, g_k>, gamma = <g_j, g_k>
    zeta  = (beta - alpha) / (2 gamma)
    t     = sign(zeta) / (|zeta| + sqrt(1 + zeta^2));  c = rsqrt(1+t^2)
    g_j'  = c g_j - (t c) g_k
Both members compute their own zeta (sign flips via the swapped
alpha/beta), which makes the pair update self-consistent without an
explicit p/q role mask.  |gamma| <= tol * sqrt(alpha beta) or zero-norm
(padding) columns skip the rotation arithmetically.

Cited reference behavior: sym_eig_trunc / construct_P (diag.py:57-139).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
KPANEL = 8
MAX_SWEEPS = 16
# stop when max gamma^2/(alpha*beta) over pairs is below this (~(1e-6)^2)
OFF_TOL = 1.0e-12


def _xor_perm_lanes(V, d: int, n: int, loc):
    """Permute lanes j -> j ^ d within each n-lane block (V: (*, TILE))."""
    out = V
    b = 1
    while b < n:
        if d & b:
            down = pltpu.roll(out, shift=TILE - b, axis=1)   # j <- j + b
            up = pltpu.roll(out, shift=b, axis=1)            # j <- j - b
            bit = (loc & b) > 0
            out = jnp.where(bit, up, down)
        b <<= 1
    return out


def _eigh_kernel(n: int, m: int, K: int, x_ref, g_out, nrm_out, off_out):
    dtype = x_ref.dtype
    loc_full = jax.lax.broadcasted_iota(jnp.int32, (K * n, TILE), 1) % n
    loc_rows = jax.lax.broadcasted_iota(jnp.int32, (K, TILE), 1) % n
    col_mol = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) // n
    valid_col = jnp.where(col_mol < m, 1.0, 0.0).astype(dtype)

    def sum_panels(V):
        """(K*n, TILE) -> (K, TILE) column sums within each panel."""
        parts = [jnp.sum(V[k * n:(k + 1) * n], axis=0, keepdims=True)
                 for k in range(K)]
        return jnp.concatenate(parts, axis=0) if K > 1 else parts[0]

    G = x_ref[0] * valid_col

    def sweep_body(carry):
        G, off, sweep = carry
        off = jnp.zeros_like(off)
        for d in range(1, n):
            Gx = _xor_perm_lanes(G, d, n, loc_full)
            alpha = sum_panels(G * G)
            gamma = sum_panels(G * Gx)
            beta = _xor_perm_lanes(alpha, d, n, loc_rows)
            denom = alpha * beta
            off = jnp.maximum(off, jnp.where(denom > 0.0,
                                             gamma * gamma
                                             / jnp.maximum(denom, 1e-30),
                                             0.0))
            rotate = (gamma * gamma
                      > (OFF_TOL * 0.01) * jnp.maximum(denom, 1e-30))
            zeta = (beta - alpha) / (2.0 * jnp.where(rotate, gamma, 1.0))
            t = jnp.sign(zeta) / (jnp.abs(zeta)
                                  + jnp.sqrt(1.0 + zeta * zeta))
            t = jnp.where(rotate, t, 0.0)
            c = jax.lax.rsqrt(1.0 + t * t)
            s = t * c
            c_full = jnp.repeat(c, n, axis=0)
            s_full = jnp.repeat(s, n, axis=0)
            G = c_full * G - s_full * Gx
        return G, off, sweep + 1

    def cond(carry):
        _, off, sweep = carry
        return (jnp.max(off) > OFF_TOL) & (sweep < MAX_SWEEPS)

    off0 = jnp.ones((K, TILE), dtype=dtype)
    G, off, _ = jax.lax.while_loop(cond, sweep_body, (G, off0, jnp.asarray(0)))
    nrm = jnp.sqrt(sum_panels(G * G))
    g_out[0] = G
    nrm_out[0] = nrm
    # final sweep's per-column max relative off-diagonal gamma^2/(alpha
    # beta): > OFF_TOL means this column's molecule hit MAX_SWEEPS
    # unconverged (surfaced by eigh_tpu(with_resid=True))
    off_out[0] = off


@functools.partial(jax.jit, static_argnames=("interpret",))
def _jacobi_panels(X: jnp.ndarray, interpret: bool = False):
    """Run the kernel over (G, K*n, TILE) panel blocks."""
    Gn, Kn, _ = X.shape
    n = Kn // KPANEL
    m = TILE // n
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Gn,),
        in_specs=[pl.BlockSpec((1, Kn, TILE), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, Kn, TILE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KPANEL, TILE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KPANEL, TILE), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_eigh_kernel, n, m, KPANEL),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(X.shape, X.dtype),
            jax.ShapeDtypeStruct((Gn, KPANEL, TILE), X.dtype),
            jax.ShapeDtypeStruct((Gn, KPANEL, TILE), X.dtype),
        ],
        interpret=interpret,
    )(X)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@functools.partial(jax.jit, static_argnames=("interpret", "with_resid"))
def eigh_tpu(A: jnp.ndarray, interpret: bool = False,
             with_resid: bool = False):
    """Batched symmetric eigendecomposition, ascending eigenvalues.

    A: (B, n, n) float32.  Returns (e, v) with e (B, n), v (B, n, n)
    column eigenvectors (A v_j = e_j v_j), matching jnp.linalg.eigh's
    layout.  n is padded internally to a power of two <= 128.

    ``with_resid=True`` appends a (B,) per-molecule convergence residual:
    the final sweep's max relative off-diagonal gamma^2 / (alpha beta).
    A molecule that silently hit MAX_SWEEPS shows resid > OFF_TOL
    (converged ones are at ~1e-14); callers (SCF eigh converger, orbital
    outputs) can surface it like the SCF notconverged flag.
    """
    B, n0, _ = A.shape
    dtype = A.dtype
    n = _next_pow2(n0)

    # Gershgorin bounds per molecule
    aii = jnp.diagonal(A, axis1=-2, axis2=-1)
    ri = jnp.sum(jnp.abs(A), axis=-1) - jnp.abs(aii)
    h1 = jnp.min(aii - ri, axis=-1)
    hN = jnp.max(aii + ri, axis=-1)
    spread = jnp.maximum(hN - h1, 1.0)
    # reflect + shift: G0 = (hN + delta) I - A is PSD with the *lowest*
    # eigenvalues of A mapped to the largest column norms
    sigma = hN + 0.05 * spread

    if n > n0:
        A = jnp.pad(A, ((0, 0), (0, n - n0), (0, n - n0)))
        # padding diagonal at sigma => shifted eigenvalue 0, sorts last
        idx = jnp.arange(n)
        padd = (idx >= n0).astype(dtype)
        A = A + (jnp.eye(n, dtype=dtype)[None]
                 * (padd[None, :] * sigma[:, None])[:, None, :])

    eye = jnp.eye(n, dtype=dtype)
    G0 = eye[None] * sigma[:, None, None] - A

    m = TILE // n
    per_prog = m * KPANEL
    pad = (-B) % per_prog
    if pad:
        G0 = jnp.concatenate([G0, jnp.zeros((pad, n, n), dtype)], axis=0)
        sigma = jnp.concatenate([sigma, jnp.ones((pad,), dtype)])
    Gn = G0.shape[0] // per_prog

    X = (G0.reshape(Gn, KPANEL, m, n, n)
           .transpose(0, 1, 3, 2, 4)
           .reshape(Gn, KPANEL * n, m * n))
    if m * n < TILE:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, TILE - m * n)))

    Gf, nrm, off = _jacobi_panels(X, interpret=interpret)

    Gf = (Gf[:, :, :m * n]
          .reshape(Gn, KPANEL, n, m, n)
          .transpose(0, 1, 3, 2, 4)
          .reshape(Gn * per_prog, n, n))[:B]
    nrm = (nrm[:, :, :m * n]
           .reshape(Gn, KPANEL, m, n)
           .reshape(Gn * per_prog, n))[:B]
    resid = jnp.max((off[:, :, :m * n]
                     .reshape(Gn, KPANEL, m, n)
                     .reshape(Gn * per_prog, n))[:B], axis=-1)

    # eigenvalues of A (unsorted): sigma - |column norm|
    e_raw = sigma[:B, None] - nrm
    order = jnp.argsort(e_raw, axis=-1)
    e = jnp.take_along_axis(e_raw, order, axis=-1)
    v = jnp.take_along_axis(
        Gf / jnp.maximum(nrm, 1e-20)[:, None, :],
        order[:, None, :], axis=-1)
    if n > n0:
        e = e[:, :n0]
        v = v[:, :n0, :n0]
    if with_resid:
        return e, v, resid
    return e, v


def supported(n: int, dtype) -> bool:
    return (_next_pow2(n) <= TILE and dtype == jnp.float32
            and jax.default_backend() == "tpu")


@jax.custom_jvp
def eigh_batched(A: jnp.ndarray):
    """Differentiable batched eigh backed by the Jacobi kernel.

    Same contract as jnp.linalg.eigh.  The JVP uses the standard
    first-order perturbation formulas on the kernel's outputs (identical
    to eigh's own rule, incl. the 1/(e_j - e_i) degeneracy sensitivity),
    so callers that differentiate through sym_eig (SCF backward mode 2,
    orbital-energy gradients) behave exactly as with jnp.linalg.eigh.
    """
    return eigh_tpu(A)


@eigh_batched.defjvp
def _eigh_batched_jvp(primals, tangents):
    (A,) = primals
    (dA,) = tangents
    e, v = eigh_batched(A)
    de, dv = _perturbation_jvp(e, v, dA)
    return (e, v), (de, dv)


def _perturbation_jvp(e, v, dA):
    """First-order eigh perturbation tangents from primal outputs."""
    dA = 0.5 * (dA + jnp.swapaxes(dA, -1, -2))
    M = jnp.einsum('bji,bjk,bkl->bil', v, dA, v)
    de = jnp.diagonal(M, axis1=-2, axis2=-1)
    diff = e[:, None, :] - e[:, :, None]          # e_j - e_i at (i, j)
    n = e.shape[-1]
    offd = ~jnp.eye(n, dtype=bool)
    F = jnp.where(offd & (jnp.abs(diff) > 1e-20),
                  1.0 / jnp.where(jnp.abs(diff) > 1e-20, diff, 1.0), 0.0)
    dv = jnp.einsum('bik,bkj->bij', v, F * M)
    return de, dv


@jax.custom_jvp
def eigh_batched_checked(A: jnp.ndarray):
    """eigh_batched + the per-molecule convergence residual.

    Returns (e, v, resid); resid > OFF_TOL means that molecule's Jacobi
    sweep silently hit MAX_SWEEPS without converging (the reference's
    torch.linalg.eigh, diag.py:102-139, cannot fail this way — callers
    must rescue or flag; see ops/density.py sym_eig).  resid carries a
    zero tangent (a diagnostic, not a differentiable quantity).
    """
    return eigh_tpu(A, with_resid=True)


@eigh_batched_checked.defjvp
def _eigh_batched_checked_jvp(primals, tangents):
    (A,) = primals
    (dA,) = tangents
    e, v, resid = eigh_batched_checked(A)
    de, dv = _perturbation_jvp(e, v, dA)
    return (e, v, resid), (de, dv, jnp.zeros_like(resid))
