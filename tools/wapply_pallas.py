"""Fused two-electron contraction kernel: w-apply in one VMEM pass.

[tools/ because this is a validated but UNUSED experiment: the end-to-end
A/B (commit cc865dc) showed the fused kernel LOSES to the XLA chain in the
full nanostar program — the isolated 26-28 ms scheduling pathology it fixed
does not exist once the dense Fock pipeline fuses around it.  Kept with
its parity check for future VMEM-pipeline work; run
`python tools/wapply_pallas.py` to re-validate.]

The dense-A^2 Fock build (ops/fock.py, WPackGrid branch) applies the
implicit two-electron tensor  w = (U (x) U) . T(ri) . (U (x) U)^T  to 4x4
density blocks on every ordered atom cell:

    y = U . T_perm(ri)[U^T X U] . U^T          (ops/tetci.py _w_apply)

As XLA elementwise code this is a ~400-op DAG per cell whose fusion
splits into dozens of kernel passes — measured 26-28 ms per apply at 884
atoms (~0.3 GFLOP of math; pure scheduling overhead).  This kernel reads
each cell's (ri 22, u 9, X 16) once into VMEM, evaluates the whole chain
on the VPU, and writes the 16 outputs — one HBM pass, no dots (exact
f32; the MXU precision pitfalls of CLAUDE.md don't apply).

The custom VJP exploits the conjugation structure:
  dX   = U . T_perm*(ri)[U^T Ybar U] . U^T     (same kernel, adjoint perm
                                                = perm with free/contracted
                                                index pairs swapped)
  dri[r] = <Ybar_loc, T_r[X_loc]>              (T is a 0/1 tensor)
  dU   = Ybar U B^T + Ybar^T U B + X U C^T + X^T U C,
         B = T_perm(ri)[X_loc], C = T_perm*(ri)[Ybar_loc]
(U row 0 is structurally e_0 and column 0 of rows 1-3 is 0, so only the
3x3 block u = U[1:4, 1:4] carries gradient.)  All three cotangents come
out of ONE backward kernel sharing the rotated intermediates; validated
against jax.vjp of the XLA implementation in interpret mode
(the check() below — run `python tools/wapply_pallas.py`).

cf. reference two_elec_two_center_int.py rotate() (the 878-line unrolled
w assembly) and fock.py:80-131 — the reference materializes w and
contracts with index_add; here the rotation IS the contraction kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS = 64          # (ROWS, 128) cells per grid step and component
LANES = 128


def supported(dtype) -> bool:
    return dtype == jnp.float32 and jax.default_backend() == "tpu"


def _swap_perm(perm):
    return (perm[2], perm[3], perm[0], perm[1])


@functools.lru_cache(maxsize=None)
def _nz(perm):
    from pyseqm_tpu.ops.tetci import _t_nonzeros
    return _t_nonzeros(perm)


# --- per-tile math on lists of (ROWS, LANES) values -------------------------

def _r2l(u, X):
    """X_loc = U^T X U (u is the 3x3 block as u[a][k], 1-based)."""
    t = [[None] * 4 for _ in range(4)]
    for b in range(4):
        t[0][b] = X[0][b]
        for k in range(1, 4):
            t[k][b] = (u[1][k] * X[1][b] + u[2][k] * X[2][b]
                       + u[3][k] * X[3][b])
    y = [[None] * 4 for _ in range(4)]
    for k in range(4):
        y[k][0] = t[k][0]
        for l in range(1, 4):
            y[k][l] = (t[k][1] * u[1][l] + t[k][2] * u[2][l]
                       + t[k][3] * u[3][l])
    return y


def _r2m(u, y):
    """e = U y U^T."""
    s = [[None] * 4 for _ in range(4)]
    for l in range(4):
        s[0][l] = y[0][l]
        for a in range(1, 4):
            s[a][l] = (u[a][1] * y[1][l] + u[a][2] * y[2][l]
                       + u[a][3] * y[3][l])
    e = [[None] * 4 for _ in range(4)]
    for a in range(4):
        e[a][0] = s[a][0]
        for b in range(1, 4):
            e[a][b] = (s[a][1] * u[b][1] + s[a][2] * u[b][2]
                       + s[a][3] * u[b][3])
    return e


def _apply_t(ri, Xloc, perm):
    y = [[None] * 4 for _ in range(4)]
    for (a, b), terms in _nz(perm).items():
        byr = {}
        for r, c, d in terms:
            byr.setdefault(r, []).append((c, d))
        acc = None
        for r, cds in byr.items():
            xs = Xloc[cds[0][0]][cds[0][1]]
            for c, d in cds[1:]:
                xs = xs + Xloc[c][d]
            term = ri[r] * xs
            acc = term if acc is None else acc + term
        y[a][b] = acc
    return y


def _fill_zero(y, like):
    z = None
    for a in range(4):
        for b in range(4):
            if y[a][b] is None:
                if z is None:
                    z = like * 0.0
                y[a][b] = z
    return y


def _u_full(u):
    """Embed the 3x3 block into the structural 4x4 U (row0 = e0, col0 = 0)."""
    one = None

    def U(a, k):
        if a == 0 and k == 0:
            return 1.0
        if a == 0 or k == 0:
            return 0.0
        return u[a][k]
    return U


def _mm(Afn, Bfn):
    """4x4 product of two element-callables -> element-callable (memoized)."""
    cache = {}

    def C(i, j):
        if (i, j) not in cache:
            acc = None
            for k in range(4):
                a = Afn(i, k)
                b = Bfn(k, j)
                if isinstance(a, float) and a == 0.0:
                    continue
                if isinstance(b, float) and b == 0.0:
                    continue
                if isinstance(a, float) and a == 1.0:
                    term = b
                elif isinstance(b, float) and b == 1.0:
                    term = a
                else:
                    term = a * b
                acc = term if acc is None else acc + term
            cache[(i, j)] = 0.0 if acc is None else acc
        return C_cached(i, j)

    def C_cached(i, j):
        return cache[(i, j)]
    return C


def _as_fn(M, transpose=False):
    if transpose:
        return lambda i, j: M[j][i]
    return lambda i, j: M[i][j]


# --- kernels ----------------------------------------------------------------

def _fwd_kernel(perm, *refs):
    ri_refs = refs[:22]
    u_refs = refs[22:31]
    x_refs = refs[31:47]
    y_refs = refs[47:63]
    ri = [r[...] for r in ri_refs]
    u = [[None] * 4 for _ in range(4)]
    for i, (a, k) in enumerate(((a, k) for a in (1, 2, 3) for k in (1, 2, 3))):
        u[a][k] = u_refs[i][...]
    X = [[x_refs[a * 4 + b][...] for b in range(4)] for a in range(4)]
    Xloc = _r2l(u, X)
    y = _fill_zero(_apply_t(ri, Xloc, perm), ri[0])
    e = _r2m(u, y)
    for a in range(4):
        for b in range(4):
            y_refs[a * 4 + b][...] = e[a][b]


def _bwd_kernel(perm, *refs):
    ri_refs = refs[:22]
    u_refs = refs[22:31]
    x_refs = refs[31:47]
    yb_refs = refs[47:63]
    dri_refs = refs[63:85]
    du_refs = refs[85:94]
    dx_refs = refs[94:110]
    ri = [r[...] for r in ri_refs]
    u = [[None] * 4 for _ in range(4)]
    for i, (a, k) in enumerate(((a, k) for a in (1, 2, 3) for k in (1, 2, 3))):
        u[a][k] = u_refs[i][...]
    X = [[x_refs[a * 4 + b][...] for b in range(4)] for a in range(4)]
    Yb = [[yb_refs[a * 4 + b][...] for b in range(4)] for a in range(4)]
    zero = ri[0] * 0.0

    Xloc = _r2l(u, X)
    Eloc = _r2l(u, Yb)
    B = _fill_zero(_apply_t(ri, Xloc, perm), ri[0])
    C = _fill_zero(_apply_t(ri, Eloc, _swap_perm(perm)), ri[0])

    # dX = U C U^T
    dX = _r2m(u, C)
    for a in range(4):
        for b in range(4):
            dx_refs[a * 4 + b][...] = dX[a][b]

    # dri[r] = sum over T_perm nonzeros of Eloc[f1,f2] * Xloc[c1,c2]
    by_r = {}
    for (f1, f2), terms in _nz(perm).items():
        for r, c1, c2 in terms:
            by_r.setdefault(r, []).append((f1, f2, c1, c2))
    for r in range(22):
        acc = None
        for f1, f2, c1, c2 in by_r.get(r, ()):
            term = Eloc[f1][f2] * Xloc[c1][c2]
            acc = term if acc is None else acc + term
        dri_refs[r][...] = zero if acc is None else acc

    # dU = Yb U B^T + Yb^T U B + X U C^T + X^T U C  (3x3 block only)
    Ufn = _u_full(u)
    prods = (
        _mm(_mm(_as_fn(Yb), Ufn), _as_fn(B, transpose=True)),
        _mm(_mm(_as_fn(Yb, transpose=True), Ufn), _as_fn(B)),
        _mm(_mm(_as_fn(X), Ufn), _as_fn(C, transpose=True)),
        _mm(_mm(_as_fn(X, transpose=True), Ufn), _as_fn(C)),
    )
    for i, (a, k) in enumerate(((a, k) for a in (1, 2, 3) for k in (1, 2, 3))):
        acc = None
        for P in prods:
            v = P(a, k)
            if isinstance(v, float):
                continue
            acc = v if acc is None else acc + v
        du_refs[i][...] = zero if acc is None else acc


def _pad_rows(C):
    rows = -(-C // LANES)
    return -(-rows // ROWS) * ROWS


def _to_comps(x, n_comp, R):
    """(..., n_comp) -> list of n_comp (R, 128) arrays."""
    C = int(np.prod(x.shape[:-1]))
    flat = x.reshape(C, n_comp)
    pad = R * LANES - C
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    flat = flat.T.reshape(n_comp, R, LANES)
    return [flat[i] for i in range(n_comp)]


def _from_comps(comps, lead_shape, tail):
    C = int(np.prod(lead_shape))
    out = jnp.stack(comps, 0).reshape(len(comps), -1)[:, :C]
    out = out.T.reshape(*lead_shape, len(comps))
    return out.reshape(*lead_shape, *tail)


def _call(kernel, perm, n_out, comps, interpret):
    R = comps[0].shape[0]
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(kernel, perm),
        grid=(R // ROWS,),
        in_specs=[spec] * len(comps),
        out_specs=[spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((R, LANES), comps[0].dtype)] * n_out,
        interpret=interpret,
    )(*comps)


def _u9(U):
    """(..., 4, 4) -> (..., 9) of the 3x3 block."""
    return U[..., 1:4, 1:4].reshape(*U.shape[:-2], 9)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def w_apply_fused(ri, U, X, perm, interpret=False):
    """y = U . T_perm(ri)[U^T X U] . U^T on every cell, one HBM pass.

    ri (..., 22), U (..., 4, 4), X (..., 4, 4) -> (..., 4, 4).
    Differentiable in ri, U and X (one fused backward kernel).
    """
    return _fwd(ri, U, X, perm, interpret)[0]


def _fwd(ri, U, X, perm, interpret):
    lead = ri.shape[:-1]
    R = _pad_rows(int(np.prod(lead)))
    comps = (_to_comps(ri, 22, R) + _to_comps(_u9(U), 9, R)
             + _to_comps(X.reshape(*lead, 16), 16, R))
    outs = _call(_fwd_kernel, perm, 16, comps, interpret)
    y = _from_comps(outs, lead, (4, 4))
    return y, (ri, U, X)


def _bwd(perm, interpret, res, yb):
    ri, U, X = res
    lead = ri.shape[:-1]
    R = _pad_rows(int(np.prod(lead)))
    comps = (_to_comps(ri, 22, R) + _to_comps(_u9(U), 9, R)
             + _to_comps(X.reshape(*lead, 16), 16, R)
             + _to_comps(yb.reshape(*lead, 16), 16, R))
    outs = _call(_bwd_kernel, perm, 47, comps, interpret)
    dri = _from_comps(outs[:22], lead, (22,)).reshape(ri.shape)
    du = _from_comps(outs[22:31], lead, (9,)).reshape(*lead, 3, 3)
    dU = jnp.zeros_like(U).at[..., 1:4, 1:4].set(du)
    dX = _from_comps(outs[31:47], lead, (4, 4))
    return dri, dU, dX


w_apply_fused.defvjp(_fwd, _bwd)


def check():
    """Parity check vs the XLA chain (forward + all three cotangents)."""
    from pyseqm_tpu.ops.tetci import WPack, _w_apply

    key = jax.random.PRNGKey(3)
    n = 300                       # not a multiple of 128: exercises padding
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ri = jax.random.normal(k1, (n, 22), jnp.float32)
    u3 = jax.random.normal(k2, (n, 3, 3), jnp.float32)
    U = (jnp.zeros((n, 4, 4), jnp.float32)
         .at[:, 0, 0].set(1.0).at[:, 1:, 1:].set(u3))
    X = jax.random.normal(k3, (n, 4, 4), jnp.float32)
    Yb = jax.random.normal(k4, (n, 4, 4), jnp.float32)

    for perm in ((1, 2, 3, 4), (1, 3, 2, 4), (3, 4, 1, 2)):
        ref = jax.jit(
            lambda ri, U, X: _w_apply(WPack(ri=ri, U=U), X, perm))(ri, U, X)
        got = jax.jit(
            lambda ri, U, X: w_apply_fused(ri, U, X, perm, True))(ri, U, X)
        scale = float(jnp.abs(ref).max())
        assert float(jnp.abs(ref - got).max()) < 3.0e-6 * scale, perm

        f_ref = lambda ri, U, X: jnp.vdot(
            _w_apply(WPack(ri=ri, U=U), X, perm), Yb)
        f_got = lambda ri, U, X: jnp.vdot(
            w_apply_fused(ri, U, X, perm, True), Yb)
        gr = jax.jit(jax.grad(f_ref, argnums=(0, 1, 2)))(ri, U, X)
        gg = jax.jit(jax.grad(f_got, argnums=(0, 1, 2)))(ri, U, X)
        for a, b in zip(gr, gg):
            s = float(jnp.abs(a).max())
            assert float(jnp.abs(a - b).max()) < 3.0e-6 * max(s, 1.0), perm
    print("wapply_pallas: parity OK (3 perms, fwd + dri/dU/dX)")


if __name__ == "__main__":
    check()
