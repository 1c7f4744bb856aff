"""Diatomic STO overlap integrals (s/p valence shells).

TPU-native reimplementation of the reference ``diatom_overlap_matrix``
(seqm/seqm_functions/diat_overlap.py:3-246) with two design changes:

* Branch-free: the reference splits pairs into principal-quantum-number
  classes (jcall in {2,3,4}) with boolean fancy indexing; here every branch
  is computed densely and selected with masks — static shapes for XLA.
* The local->molecular frame rotation collapses analytically: with the bond
  unit vector v, the overlap block is
      S[0,0]    = S_ss
      S[p,0]    =  S_sigma_s * v_p
      S[0,p]    = -S_s_sigma * v_p
      S[p,q]    = -S_sigma_sigma * v_p v_q + S_pi_pi * (delta_pq - v_p v_q)
  which replaces the reference's unrolled direction-cosine table
  (diat_overlap.py:186-224).

Precision: the reference evaluates the A/B auxiliary integrals and their
alternating-sign combinations in float64 (diat_overlap.py:284-393); a
plain-f32 evaluation leaves a ~1e-4-level error on strong-overlap pairs
(C=O) that dominates the f32 heat-of-formation budget.  ``precise=True``
(the production default for f32, SEQMConfig.precise_overlap) evaluates the
whole chain in double-float (hi, lo) arithmetic — ops/xsum.py TwoFloat +
ops/accmath.exp_tf — on pure f32 VPU ops, no f64 anywhere.

Supported: elements with valence principal quantum number 1 or 2 (H..F),
matching the reference's actual coverage (its jcall table raises for row-3
elements, diat_overlap.py:65-72).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .accmath import exp as _exp
from .accmath import exp_tf as _exp_tf
from .xsum import TwoFloat, tf_const, tf_prod, tf_recip, two_prod, two_sum

SQRT3 = 1.7320508075688772


def _p15(x):
    """x**1.5 without XLA pow (TPU pow routes through ~50-ulp exp/log).

    The tiny clamp keeps the AD gradient clean at x == 0 (zeta_p of
    hydrogen pairs): d/dx[x*sqrt(x)] evaluates 0 * inf = NaN there,
    where pow's rule returned an exact 0.
    """
    xc = jnp.maximum(x, jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype))
    return jnp.where(x > 0.0, xc * jnp.sqrt(xc), 0.0)


def _p25(x):
    """x**2.5 without XLA pow (same zero-gradient guard as _p15)."""
    xc = jnp.maximum(x, jnp.asarray(jnp.finfo(x.dtype).tiny, x.dtype))
    return jnp.where(x > 0.0, xc * xc * jnp.sqrt(xc), 0.0)


def a_integrals(x0):
    """Auxiliary A_k(x) = int_1^inf t^k exp(-x t) dt for k=0..4.

    x0 == 0 (padding / same-zeta-zero cases) maps to A_k = 0 via the x->inf
    substitution, mirroring diat_overlap.py:284-285.
    """
    inf = jnp.asarray(jnp.inf, dtype=x0.dtype)
    x = jnp.where(x0 != 0.0, x0, inf)
    a1 = _exp(-x) / x
    a2 = a1 + a1 / x
    a3 = a1 + 2.0 * a2 / x
    a4 = a1 + 3.0 * a3 / x
    a5 = a1 + 4.0 * a4 / x
    return [a1, a2, a3, a4, a5]


def b_integrals(x0):
    """Auxiliary B_k(x) = int_{-1}^{1} t^k exp(-x t) dt for k=0..4.

    Three regimes as in the reference (diat_overlap.py:300-393):
    |x| > 0.5 exact recursion, 1e-6 < |x| <= 0.5 Taylor series,
    |x| <= 1e-6 limiting values.  Each branch evaluates on a sanitized
    copy of x so the unselected branch never produces NaN (keeps grads
    clean through jnp.where).
    """
    dtype = x0.dtype
    absx = jnp.abs(x0)
    exact = absx > 0.5
    taylor = (absx <= 0.5) & (absx > 1.0e-6)

    # exact branch; |x| clamped so exp never overflows (f32 caps at ~88).
    # Pairs inside the 40-Bohr overlap cutoff always have |x| < 80, so the
    # clamp only touches values that get masked downstream — without it,
    # their inf intermediates turn zero VJP cotangents into NaN.
    xs = jnp.clip(jnp.where(exact, x0, jnp.asarray(1.0, dtype)), -85.0, 85.0)
    tx = _exp(xs) / xs
    tmx = -_exp(-xs) / xs
    e1 = tx + tmx
    e2 = -tx + tmx + e1 / xs
    e3 = tx + tmx + 2.0 * e2 / xs
    e4 = -tx + tmx + 3.0 * e3 / xs
    e5 = tx + tmx + 4.0 * e4 / xs

    # small-x Taylor branch
    xt = jnp.where(taylor, x0, jnp.asarray(0.0, dtype))
    x2 = xt * xt
    t1 = 2.0 + x2 / 3.0 + x2 * x2 / 60.0 + x2 * x2 * x2 / 2520.0
    t3 = 2.0 / 3.0 + x2 / 5.0 + x2 * x2 / 84.0 + x2 * x2 * x2 / 3240.0
    t5 = 2.0 / 5.0 + x2 / 7.0 + x2 * x2 / 108.0 + x2 * x2 * x2 / 3960.0
    t2 = -2.0 / 3.0 * xt - xt * x2 / 15.0 - xt * x2 * x2 / 420.0
    t4 = -2.0 / 5.0 * xt - xt * x2 / 21.0 - xt * x2 * x2 / 540.0

    # |x| <= 1e-6 limits
    l1 = jnp.asarray(2.0, dtype)
    l3 = jnp.asarray(2.0 / 3.0, dtype)
    l5 = jnp.asarray(2.0 / 5.0, dtype)

    b1 = jnp.where(exact, e1, jnp.where(taylor, t1, l1))
    b2 = jnp.where(exact, e2, jnp.where(taylor, t2, 0.0))
    b3 = jnp.where(exact, e3, jnp.where(taylor, t3, l3))
    b4 = jnp.where(exact, e4, jnp.where(taylor, t4, 0.0))
    b5 = jnp.where(exact, e5, jnp.where(taylor, t5, 0.0 * l5 + l5))
    return [b1, b2, b3, b4, b5]


# ---------------------------------------------------------------------------
# double-float (hi, lo) evaluation of the same A/B chain — pure f32 ops
# ---------------------------------------------------------------------------

def _exp_tf2(x: TwoFloat) -> TwoFloat:
    """exp of a TwoFloat argument: exp_tf(hi) * (1 + lo + lo^2/2)."""
    e = _exp_tf(x.hi)
    corr = x.lo * (1.0 + 0.5 * x.lo)
    return e + e.hi * corr


def _where_tf(m, a: TwoFloat, b: TwoFloat) -> TwoFloat:
    return TwoFloat(jnp.where(m, a.hi, b.hi), jnp.where(m, a.lo, b.lo))


def a_integrals_tf(x0: TwoFloat):
    """A_k(x) in double-float.  Factored as exp(-x) * poly(1/x): the poly
    coefficients are all-positive, so the only cancellation-capable step
    (the final S combinations) sees ~1e-11-relative inputs."""
    mask = x0.hi != 0.0
    # sanitized big-x stand-in for padding: exp_tf saturates it to exact 0
    x = TwoFloat(jnp.where(mask, x0.hi, 1.0e4), jnp.where(mask, x0.lo, 0.0))
    u = tf_recip(x)
    e = _exp_tf2(-x)
    a1 = e * u
    a2 = a1 + a1 * u
    a3 = a1 + 2.0 * (a2 * u)
    a4 = a1 + 3.0 * (a3 * u)
    a5 = a1 + 4.0 * (a4 * u)
    return [a1, a2, a3, a4, a5]


def b_integrals_tf(x0: TwoFloat):
    """B_k(x) in double-float, same three regimes as b_integrals."""
    absx = jnp.abs(x0.hi)
    exact = absx > 0.5
    taylor = (absx <= 0.5) & (absx > 1.0e-6)

    xs_hi = jnp.clip(jnp.where(exact, x0.hi, 1.0), -85.0, 85.0)
    xs_lo = jnp.where(exact & (absx <= 85.0), x0.lo, 0.0)
    xe = TwoFloat(xs_hi, xs_lo)
    u = tf_recip(xe)
    ep = _exp_tf2(xe)
    em = tf_recip(ep)
    tx = ep * u
    tmx = -(em * u)
    e1 = tx + tmx
    e2 = -tx + tmx + e1 * u
    e3 = tx + tmx + 2.0 * (e2 * u)
    e4 = -tx + tmx + 3.0 * (e3 * u)
    e5 = tx + tmx + 4.0 * (e4 * u)

    xt = TwoFloat(jnp.where(taylor, x0.hi, 0.0),
                  jnp.where(taylor, x0.lo, 0.0))
    x2 = xt * xt
    c = tf_const
    t1 = ((x2 * c(1.0 / 2520.0) + c(1.0 / 60.0)) * x2 + c(1.0 / 3.0)) * x2 + 2.0
    t3 = ((x2 * c(1.0 / 3240.0) + c(1.0 / 84.0)) * x2 + c(1.0 / 5.0)) * x2 + c(2.0 / 3.0)
    t5 = ((x2 * c(1.0 / 3960.0) + c(1.0 / 108.0)) * x2 + c(1.0 / 7.0)) * x2 + c(2.0 / 5.0)
    t2 = -(xt * (((x2 * c(1.0 / 420.0) + c(1.0 / 15.0)) * x2) + c(2.0 / 3.0)))
    t4 = -(xt * (((x2 * c(1.0 / 540.0) + c(1.0 / 21.0)) * x2) + c(2.0 / 5.0)))

    zero = TwoFloat(jnp.zeros_like(x0.hi), jnp.zeros_like(x0.hi))
    l1 = zero + 2.0
    l3 = zero + c(2.0 / 3.0)
    l5 = zero + c(2.0 / 5.0)

    b1 = _where_tf(exact, e1, _where_tf(taylor, t1, l1))
    b2 = _where_tf(exact, e2, _where_tf(taylor, t2, zero))
    b3 = _where_tf(exact, e3, _where_tf(taylor, t3, l3))
    b4 = _where_tf(exact, e4, _where_tf(taylor, t4, zero))
    b5 = _where_tf(exact, e5, _where_tf(taylor, t5, l5))
    return [b1, b2, b3, b4, b5]


def _arg_tf(rij, z1, z2, sign) -> TwoFloat:
    """0.5 * rij * (z1 + sign*z2) carried exactly as a TwoFloat."""
    s, e = two_sum(z1, sign * z2)
    p = tf_prod(rij, s) + e * rij
    return TwoFloat(0.5 * p.hi, 0.5 * p.lo)


def _ab_plain(rij, z1, z2):
    """A/B integral stacks for one zeta combination (cf. SET, diat_overlap.py:253)."""
    return (a_integrals(0.5 * rij * (z1 + z2)),
            b_integrals(0.5 * rij * (z1 - z2)))


def _ab_tf(rij, z1, z2):
    return (a_integrals_tf(_arg_tf(rij, z1, z2, 1.0)),
            b_integrals_tf(_arg_tf(rij, z1, z2, -1.0)))


def _s_combinations(rij, zsi, zpi, zsj, zpj, jcall2, jcall3, jcall4,
                    precise, mode=4):
    """The five independent sigma/pi overlap combinations (pre-rotation).

    Returns (S111, S211, S121, S221, S222) for ss, ps-s, s-ps, pp-sigma,
    pp-pi (cf. diat_overlap.py:253-365, the SET/A-B combination tables).

    ``mode`` (STATIC) is the highest jcall class present in the batch
    slice: 4 = general, 3 = the heavier atom may carry p orbitals but the
    lighter is s-only (X-H pair segment: 2 A/B stacks instead of 4, no
    jcall4 combinations), 2 = both s-only (H-H segment: 1 stack, the ss
    combination alone).  Skipped combinations return zeros.
    """
    dtype = rij.dtype
    if precise:
        ab = lambda z1, z2: _ab_tf(rij, z1, z2)           # noqa: E731
        val = lambda t: t.value()                          # noqa: E731
    else:
        ab = lambda z1, z2: _ab_plain(rij, z1, z2)         # noqa: E731
        val = lambda t: t                                  # noqa: E731

    r2 = rij * rij
    r4 = r2 * r2
    r5 = r4 * rij
    zero = jnp.zeros_like(rij).astype(dtype)

    # --- s(i)-s(j) ---
    A, B = ab(zsi, zsj)
    s111_2 = (_p15(zsi * zsj * r2) / 4.0) * val(A[2] * B[0] - B[2] * A[0])
    if mode == 2:
        return (jnp.where(jcall2, s111_2, 0.0).astype(dtype),
                zero, zero, zero, zero)
    s111_3 = (_p15(zsj) * _p25(zsi) * r4 / (SQRT3 * 8.0)
              * val(A[3] * B[0] - B[3] * A[0] + A[2] * B[1] - B[2] * A[1]))
    if mode >= 4:
        s111_4 = (_p25(zsj * zsi) * r5 / 48.0
                  * val(A[4] * B[0] + B[4] * A[0] - 2.0 * (A[2] * B[2])))
        S111 = jnp.where(jcall2, s111_2, jnp.where(jcall3, s111_3,
                         jnp.where(jcall4, s111_4, 0.0))).astype(dtype)
    else:
        S111 = jnp.where(jcall2, s111_2,
                         jnp.where(jcall3, s111_3, 0.0)).astype(dtype)

    # --- p_sigma(i)-s(j) ---
    A, B = ab(zpi, zsj)
    s211_3 = (_p15(zsj) * _p25(zpi) * r4 / 8.0
              * val(A[2] * B[0] - B[2] * A[0] + A[3] * B[1] - B[3] * A[1]))
    if mode == 3:
        return (S111,
                jnp.where(jcall3, s211_3, 0.0).astype(dtype),
                zero, zero, zero)
    s211_4 = (_p25(zsj * zpi) * r5 / (16.0 * SQRT3)
              * val(A[3] * (B[0] - B[2]) - A[1] * (B[2] - B[4])
                    + B[3] * (A[0] - A[2]) - B[1] * (A[2] - A[4])))
    S211 = jnp.where(jcall3, s211_3, jnp.where(jcall4, s211_4, 0.0)).astype(dtype)

    # --- s(i)-p_sigma(j) ---
    A, B = ab(zsi, zpj)
    s121_4 = (_p25(zpj * zsi) * r5 / (16.0 * SQRT3)
              * val(A[3] * (B[0] - B[2]) - A[1] * (B[2] - B[4])
                    - B[3] * (A[0] - A[2]) + B[1] * (A[2] - A[4])))
    S121 = jnp.where(jcall4, s121_4, 0.0).astype(dtype)

    # --- p(i)-p(j) ---
    A, B = ab(zpi, zpj)
    wf = _p25(zpj * zpi) * r5 / 16.0
    s221_4 = -wf * val(B[2] * (A[4] + A[0]) - A[2] * (B[4] + B[0]))
    s222_4 = 0.5 * wf * val(A[4] * (B[0] - B[2]) - B[4] * (A[0] - A[2])
                            - A[2] * B[0] + B[2] * A[0])
    S221 = jnp.where(jcall4, s221_4, 0.0).astype(dtype)
    S222 = jnp.where(jcall4, s222_4, 0.0).astype(dtype)
    return S111, S211, S121, S221, S222


@functools.lru_cache(maxsize=None)
def _make_s_combinations_tf(mode):
    """custom_jvp wrapper of the double-float chain for one static mode.

    Double-float primal, plain-f32 tangent.  Only the *value* of S needs
    the extended precision (it feeds the alternating-sign Hf
    cancellation); its derivative feeds forces, whose f32 noise floor
    (~2e-4 eV/A) is orders above the ~1e-7 relative gap between the plain
    and double-float derivative.  Without this rule AD walks every
    two_sum/two_prod/exp_tf in the chain — measured as the dominant
    hcore-backward cost.  custom_jvp (not vjp) keeps forward-over-reverse
    Hessians working; the rule itself is plain ops, so it is
    differentiable again for second order.
    """

    @jax.custom_jvp
    def s_tf(rij, zsi, zpi, zsj, zpj, jcall2, jcall3, jcall4):
        return _s_combinations(rij, zsi, zpi, zsj, zpj,
                               jcall2, jcall3, jcall4, True, mode)

    @s_tf.defjvp
    def s_tf_jvp(primals, tangents):
        rij, zsi, zpi, zsj, zpj, j2, j3, j4 = primals
        out = s_tf(*primals)
        _, dout = jax.jvp(
            lambda r, a, b, c, d: _s_combinations(r, a, b, c, d, j2, j3, j4,
                                                  False, mode),
            (rij, zsi, zpi, zsj, zpj), tangents[:5])
        return out, dout

    return s_tf


def _s_combinations_tf(rij, zsi, zpi, zsj, zpj, jcall2, jcall3, jcall4,
                       mode=4):
    return _make_s_combinations_tf(mode)(rij, zsi, zpi, zsj, zpj,
                                         jcall2, jcall3, jcall4)


def _reg_v(xij):
    """Bond direction with the reference's near-axis regularization
    (diat_overlap.py:24-45): below xy < 1e-10 snap to +-z."""
    xy = jnp.sqrt(xij[..., 0] ** 2 + xij[..., 1] ** 2)
    zsign = jnp.sign(xij[..., 2])
    zero = jnp.zeros_like(zsign)
    return jnp.where((xy >= 1.0e-10)[..., None], xij,
                     jnp.stack([zero, zero, zsign], axis=-1))


def diatom_overlap_xh(qni, qnj, xij, rij, zeta_i, zsj, precise=False,
                      row3=False):
    """Overlap column (AOs on i | s AO on j) for the X-H pair segment.

    The lighter atom is guaranteed s-only (qnj <= 1), so only the first
    column of the 4x4 block is nonzero: S[0] = S_ss, S[1+p] = S_sigma_s
    v_p.  Two A/B stacks and two combinations instead of four/five
    (cf. the reference's jcall==3 branch, diat_overlap.py:253-298).
    ``row3`` (STATIC) adds the (3,1) class via the generated
    coefficients (ops/overlap_general.py).

    Returns (..., 4).
    """
    dtype = rij.dtype
    jcall2 = (qni == 1) & (qnj == 1)
    jcall3 = (qni == 2) & (qnj == 1)
    zsi, zpi = zeta_i[..., 0], zeta_i[..., 1]
    f = jnp.zeros_like(rij)
    if precise and dtype == jnp.float32:
        S111, S211, _, _, _ = _s_combinations_tf(
            rij, zsi, zpi, zsj, f + 1.0, jcall2, jcall3, jcall3 & False,
            mode=3)
    else:
        S111, S211, _, _, _ = _s_combinations(
            rij, zsi, zpi, zsj, f + 1.0, jcall2, jcall3, jcall3 & False,
            False, mode=3)
    if row3:
        from .overlap_general import (s_combinations_general,
                                      s_combinations_general_tf)
        gen = (s_combinations_general_tf
               if precise and dtype == jnp.float32 else
               s_combinations_general)
        mk = (qni == 3) & (qnj == 1)
        g = gen(3, 1, rij, zsi, zpi, zsj, f + 1.0)
        S111 = jnp.where(mk, g[0], S111)
        S211 = jnp.where(mk, g[1], S211)
    v = _reg_v(xij)
    return jnp.concatenate([S111[..., None], S211[..., None] * v], axis=-1)


def diatom_overlap_hh(qni, qnj, rij, zsi, zsj, precise=False, row3=False):
    """Scalar s-s overlap for the H-H pair segment (jcall==2 branch).
    ``row3`` is accepted for caller uniformity and ignored — both atoms
    of an H-H pair are row 1 by construction."""
    dtype = rij.dtype
    jcall2 = (qni == 1) & (qnj == 1)
    f = jnp.zeros_like(rij)
    if precise and dtype == jnp.float32:
        S111, _, _, _, _ = _s_combinations_tf(
            rij, zsi, f + 1.0, zsj, f + 1.0, jcall2, jcall2 & False,
            jcall2 & False, mode=2)
    else:
        S111, _, _, _, _ = _s_combinations(
            rij, zsi, f + 1.0, zsj, f + 1.0, jcall2, jcall2 & False,
            jcall2 & False, False, mode=2)
    return S111


def diatom_overlap(qni, qnj, xij, rij, zeta_i, zeta_j, precise=False,
                   row3=False):
    """Overlap 4x4 block between the AOs of an (i, j) pair.

    Args:
      qni, qnj: (...,) int valence principal quantum numbers (i heavier: qni>=qnj).
      xij: (..., 3) unit vector i->j.
      rij: (...,) distance in Bohr.
      zeta_i, zeta_j: (..., 2) [zeta_s, zeta_p] orbital exponents.
      precise: evaluate the A/B chain in double-float (f32 inputs only;
        matches the reference's f64 numerics to ~1e-8 absolute; gradients
        use the plain-f32 chain — see _s_combinations_tf_jvp).
      row3: STATIC — additionally evaluate the (3,1)/(3,2)/(3,3)
        principal-quantum-number classes via the generated-coefficient
        machinery (ops/overlap_general.py).  EXCEEDS the reference, which
        raises for any row-3 pair (diat_overlap.py:65-72).  With
        ``precise`` on f32 the row-3 primal also runs the double-float
        chain (s_combinations_general_tf: high-k binomial cancellation
        loses ~4.5e-3 in plain f32, ~2e-7 in tf) with the plain-f32
        chain as its custom_jvp tangent — same policy as rows 1-2.

    Returns: (..., 4, 4) overlap in the molecular frame (rows: AOs on i).
    """
    dtype = rij.dtype
    jcall2 = (qni == 1) & (qnj == 1)
    jcall3 = (qni == 2) & (qnj == 1)
    jcall4 = (qni == 2) & (qnj == 2)

    zsi, zpi = zeta_i[..., 0], zeta_i[..., 1]
    zsj, zpj = zeta_j[..., 0], zeta_j[..., 1]
    if precise and dtype == jnp.float32:
        S111, S211, S121, S221, S222 = _s_combinations_tf(
            rij, zsi, zpi, zsj, zpj, jcall2, jcall3, jcall4)
    else:
        S111, S211, S121, S221, S222 = _s_combinations(
            rij, zsi, zpi, zsj, zpj, jcall2, jcall3, jcall4, False)

    if row3:
        from .overlap_general import (s_combinations_general,
                                      s_combinations_general_tf)
        gen = (s_combinations_general_tf
               if precise and dtype == jnp.float32 else
               s_combinations_general)
        for (na, nb) in ((3, 1), (3, 2), (3, 3)):
            mk = (qni == na) & (qnj == nb)
            g = gen(na, nb, rij, zsi, zpi, zsj, zpj)
            S111 = jnp.where(mk, g[0], S111)
            S211 = jnp.where(mk, g[1], S211)
            if nb > 1:
                # nb == 1 (X-H): the lighter atom is s-only
                S121 = jnp.where(mk, g[2], S121)
                S221 = jnp.where(mk, g[3], S221)
                S222 = jnp.where(mk, g[4], S222)

    v = _reg_v(xij)

    eye3 = jnp.eye(3, dtype=dtype)
    vv = v[..., :, None] * v[..., None, :]            # (..., 3, 3)
    pp = -S221[..., None, None] * vv + S222[..., None, None] * (eye3 - vv)

    di = jnp.zeros(rij.shape + (4, 4), dtype=dtype)
    di = di.at[..., 0, 0].set(S111)
    di = di.at[..., 1:, 0].set(S211[..., None] * v)
    di = di.at[..., 0, 1:].set(-S121[..., None] * v)
    di = di.at[..., 1:, 1:].set(pp)
    return di
