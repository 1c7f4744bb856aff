"""Accurate f32 transcendentals for the TPU integral path.

The TPU VPU's hardware `exp` is ~50 ulp in f32 (measured max rel 6.2e-6
over [-40, 40] vs <1 ulp on CPU); the STO overlap A/B integrals and the
core-core Gaussian terms are exp-dominated, so that single approximation
put a ~4e-4 eV floor under Hcore and ~5e-3 eV under the batch Hf on TPU —
the dominant term of the f32 accuracy budget (cf. reference f64 numerics,
diat_overlap.py:284-393).

`exp` here is the classical Cody-Waite + minimax construction, pure f32
VPU ops (~12 instead of 1), accurate to ~1 ulp:

    n = round(x / ln2);  r = x - n*L1 - n*L2   (two-constant reduction)
    exp(x) = 2^n * P(r),  r in [-ln2/2, ln2/2]

with 2^n built exactly by integer bit-assembly (no pow, no hardware exp),
and P the degree-6 Taylor/minimax polynomial (max rel err < 6e-9 on the
reduced interval, i.e. below f32 resolution).

Differentiable via custom_jvp (d exp = exp dx, reusing the accurate value).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .xsum import TwoFloat, tf_const, two_prod, two_sum

_LN2 = 0.6931471805599453094172321215
_LN2_HI = 0.693359375            # exactly representable leading part
_LN2_MID = float(np.float32(_LN2 - _LN2_HI))
_LN2_LO = float(np.float32(_LN2 - _LN2_HI - _LN2_MID))
_INV_LN2 = 1.4426950408889634
# true f32 exp range: max normal at x ~ 88.7228, smallest subnormal
# rounds to zero below x ~ -103.97 (ADVICE r2: widened from +-87/88)
_EXP_HI = 88.7228
_EXP_LO = -103.97


def _scale_2n(p, n):
    """p * 2^n via two exact power-of-two scalings.

    The split n = (n >> 1) + (n - (n >> 1)) keeps each factor's exponent
    in the normal range for n in [-151, 129], so overflow saturates and
    underflow rounds gradually to subnormals like the hardware exp.
    """
    n1 = n >> 1
    n2 = n - n1
    f1 = jax.lax.bitcast_convert_type((n1 + 127) << 23, jnp.float32)
    f2 = jax.lax.bitcast_convert_type((n2 + 127) << 23, jnp.float32)
    return (p * f1) * f2


@jax.custom_jvp
def exp(x: jnp.ndarray) -> jnp.ndarray:
    """~1 ulp float32 exp on TPU (also fine on CPU; f64 passes through).

    Covers the full finite f32 range: saturates to inf above x ~ 88.7228
    and to 0 below x ~ -103.97.  Results in the subnormal range
    (x in (-103.97, -87.34)) are computed by exact power-of-two scaling
    but flush to zero on FTZ platforms (TPU, XLA-CPU fast-math) — same
    behavior as the hardware exp there.
    """
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    # clamp just beyond the saturation thresholds; the final where applies
    # the exact inf / 0 saturation
    xc = jnp.clip(x, -104.0, 89.0)
    n = jnp.round(xc * _INV_LN2)
    r = (xc - n * _LN2_HI) - n * np.float32(_LN2_MID + _LN2_LO)
    # degree-6 polynomial, |r| <= 0.3466: rel err < 6e-9
    p = 1.0 / 720.0
    p = p * r + 1.0 / 120.0
    p = p * r + 1.0 / 24.0
    p = p * r + 1.0 / 6.0
    p = p * r + 0.5
    p = p * r + 1.0
    p = p * r + 1.0
    y = _scale_2n(p, n.astype(jnp.int32))
    return jnp.where(x < _EXP_LO, 0.0, jnp.where(x > _EXP_HI, jnp.inf, y))


@exp.defjvp
def _exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = exp(x)
    return y, y * dx


@jax.custom_jvp
def exp_tf(x: jnp.ndarray) -> TwoFloat:
    """float32 exp to ~1e-11 relative, returned as a TwoFloat.

    Same Cody-Waite construction as `exp` but with the argument reduction
    and the low-order Horner steps carried in double-float arithmetic.
    Used by the precise STO overlap path (ops/overlap.py), where the ~1 ulp
    error of plain `exp` would be amplified ~1e3x by the alternating-sign
    A/B-integral combinations.  Covers the full finite f32 range with
    plain-`exp` saturation semantics (inf above ~88.7228, 0 below
    ~-103.97; the two-step _scale_2n split keeps the 2^n factors in
    range, same as `exp`).
    """
    if x.dtype != jnp.float32:
        y = jnp.exp(x)
        return TwoFloat(y, jnp.zeros_like(y))
    xc = jnp.clip(x, -104.0, 89.0)
    n = jnp.round(xc * _INV_LN2)
    r_hi = xc - n * _LN2_HI                      # exact (Cody-Waite)
    m, me = two_prod(n, jnp.float32(_LN2_MID))
    s, se = two_sum(r_hi, -m)
    lo = (se - me) - n * jnp.float32(_LN2_LO)
    s, lo = two_sum(s, lo)
    r = TwoFloat(s, lo)                          # |r| <= ln2/2, ~1e-13 abs
    # tail T = 1/120 + r/720 + ... + r^4/362880 in plain f32: its rounding
    # enters the result scaled by r^5 <= 5e-3 (< 3e-12 relative)
    t = s * np.float32(1.0 / 362880.0) + np.float32(1.0 / 40320.0)
    t = t * s + np.float32(1.0 / 5040.0)
    t = t * s + np.float32(1.0 / 720.0)
    t = t * s + np.float32(1.0 / 120.0)
    p = r * t + tf_const(1.0 / 24.0)
    p = p * r + tf_const(1.0 / 6.0)
    p = p * r + 0.5
    p = p * r + 1.0
    p = p * r + 1.0
    ni = n.astype(jnp.int32)
    hi = _scale_2n(p.hi, ni)
    lo = _scale_2n(p.lo, ni)
    hi = jnp.where(x < _EXP_LO, 0.0, jnp.where(x > _EXP_HI, jnp.inf, hi))
    lo = jnp.where((x < _EXP_LO) | (x > _EXP_HI), 0.0, lo)
    return TwoFloat(hi, lo)


@exp_tf.defjvp
def _exp_tf_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = exp_tf(x)
    # derivative carried at plain-f32 accuracy (forces don't need the lo bits)
    return y, TwoFloat(y.hi * dx, y.lo * dx)
