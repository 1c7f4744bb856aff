"""Compensated-arithmetic primitives (ops/xsum.py).

These back the energy assembly and the double-float overlap integrals;
the csum custom-JVP (an exact linear rule — hi+lo is an error-free
transformation of the sum) keeps AD from walking the O(log n) two_sum
tree, which dominated the 884-atom force backward.
"""
import jax
import jax.numpy as jnp
import numpy as np

from pyseqm_tpu.ops.xsum import TwoFloat, csum, tf_add, two_sum


def test_csum_exact_vs_f64():
    # adversarial cancellation: large alternating terms + tiny residue
    rng = np.random.default_rng(0)
    big = rng.normal(scale=1e6, size=500).astype(np.float32)
    x = np.concatenate([big, -big[::-1], rng.normal(
        scale=1e-3, size=7).astype(np.float32)])  # odd length too
    tf = jax.jit(csum)(jnp.asarray(x))
    want = np.sum(x.astype(np.float64))
    got = float(tf.hi) + float(tf.lo)
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))
    # plain f32 sum is meaningfully worse on this input or the test is vacuous
    assert abs(float(jnp.sum(jnp.asarray(x))) - want) > abs(got - want)


def test_csum_grad_is_ones():
    # d(hi + lo)/dx_i == 1 exactly (error-free transformation)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 33)),
                    jnp.float32)
    g = jax.jit(jax.grad(lambda v: jnp.sum(
        (lambda t: t.hi + t.lo)(csum(v)))))(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(x))


def test_csum_jvp_and_second_order():
    x = jnp.asarray(np.random.default_rng(2).normal(size=17), jnp.float32)
    t = jnp.asarray(np.random.default_rng(3).normal(size=17), jnp.float32)
    (hi, lo), (dhi, dlo) = jax.jvp(lambda v: tuple(csum(v)), (x,), (t,))
    np.testing.assert_allclose(float(dhi), float(jnp.sum(t)), rtol=1e-6)
    assert float(dlo) == 0.0
    # forward-over-reverse must stay defined (Hessian of a linear map = 0)
    h = jax.jacfwd(jax.grad(lambda v: csum(v).hi + csum(v).lo))(x)
    np.testing.assert_array_equal(np.asarray(h), 0.0)


def test_two_sum_error_free():
    a = jnp.float32(1.0e8)
    b = jnp.float32(1.0)  # swallowed by plain addition
    s, e = jax.jit(two_sum)(a, b)
    assert float(s) + float(e) == 1.0e8 + 1.0
    hi, lo = jax.jit(tf_add)(TwoFloat(*two_sum(a, b)),
                             TwoFloat(*two_sum(b, a)))
    assert float(hi) + float(lo) == 2.0 * (1.0e8 + 1.0)
