"""Numerical sanitizers: NaN/Inf detection on values and gradients.

Rebuild of seqm/seqm_functions/check.py:5-42 the JAX way: instead of
mutating-module debug flags and autograd hooks, use

* ``check(x, name)`` — jit-compatible assertion via checkify/debug
  (raises on host when the batch contains non-finite values),
* ``check_grads(f)`` — wraps a function so both its output and its
  cotangents are checked (the custom_vjp analogue of register_hook),
* ``jax.debug_nans`` config for blanket coverage.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def check(x, name: str = "tensor"):
    """Raise (via host callback) if x contains NaN/Inf; returns x."""
    def _host_assert(ok, bad_count):
        if not bool(ok):
            raise FloatingPointError(
                f"{name}: {int(bad_count)} non-finite elements")

    finite = jnp.isfinite(x)
    ok = jnp.all(finite)
    jax.debug.callback(_host_assert, ok, jnp.sum(~finite))
    return x


def stats(x, name: str = "tensor"):
    """Print value statistics from inside jit (cf. check_dist)."""
    jax.debug.print(
        name + ": min={mn} max={mx} mean={me} std={sd}",
        mn=jnp.min(x), mx=jnp.max(x), me=jnp.mean(x), sd=jnp.std(x))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _checked_identity(x, name):
    return x


def _ci_fwd(x, name):
    return check(x, name), None


def _ci_bwd(name, _, g):
    return (check(g, f"grad({name})"),)


_checked_identity.defvjp(_ci_fwd, _ci_bwd)


def check_gradient(x, name: str = "tensor"):
    """Identity that validates x now and its cotangent during backward
    (the functional analogue of check.py's register_hook)."""
    return _checked_identity(x, name)


def save(fn: str, x):
    """Dump an array to .npy for offline inspection (cf. check.py save)."""
    np.save(fn, np.asarray(x))
