"""Learned-Hamiltonian parameter models (the HIPNN-interface analogue).

The reference's production ML workflow predicts per-atom NDDO parameters
with a HIPNN network and feeds them to Energy/Force through the
``learned_parameters`` callable (seqm/basics.py:279-283, examples/test.py:
26-41).  The shipped ``examples/model/model.pt`` is a pickled hippynn
graph and cannot be deserialized without the (unavailable) hippynn
package, so this module provides a self-contained JAX equivalent with the
same contract: a geometry-dependent message-free descriptor network

    f(species, coordinates) -> {param_name: (nmol, A) per-atom values}

built from radial-basis atomic environments + per-element MLP heads.
It exercises every piece of the production ML path — the per-step callable,
parameter gather/merge, and gradient flow into network weights — and is
what ``bench.py --config xlbomd-ml`` runs.
"""
from __future__ import annotations

import functools
from typing import Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_PARAM_NAMES = ("U_ss", "U_pp", "zeta_s", "zeta_p",
                       "beta_s", "beta_p", "alpha")


def init_param_model(
    tables: Mapping[str, jnp.ndarray],
    key: jax.Array,
    param_names: Sequence[str] = DEFAULT_PARAM_NAMES,
    n_rbf: int = 16,
    hidden: int = 32,
    r_cut: float = 5.0,
    scale: float = 0.01,
) -> Dict[str, jnp.ndarray]:
    """Random-init weights pytree for :func:`predict_parameters`.

    ``scale`` bounds the relative deviation from the table values (the
    network predicts multiplicative corrections p = table * (1 + scale *
    tanh(head))), so an untrained model still yields physical, SCF-stable
    Hamiltonians — the analogue of HIPNN's initialization around the
    published parameter set (cf. PNAS 119, e2120333119).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dtype = tables[param_names[0]].dtype
    max_z = tables[param_names[0]].shape[0] - 1
    nparam = len(param_names)
    w1 = jax.random.normal(k1, (n_rbf + max_z + 1, hidden), dtype) / jnp.sqrt(
        1.0 * (n_rbf + max_z + 1))
    w2 = jax.random.normal(k2, (hidden, hidden), dtype) / jnp.sqrt(1.0 * hidden)
    w3 = jax.random.normal(k3, (hidden, nparam), dtype) / jnp.sqrt(1.0 * hidden)
    return {
        "w1": w1, "b1": jnp.zeros((hidden,), dtype),
        "w2": w2, "b2": jnp.zeros((hidden,), dtype),
        "w3": w3,
        "centers": jnp.linspace(0.5, r_cut, n_rbf).astype(dtype),
        "gamma": jnp.asarray(4.0, dtype),
        "r_cut": jnp.asarray(r_cut, dtype),
        "scale": jnp.asarray(scale, dtype),
    }


def _descriptors(weights, species, coordinates):
    """Per-atom radial-basis environment + one-hot element identity."""
    dtype = coordinates.dtype
    amask = species > 0
    dvec = coordinates[:, :, None, :] - coordinates[:, None, :, :]
    r2 = jnp.sum(dvec * dvec, axis=-1)
    A = species.shape[1]
    eye = jnp.eye(A, dtype=bool)
    pair_ok = (amask[:, :, None] & amask[:, None, :]) & ~eye
    r = jnp.sqrt(jnp.where(pair_ok, r2, 1.0))
    # smooth cosine cutoff envelope
    rc = weights["r_cut"]
    env = jnp.where(r < rc, 0.5 * (1.0 + jnp.cos(jnp.pi * r / rc)), 0.0)
    env = jnp.where(pair_ok, env, 0.0)
    rbf = jnp.exp(-weights["gamma"]
                  * (r[..., None] - weights["centers"]) ** 2)
    feat = jnp.sum(env[..., None] * rbf, axis=2)          # (nmol, A, n_rbf)
    onehot = jax.nn.one_hot(species, weights["w1"].shape[0]
                            - weights["centers"].shape[0], dtype=dtype)
    return jnp.concatenate([feat, onehot], axis=-1)


def predict_parameters(
    weights,
    tables: Mapping[str, jnp.ndarray],
    species: jnp.ndarray,
    coordinates: jnp.ndarray,
    param_names: Sequence[str] = DEFAULT_PARAM_NAMES,
) -> Dict[str, jnp.ndarray]:
    """Per-atom parameter dict: table value x (1 + scale * tanh(head))."""
    x = _descriptors(weights, species, coordinates)
    h = jnp.tanh(x @ weights["w1"] + weights["b1"])
    h = jnp.tanh(h @ weights["w2"] + weights["b2"])
    heads = jnp.tanh(h @ weights["w3"])                   # (nmol, A, nparam)
    out = {}
    for i, name in enumerate(param_names):
        base = tables[name][species]
        out[name] = base * (1.0 + weights["scale"] * heads[..., i])
    return out


def make_learned_callable(weights, tables,
                          param_names: Sequence[str] = DEFAULT_PARAM_NAMES):
    """The ``learned_parameters``-style callable consumed by energy/force
    (cf. basics.py:279-283): f(species, coordinates) -> dict."""

    def f(species, coordinates):
        return predict_parameters(weights, tables, species, coordinates,
                                  param_names)

    return f
