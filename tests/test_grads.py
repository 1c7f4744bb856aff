"""Gradients through the SCF fixed point: learned-parameter and coordinate
derivatives via backward mode 1 (recursive adjoint custom_vjp) and mode 2
(backprop through the unrolled loop), pinned to the PyTorch reference
(cf. reference tests/test5.py, test13.py usage)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig


def _cfg(mode):
    conv = (2,) if mode == 1 else (1,)
    return pq.SEQMConfig(
        method="AM1",
        scf=SCFConfig(eps=1.0e-10, converger=conv, backward=mode,
                      backward_eps=1.0e-8, backward_scan_iters=60))


@functools.partial(jax.jit, static_argnums=(0,))
def _hf_and_grads(mode, const, tables, species, coords, learned):
    cfg = _cfg(mode)

    def loss(learned, coords):
        out = pq.energy(const, tables, cfg, species, coords, learned=learned)
        return jnp.sum(out.Hf), out.Hf

    (gl, gc), hf = jax.grad(loss, argnums=(0, 1), has_aux=True)(learned, coords)
    return hf, gl, gc


def _scatter_ref(species, flat):
    """Reference per-real-atom flat array -> (nmol, A) dense."""
    out = np.zeros(species.shape)
    out[species > 0] = flat
    return out


@pytest.mark.parametrize("mode", [1, 2])
def test_param_and_coord_grads(golden, mode):
    g = golden("am1_param_grads")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species_np = g["species"]
    species = jnp.asarray(species_np, dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"], dtype=jnp.float64)

    learned = {
        "U_ss": jnp.asarray(_scatter_ref(species_np, np.asarray(
            tables["U_ss"])[species_np[species_np > 0]])),
        "zeta_s": jnp.asarray(_scatter_ref(species_np, np.asarray(
            tables["zeta_s"])[species_np[species_np > 0]])),
    }
    hf, gl, gc = _hf_and_grads(mode, const, tables, species, coords, learned)

    np.testing.assert_allclose(np.asarray(hf), g[f"Hf_m{mode}"], atol=1e-6)
    atol = 2e-5  # adjoint truncation differs slightly between frameworks
    m = species_np > 0
    np.testing.assert_allclose(np.asarray(gl["U_ss"])[m],
                               g[f"gU_ss_m{mode}"], atol=atol)
    np.testing.assert_allclose(np.asarray(gl["zeta_s"])[m],
                               g[f"gzeta_s_m{mode}"], atol=atol)
    np.testing.assert_allclose(np.asarray(gc), g[f"gcoord_m{mode}"], atol=atol)


def test_param_grad_finite_difference(golden):
    """Mode-1 U_ss gradient vs central differences."""
    g = golden("am1_param_grads")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species_np = g["species"]
    species = jnp.asarray(species_np, dtype=jnp.int32)
    coords = jnp.asarray(g["coordinates"], dtype=jnp.float64)
    base = _scatter_ref(species_np, np.asarray(
        tables["U_ss"])[species_np[species_np > 0]])

    learned = {"U_ss": jnp.asarray(base),
               "zeta_s": jnp.asarray(_scatter_ref(species_np, np.asarray(
                   tables["zeta_s"])[species_np[species_np > 0]]))}
    _, gl, _ = _hf_and_grads(1, const, tables, species, coords, learned)

    h = 1e-5
    d = np.zeros_like(base)
    d[0, 1] = 1.0  # perturb the carbon U_ss of molecule 0

    def hf_with(delta):
        l2 = dict(learned)
        l2["U_ss"] = jnp.asarray(base + delta)
        return np.asarray(_hf_and_grads(1, const, tables, species, coords, l2)[0])

    num = (hf_with(h * d).sum() - hf_with(-h * d).sum()) / (2 * h)
    np.testing.assert_allclose(np.asarray(gl["U_ss"])[0, 1], num, atol=5e-6)
