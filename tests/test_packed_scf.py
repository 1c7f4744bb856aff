"""Fully-packed SCF loop (scf.py scf_solve packed) parity.

With class-segmented dense integrals (dense_pair_grid + pack_pairs +
scf.pack_heavy) the ENTIRE SCF fixed point — Fock builds
(fock_packed_split), density solves (sp2/sym_eig prepacked), DIIS
buffers, polish — runs at the static packed size with zero
per-iteration relayouts.  These tests pin that loop against the flat
full-layout loop at f64: energies, forces, the converged density, every
backward mode, SP2-in-loop, and initial-density reuse across layouts
(the MD drivers feed the previous step's full-layout P back in).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.utils.molecules import make_batch


def _build(K, *, pack, use_sp2=False, backward=0, converger=(2,)):
    scf = SCFConfig(eps=1.0e-9 if not use_sp2 else 1.0e-7,
                    converger=converger, use_sp2=use_sp2,
                    sp2_eps=1.0e-7, backward=backward,
                    backward_eps=1.0e-6, backward_max_iter=60,
                    pack_heavy=K if pack else None)
    return pq.build("AM1", dtype=jnp.float64, scf=scf,
                    dense_pair_grid=None if pack else False,
                    pack_pairs=pack)


def _setup(nmol=8, molsize=8, jitter=0.03):
    sp, co = make_batch(nmol, molsize, jitter=jitter)
    return (jnp.asarray(sp), jnp.asarray(co, jnp.float64),
            pq.packed_heavy_count(sp))


def test_packed_scf_energy_force_parity():
    species, coords, K = _setup()
    res = {}
    for pack in (False, True):
        const, tables, cfg = _build(K, pack=pack)
        f, out = jax.jit(
            lambda c: pq.force(const, tables, cfg, species, c))(coords)
        res[pack] = (np.asarray(out.Hf), np.asarray(f), np.asarray(out.P),
                     np.asarray(out.Eelec))
    np.testing.assert_allclose(res[True][0], res[False][0], atol=1e-9)
    np.testing.assert_allclose(res[True][1], res[False][1], atol=1e-8)
    np.testing.assert_allclose(res[True][2], res[False][2], atol=1e-10)
    np.testing.assert_allclose(res[True][3], res[False][3], atol=1e-9)


def test_packed_scf_sp2_in_loop():
    """SP2 runs prepacked inside the packed while_loop (mode 0 only —
    the kernel-free f64 XLA path here)."""
    species, coords, K = _setup(nmol=4)
    const, tables, cfg0 = _build(K, pack=False, use_sp2=True)
    _, out0 = jax.jit(
        lambda c: pq.force(const, tables, cfg0, species, c))(coords)
    const, tables, cfg1 = _build(K, pack=True, use_sp2=True)
    f1, out1 = jax.jit(
        lambda c: pq.force(const, tables, cfg1, species, c))(coords)
    np.testing.assert_allclose(np.asarray(out1.Hf), np.asarray(out0.Hf),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(out1.P), np.asarray(out0.P),
                               atol=1e-6)


def test_packed_scf_backward_modes():
    """Adjoint (mode 1) and unrolled (mode 2) gradients agree across
    layouts; mode 2 requires converger (1,)."""
    species, coords, K = _setup(nmol=4)
    for backward, converger in ((1, (2,)), (2, (1,))):
        res = {}
        for pack in (False, True):
            const, tables, cfg = _build(K, pack=pack, backward=backward,
                                        converger=converger)
            f, out = jax.jit(lambda c: pq.force(
                const, tables, cfg, species, c))(coords)
            res[pack] = (np.asarray(out.Hf), np.asarray(f))
        np.testing.assert_allclose(res[True][0], res[False][0], atol=1e-9,
                                   err_msg=f"backward={backward}")
        np.testing.assert_allclose(res[True][1], res[False][1], atol=1e-7,
                                   err_msg=f"backward={backward}")


def test_packed_scf_p0_layout_reuse():
    """scf_solve packs a full-layout P0 on entry: feeding the previous
    full-layout converged P (the MD-driver pattern) must reproduce the
    cold-start solution and converge immediately."""
    species, coords, K = _setup(nmol=4)
    const, tables, cfg = _build(K, pack=True)
    out0 = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(
        coords)
    out1 = jax.jit(lambda c, P: pq.energy(
        const, tables, cfg, species, c, P0=P))(coords, out0.P)
    np.testing.assert_allclose(np.asarray(out1.Hf), np.asarray(out0.Hf),
                               atol=1e-10)
    assert not np.asarray(out1.notconverged).any()
