"""Dense-A^2 (gather-free ordered-pair) integral pipeline parity.

hcore_dense builds every pairwise quantity on the full (nmol, A, A) grid
by broadcasting (ops/hcore.py); these tests pin it against the flat
upper-triangle path at f64, including the role-swapped overlap cells
(qn_i < qn_j) and both WPackGrid cell orientations, and the end-to-end
energy/force parity through SCF with cfg.dense_pair_grid=True.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyseqm_tpu as pq
from pyseqm_tpu.ops.hcore import hcore, hcore_dense
from pyseqm_tpu.ops.tetci import WPack, assemble_w, from_grid
from pyseqm_tpu.parameters import gather_atom_parameters
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system


def _setup(golden):
    g = golden("am1_ch2o_h2o")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"], jnp.int32)
    coords = jnp.asarray(g["coordinates"], jnp.float64)
    sys = make_system(const, species, coords)
    p = gather_atom_parameters(tables, "AM1", sys.species, None)
    return const, tables, sys, p, species, coords


def test_hcore_dense_parity(golden):
    const, tables, sys, p, *_ = _setup(golden)
    M0, w0 = jax.jit(hcore)(const, sys, p)
    M1, wg = jax.jit(lambda c, s, pp: hcore_dense(c, s, pp))(const, sys, p)
    np.testing.assert_allclose(np.asarray(M1), np.asarray(M0), atol=1e-12)

    iu, ju = sys.pair_i, sys.pair_j
    # upper cells: the flat extraction must reproduce the flat pack's w
    wf = from_grid(wg, iu, ju)
    np.testing.assert_allclose(np.asarray(assemble_w(wf)),
                               np.asarray(assemble_w(w0)), atol=1e-12)
    # lower cells (j, i): their own (ri, U) must represent w_ji = w_ij
    # transposed over the (ab) (cd) index groups
    wl = WPack(ri=wg.rig[:, ju, iu], U=wg.ug[:, ju, iu])
    w_ji = jnp.transpose(assemble_w(wl), (0, 1, 4, 5, 2, 3))
    np.testing.assert_allclose(np.asarray(w_ji),
                               np.asarray(assemble_w(w0)), atol=1e-12)


@pytest.mark.parametrize("use_sp2", [False])
def test_energy_force_dense_parity(golden, use_sp2):
    g = golden("am1_ch2o_h2o")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"], jnp.int32)
    coords = jnp.asarray(g["coordinates"], jnp.float64)

    def run(dense):
        cfg = pq.SEQMConfig(
            method="AM1", dense_pair_grid=dense,
            scf=SCFConfig(eps=1.0e-10, converger=(2,), use_sp2=use_sp2))
        f, out = jax.jit(lambda c: pq.force(const, tables, cfg, species, c))(coords)
        return np.asarray(out.Hf), np.asarray(f)

    hf0, f0 = run(False)
    hf1, f1 = run(True)
    np.testing.assert_allclose(hf1, hf0, atol=1e-9)
    np.testing.assert_allclose(f1, f0, atol=1e-8)
    # and against the reference goldens directly
    np.testing.assert_allclose(hf1, g["Hf"], atol=1e-6)
    np.testing.assert_allclose(f1, g["force"], atol=1e-6)


def test_xl_force_dense_parity(golden):
    from pyseqm_tpu.models.xlbomd import force_xl
    g = golden("am1_ch2o_h2o")
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    species = jnp.asarray(g["species"], jnp.int32)
    coords = jnp.asarray(g["coordinates"], jnp.float64)
    cfg0 = pq.SEQMConfig(method="AM1",
                         scf=SCFConfig(eps=1.0e-10, converger=(2,)))
    out = jax.jit(lambda c: pq.energy(const, tables, cfg0, species, c))(coords)

    def run(dense):
        cfg = pq.SEQMConfig(method="AM1", dense_pair_grid=dense,
                            scf=SCFConfig(eps=1.0e-10, converger=(2,)))
        frc, hf, D = jax.jit(lambda c, P: force_xl(
            const, tables, cfg, species, c, P))(coords, out.P)
        return np.asarray(frc), np.asarray(hf)

    f0, hf0 = run(False)
    f1, hf1 = run(True)
    np.testing.assert_allclose(hf1, hf0, atol=1e-9)
    np.testing.assert_allclose(f1, f0, atol=1e-8)
