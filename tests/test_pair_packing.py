"""Class-segmented static pair packing (pack_pairs) parity.

With the batch-max heavy count K, the pair list is enumerated XX | XH | HH
(system.pair_index_packed) so each segment runs the reference's 22/4/1-
integral pair-class formula (two_elec_two_center_int_local_frame.py:64-66)
on a static slice (ops/hcore.py hcore_split, ops/fock.py WPackSplit
branch).  These tests pin the packed pipeline against the unified flat
path at f64: hcore/Fock physical matrix elements, end-to-end SCF
energy/forces, the XL-BOMD model, the Kbeta ML hook, and the degenerate
segment shapes (all-hydrogen K=0, all-heavy K=A).
"""

import jax
import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.models.xlbomd import force_xl
from pyseqm_tpu.ops.fock import fock
from pyseqm_tpu.ops.hcore import hcore, hcore_split
from pyseqm_tpu.parameters import gather_atom_parameters
from pyseqm_tpu.scf import SCFConfig, init_density
from pyseqm_tpu.system import (make_system, pair_index, pair_index_packed,
                               pair_segment_sizes)
from pyseqm_tpu.utils.molecules import make_batch


def _orbital_block_mask(species):
    """(nmol, A, A, 4, 4) mask of physically existing matrix elements
    (hydrogens are s-only; the packed path leaves their fake p positions
    at zero, like the reference's pair classes, while the unified formula
    writes s-like values there — both are masked out of every solve)."""
    spn = np.asarray(species)
    om = np.zeros(spn.shape + (4,), bool)
    om[..., 0] = spn > 0
    om[..., 1:] = (spn > 1)[..., None]
    return om[:, :, None, :, None] & om[:, None, :, None, :]


def _setup(nmol=8, molsize=8, jitter=0.02):
    sp, co = make_batch(nmol, molsize, jitter=jitter)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float64)
    K = pq.packed_heavy_count(sp)
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    return const, tables, species, coords, K


def test_pair_index_packed_covers_triangle():
    for A, K in ((8, 2), (8, 0), (8, 8), (5, 3), (2, 1)):
        iu, ju = pair_index_packed(A, K)
        assert (iu < ju).all()
        assert sum(pair_segment_sizes(A, K)) == A * (A - 1) // 2
        ref = set(zip(*pair_index(A)))
        assert set(zip(iu.tolist(), ju.tolist())) == ref


def test_hcore_fock_split_parity():
    const, tables, species, coords, K = _setup()
    sys0 = make_system(const, species, coords)
    sysP = make_system(const, species, coords, heavy_count=K)
    p = gather_atom_parameters(tables, "AM1", species, None)
    p.pop("Kbeta", None), p.pop("g_ss_nuc", None)

    M0, w0 = jax.jit(hcore)(const, sys0, p)
    MP, wP = jax.jit(lambda s: hcore_split(const, s, p, K))(sysP)
    bm = _orbital_block_mask(species)
    np.testing.assert_allclose(np.where(bm, np.asarray(MP), 0.0),
                               np.where(bm, np.asarray(M0), 0.0), atol=1e-12)

    # gamma (ss|ss) per pair, matched across the two pair orderings
    g0 = np.asarray(w0.ri[..., 0])
    gP = np.asarray(wP.gam())
    iu0, ju0 = pair_index(species.shape[1])
    iuP, juP = pair_index_packed(species.shape[1], K)
    lut = {(i, j): k for k, (i, j) in enumerate(zip(iu0, ju0))}
    for k, (i, j) in enumerate(zip(iuP, juP)):
        np.testing.assert_allclose(gP[:, k], g0[:, lut[(i, j)]], atol=1e-12)

    P0 = init_density(const, sys0)
    F0 = np.asarray(jax.jit(fock)(sys0, P0, M0, w0, p))
    FP = np.asarray(jax.jit(fock)(sysP, P0, MP, wP, p))
    A = species.shape[1]
    fm = bm.transpose(0, 1, 3, 2, 4).reshape(F0.shape)
    np.testing.assert_allclose(np.where(fm, FP, 0.0),
                               np.where(fm, F0, 0.0), atol=1e-12)


def test_energy_force_pack_pairs_parity():
    const, tables, species, coords, K = _setup()
    outs = {}
    for pp in (False, True):
        scf = SCFConfig(eps=1.0e-9, converger=(2,), pack_heavy=K)
        cfg = pq.SEQMConfig(method="AM1", scf=scf, pack_pairs=pp)
        f, out = jax.jit(
            lambda c: pq.force(const, tables, cfg, species, c))(coords)
        outs[pp] = (np.asarray(out.Hf), np.asarray(f), out.P)
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-9)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-8)

    # XL-BOMD model through the packed pipeline
    scf = SCFConfig(eps=1.0e-9, converger=(2,), pack_heavy=K)
    fr = {}
    for pp in (False, True):
        cfg = pq.SEQMConfig(method="AM1", scf=scf, pack_pairs=pp)
        fx, hf, _ = jax.jit(lambda c, P: force_xl(
            const, tables, cfg, species, c, P))(coords, outs[pp][2])
        fr[pp] = (np.asarray(hf), np.asarray(fx))
    np.testing.assert_allclose(fr[True][0], fr[False][0], atol=1e-9)
    np.testing.assert_allclose(fr[True][1], fr[False][1], atol=1e-8)


def test_pack_pairs_kbeta_hook():
    const, tables, species, coords, K = _setup(nmol=4)
    np_pairs = species.shape[1] * (species.shape[1] - 1) // 2
    rng = np.random.default_rng(0)
    kb = jnp.asarray(1.0 + 0.05 * rng.standard_normal((4, np_pairs, 4)))

    # the ML interface contract: Kbeta is ALWAYS in canonical pair_index
    # order; models/energy.py remaps it to the packed enumeration
    # internally (pair_packed_from_canonical), so the same array must
    # give identical physics with packing on and off
    from pyseqm_tpu.system import pair_packed_from_canonical
    iu0, ju0 = pair_index(species.shape[1])
    iuP, juP = pair_index_packed(species.shape[1], K)
    lut = {(i, j): k for k, (i, j) in enumerate(zip(iu0, ju0))}
    perm = np.asarray([lut[(i, j)] for i, j in zip(iuP, juP)])
    np.testing.assert_array_equal(
        pair_packed_from_canonical(species.shape[1], K), perm)
    outs = {}
    for pp in (False, True):
        scf = SCFConfig(eps=1.0e-9, converger=(2,), pack_heavy=K)
        cfg = pq.SEQMConfig(method="AM1", scf=scf, pack_pairs=pp)
        out = jax.jit(lambda c: pq.energy(
            const, tables, cfg, species, c,
            learned={"Kbeta": kb}))(coords)
        outs[pp] = np.asarray(out.Hf)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-9)


def test_pack_pairs_degenerate_segments():
    """All-hydrogen (K=0: everything HH) and all-heavy (K=A: everything
    XX) batches exercise the empty segment slices."""
    const = pq.make_constants(dtype=jnp.float64)
    tables = pq.load_element_tables("AM1", dtype=jnp.float64)
    cases = (
        (jnp.asarray([[1, 1, 0, 0]], jnp.int32),
         jnp.asarray([[[0., 0., 0.], [0., 0., .74],
                       [9., 9., 9.], [9., 9., 9.5]]], jnp.float64), 0),
        (jnp.asarray([[8, 6, 0, 0]], jnp.int32),
         jnp.asarray([[[0., 0., 0.], [0., 0., 1.13],
                       [9., 9., 9.], [9., 9., 9.5]]], jnp.float64), 2),
        # no hydrogens and no padding: XH and HH segments are empty
        (jnp.asarray([[8, 6]], jnp.int32),
         jnp.asarray([[[0., 0., 0.], [0., 0., 1.13]]], jnp.float64), 2),
    )
    for species, coords, K in cases:
        ref = None
        for pp in (False, True):
            scf = SCFConfig(eps=1.0e-9, converger=(2,),
                            pack_heavy=(K if pp else None))
            cfg = pq.SEQMConfig(method="AM1", scf=scf, pack_pairs=pp)
            f, out = jax.jit(lambda c: pq.force(
                const, tables, cfg, species, c))(coords)
            if ref is None:
                ref = (np.asarray(out.Hf), np.asarray(f))
            else:
                np.testing.assert_allclose(np.asarray(out.Hf), ref[0],
                                           atol=1e-9)
                np.testing.assert_allclose(np.asarray(f), ref[1], atol=1e-8)


def test_pack_pairs_f32_accuracy():
    """The packed f32 pipeline agrees with the unified f32 pipeline to
    f32 SCF noise, and with f64 to the production accuracy class."""
    sp, co = make_batch(8, 8, jitter=0.02)
    species = jnp.asarray(sp)
    K = pq.packed_heavy_count(sp)
    res = {}
    for dtype, tol in ((jnp.float64, None), (jnp.float32, None)):
        const = pq.make_constants(dtype=dtype)
        tables = pq.load_element_tables("AM1", dtype=dtype)
        scf = SCFConfig(eps=1.0e-9 if dtype == jnp.float64 else 1.0e-5,
                        converger=(2,), pack_heavy=K)
        cfg = pq.SEQMConfig(method="AM1", scf=scf, pack_pairs=True)
        coords = jnp.asarray(co, dtype)
        f, out = jax.jit(
            lambda c: pq.force(const, tables, cfg, species, c))(coords)
        res[dtype.__name__] = (np.asarray(out.Hf), np.asarray(f))
    dhf = np.abs(res["float32"][0] - res["float64"][0]).max()
    df = np.abs(res["float32"][1] - res["float64"][1]).max()
    assert dhf < 5.0e-4, dhf
    assert df < 5.0e-3, df


def test_dense_split_parity():
    """hcore_dense_split + the WPackGridSplit Fock match the unified
    dense grid on physical elements, and end-to-end energy/force/XL
    through cfg(dense_pair_grid=True, pack_pairs=True) match the flat
    path at f64."""
    from pyseqm_tpu.ops.hcore import hcore_dense, hcore_dense_split

    const, tables, species, coords, K = _setup(nmol=4)
    sys0 = make_system(const, species, coords)
    p = gather_atom_parameters(tables, "AM1", species, None)
    p.pop("Kbeta", None), p.pop("g_ss_nuc", None)

    M0, wg = jax.jit(lambda s: hcore_dense(const, s, p))(sys0)
    MP, ws = jax.jit(lambda s: hcore_dense_split(const, s, p, K))(sys0)
    bm = _orbital_block_mask(species)
    np.testing.assert_allclose(np.where(bm, np.asarray(MP), 0.0),
                               np.where(bm, np.asarray(M0), 0.0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(ws.gam_grid()),
                               np.asarray(wg.rig[..., 0]), atol=1e-12)

    P0 = init_density(const, sys0)
    F0 = np.asarray(jax.jit(fock)(sys0, P0, M0, wg, p))
    FP = np.asarray(jax.jit(fock)(sys0, P0, MP, ws, p))
    fm = bm.transpose(0, 1, 3, 2, 4).reshape(F0.shape)
    np.testing.assert_allclose(np.where(fm, FP, 0.0),
                               np.where(fm, F0, 0.0), atol=1e-12)

    outs = {}
    for mode in ("flat", "dense_split"):
        scf = SCFConfig(eps=1.0e-9, converger=(2,), pack_heavy=K)
        cfg = pq.SEQMConfig(method="AM1", scf=scf,
                            dense_pair_grid=(mode == "dense_split"),
                            pack_pairs=(mode == "dense_split"))
        f, out = jax.jit(
            lambda c: pq.force(const, tables, cfg, species, c))(coords)
        fx, hf, _ = jax.jit(lambda c, P: force_xl(
            const, tables, cfg, species, c, P))(coords, out.P)
        outs[mode] = (np.asarray(out.Hf), np.asarray(f), np.asarray(hf),
                      np.asarray(fx))
    for a, b in zip(outs["dense_split"], outs["flat"]):
        np.testing.assert_allclose(a, b, atol=1e-8)


def test_packed_io_xl_parity():
    """The fully-packed XL electronic chain (hcore packed_m +
    fock_packed_split + sp2 prepacked, models/xlbomd.py packed_io) must
    match the grid-formulation path exactly: energies, the purified D,
    and forces.  92-atom alkane so the dense class-segmented path (A >=
    64) is active with real interior hydrogens."""
    import dataclasses

    from pyseqm_tpu.models.xlbomd import energy_xl, force_xl
    from pyseqm_tpu.ops.density import (packed_solver_size,
                                        static_pack_mat, static_unpack_mat)
    from pyseqm_tpu.utils.molecules import make_alkane

    z, x = make_alkane(30)
    species = jnp.asarray(z[None], jnp.int32)
    coords = jnp.asarray(x[None], jnp.float64)
    K = pq.packed_heavy_count(z[None])
    A = species.shape[1]
    n_st = packed_solver_size(K, A)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float64,
        scf=SCFConfig(eps=1.0e-10, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-7, pack_heavy=K), pack_pairs=True)
    P0 = jax.jit(lambda c: pq.energy(const, tables, cfg, species, c))(
        coords).P

    o1 = jax.jit(lambda c, P: energy_xl(
        const, tables, cfg, species, c, P))(coords, P0)
    Pp = static_pack_mat(P0, K, n_st)
    o2 = jax.jit(lambda c, P: energy_xl(
        const, tables, cfg, species, c, P, packed_io=True))(coords, Pp)
    np.testing.assert_allclose(np.asarray(o2.Hf), np.asarray(o1.Hf),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(o2.Eelec), np.asarray(o1.Eelec),
                               atol=1e-10)
    D2 = static_unpack_mat(o2.D, K, A)
    np.testing.assert_allclose(np.asarray(D2), np.asarray(o1.D), atol=1e-12)

    f1, hf1, _ = jax.jit(lambda c, P: force_xl(
        const, tables, cfg, species, c, P))(coords, P0)
    f2, hf2, _ = jax.jit(lambda c, P: force_xl(
        const, tables, cfg, species, c, P, packed_io=True))(coords, Pp)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(f1), atol=1e-10)

    # eigh fallback through the packed route
    cfg_e = dataclasses.replace(
        cfg, scf=dataclasses.replace(cfg.scf, use_sp2=False))
    o3 = jax.jit(lambda c, P: energy_xl(
        const, tables, cfg_e, species, c, P, packed_io=True))(coords, Pp)
    np.testing.assert_allclose(np.asarray(o3.Hf), np.asarray(o1.Hf),
                               atol=1e-7)
