"""Pallas kernel math parity (interpret mode, CPU).

The production kernels (ops/sp2_pallas.py, ops/eigh_pallas.py) run only on
TPU; interpret mode executes the identical kernel program with exact XLA
ops, so these tests pin the *math* — Mosaic lowering quirks (e.g. the
measured single-pass-bf16 default dot precision) are covered by explicit
`precision=HIGHEST` in the kernels themselves plus on-device benches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyseqm_tpu.ops.eigh_pallas import eigh_tpu
from pyseqm_tpu.ops.sp2_pallas import sp2_purify_tpu


def _gap_matrices(B, n, nocc, key, f32=True):
    """Random symmetric matrices with a clean occupied/virtual gap."""
    k1, k2 = jax.random.split(key)
    dtype = jnp.float32
    Q, _ = jnp.linalg.qr(jax.random.normal(k1, (B, n, n), dtype))
    evals = jnp.concatenate([
        -10.0 + 2.0 * jax.random.uniform(k2, (B, nocc), dtype),
        2.0 + 6.0 * jax.random.uniform(k2, (B, n - nocc), dtype),
    ], axis=1)
    F = jnp.einsum('bik,bk,bjk->bij', Q, evals, Q)
    F = 0.5 * (F + jnp.swapaxes(F, -1, -2))
    occ = (jnp.arange(n)[None, :] < nocc).astype(dtype)
    P = 2.0 * jnp.einsum('bik,bk,bjk->bij', Q, occ, Q)
    return F, P


def test_sp2_kernel_interpret_parity():
    B, n, nocc = 12, 32, 8
    F, P_exact = _gap_matrices(B, n, nocc, jax.random.PRNGKey(0))
    aii = jnp.diagonal(F, axis1=-2, axis2=-1)
    ri = jnp.sum(jnp.abs(F), axis=-1) - jnp.abs(aii)
    h1 = jnp.min(aii - ri, axis=-1)
    hN = jnp.max(aii + ri, axis=-1)
    a0 = (jnp.eye(n, dtype=F.dtype)[None] * hN[:, None, None] - F) \
        / (hN - h1)[:, None, None]
    nocc_f = jnp.full((B,), float(nocc), jnp.float32)

    P = np.asarray(sp2_purify_tpu(a0, nocc_f, 1.0e-5, interpret=True))
    assert np.abs(P - np.asarray(P_exact)).max() < 5.0e-5
    # idempotency after the McWeeny polish
    half = P / 2.0
    assert np.abs(half @ half - half).max() < 5.0e-5
    tr = np.trace(P, axis1=1, axis2=2)
    np.testing.assert_allclose(tr, 2.0 * nocc, atol=1e-4)


def test_sp2_kernel_partial_batch_padding():
    # B not a multiple of the per-program molecule count exercises the
    # zero-molecule padding path
    B, n, nocc = 7, 32, 5
    F, P_exact = _gap_matrices(B, n, nocc, jax.random.PRNGKey(1))
    aii = jnp.diagonal(F, axis1=-2, axis2=-1)
    ri = jnp.sum(jnp.abs(F), axis=-1) - jnp.abs(aii)
    h1 = jnp.min(aii - ri, axis=-1)
    hN = jnp.max(aii + ri, axis=-1)
    a0 = (jnp.eye(n, dtype=F.dtype)[None] * hN[:, None, None] - F) \
        / (hN - h1)[:, None, None]
    P = np.asarray(sp2_purify_tpu(a0, jnp.full((B,), float(nocc), jnp.float32),
                                  1.0e-5, interpret=True))
    assert P.shape == (B, n, n)
    assert np.abs(P - np.asarray(P_exact)).max() < 5.0e-5


def test_eigh_kernel_interpret_parity():
    B, n = 16, 32
    A = jax.random.normal(jax.random.PRNGKey(3), (B, n, n), jnp.float32)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2)) * 5.0
    e, v = eigh_tpu(A, interpret=True)
    e = np.asarray(e, np.float64)
    v = np.asarray(v, np.float64)
    An = np.asarray(A, np.float64)
    nrm = np.abs(An).max()
    # ascending order, eigen residual, orthonormality
    assert (np.diff(e, axis=1) >= -1e-5).all()
    res = np.abs(np.einsum('bij,bjk->bik', An, v) - e[:, None, :] * v).max()
    assert res < 5.0e-4 * nrm
    orth = np.abs(np.einsum('bji,bjk->bik', v, v) - np.eye(n)).max()
    assert orth < 1.0e-5
    e_ref = np.linalg.eigvalsh(An)
    np.testing.assert_allclose(e, e_ref, atol=5e-4 * nrm)


def test_eigh_kernel_convergence_resid():
    # with_resid surfaces the silent-MAX_SWEEPS case (ADVICE r2): a
    # converged batch reports resid <= OFF_TOL for every molecule
    from pyseqm_tpu.ops.eigh_pallas import OFF_TOL
    B, n = 16, 32
    A = jax.random.normal(jax.random.PRNGKey(5), (B, n, n), jnp.float32)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2)) * 5.0
    e, v, resid = eigh_tpu(A, interpret=True, with_resid=True)
    assert resid.shape == (B,)
    assert (np.asarray(resid) <= OFF_TOL).all()
    # identical decomposition either way
    e2, v2 = eigh_tpu(A, interpret=True)
    np.testing.assert_array_equal(np.asarray(e), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))


def test_eigh_kernel_nonpow2_and_degenerate():
    # n=24 exercises the power-of-two padding; an exact double eigenvalue
    # exercises the cluster robustness jnp.linalg.eigh JVPs lack
    B, n = 8, 24
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.PRNGKey(9),
                                           (B, n, n), jnp.float32))
    evals = jnp.sort(jax.random.normal(jax.random.PRNGKey(11), (B, n)) * 4.0,
                     axis=-1)
    evals = evals.at[:, 5].set(evals[:, 4])
    A = jnp.einsum('bik,bk,bjk->bij', Q, evals.astype(jnp.float32), Q)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    e, v = eigh_tpu(A, interpret=True)
    e_ref = np.linalg.eigvalsh(np.asarray(A, np.float64))
    np.testing.assert_allclose(np.asarray(e, np.float64), e_ref, atol=1e-4)
    v = np.asarray(v, np.float64)
    orth = np.abs(np.einsum('bji,bjk->bik', v, v) - np.eye(n)).max()
    assert orth < 1.0e-5


def _converged_FP(nmol=8, seed=11):
    """Real converged (sys, F, P_exact) for a small organic batch."""
    import pyseqm_tpu as pq
    from pyseqm_tpu.parameters import gather_atom_parameters  # noqa: F401
    from pyseqm_tpu.scf import SCFConfig
    from pyseqm_tpu.utils.molecules import make_batch

    sp, co = make_batch(nmol, 8, jitter=0.02, seed=seed)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float32)
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32, scf=SCFConfig(eps=1.0e-6, converger=(2,)))
    h = jax.jit(lambda c: pq.hamiltonian(const, tables, cfg, species, c))(
        coords)
    sys = pq.make_system(const, species, coords)
    return sys, h.F, h.P


def test_sp2_tight_bounds_and_debug_iters():
    """Gelfand-refined spectral bounds must converge to the same P, in at
    most as many iterations as plain Gershgorin (the scaled gap grows)."""
    from pyseqm_tpu.ops.density import sp2

    sys, F, P_ref = _converged_FP()
    P0, it0 = jax.jit(lambda f: sp2(sys, f, 1.0e-5, debug_iters=True))(F)
    P1, it1 = jax.jit(lambda f: sp2(sys, f, 1.0e-5, tight_bounds=True,
                                    debug_iters=True))(F)
    assert np.abs(np.asarray(P0) - np.asarray(P_ref)).max() < 5.0e-4
    assert np.abs(np.asarray(P1) - np.asarray(P_ref)).max() < 5.0e-4
    if int(it0) == -1:
        # Pallas-kernel path (TPU backend): iteration count not exposed
        pytest.skip("kernel path does not expose iteration counts")
    assert int(it1) <= int(it0)
    assert int(it0) > 0


def test_eigh_rescue_scoring():
    """ref-based scoring catches a wrong-occupation P (invariant subspace,
    invisible to the commutator); commutator scoring catches a rotated /
    unconverged iterate.  Untouched molecules must pass through exactly."""
    from pyseqm_tpu.ops.density import eigh_rescue

    sys, F, P = _converged_FP()
    nmol = P.shape[0]

    # (a) wrong occupation: molecule 0's P replaced by a uniform-trace
    # idempotent-ish blob -- [F,P'] != 0 not guaranteed small, so use ref
    P_bad = P.at[0].set(P[1])
    fixed = jax.jit(lambda f, p: eigh_rescue(sys, f, p, frac=1.0 / nmol,
                                             ref=P))(F, P_bad)
    assert np.abs(np.asarray(fixed[0]) - np.asarray(P[0])).max() < 5.0e-4
    np.testing.assert_array_equal(np.asarray(fixed[1:]),
                                  np.asarray(P_bad[1:]))

    # (b) rotated iterate: symmetric noise breaks [F,P]=0 -> commutator
    # scoring selects it without a reference
    noise = 0.05 * jnp.eye(P.shape[-1])[None].at[:, 0, 1].set(0.05)
    P_rot = P.at[2].add(noise[0] + noise[0].T)
    fixed2 = jax.jit(lambda f, p: eigh_rescue(sys, f, p,
                                              frac=1.0 / nmol))(F, P_rot)
    assert np.abs(np.asarray(fixed2[2]) - np.asarray(P[2])).max() < 5.0e-4


def test_sp2_kernel_n16_interpret_parity():
    """n=16 panel geometry (m=8 molecules per 128-lane tile) — the static
    compact-orbital size the headline batch packs to (pack_heavy)."""
    B, n, nocc = 20, 16, 5
    F, P_exact = _gap_matrices(B, n, nocc, jax.random.PRNGKey(2))
    aii = jnp.diagonal(F, axis1=-2, axis2=-1)
    ri = jnp.sum(jnp.abs(F), axis=-1) - jnp.abs(aii)
    h1 = jnp.min(aii - ri, axis=-1)
    hN = jnp.max(aii + ri, axis=-1)
    a0 = (jnp.eye(n, dtype=F.dtype)[None] * hN[:, None, None] - F) \
        / (hN - h1)[:, None, None]
    P = np.asarray(sp2_purify_tpu(a0, jnp.full((B,), float(nocc), jnp.float32),
                                  1.0e-5, interpret=True))
    assert P.shape == (B, n, n)
    assert np.abs(P - np.asarray(P_exact)).max() < 5.0e-5


def test_eigh_rescue_unconverged_panels():
    """A panel that silently hits MAX_SWEEPS must be flagged AND re-solved
    exactly (VERDICT r3 #5): with MAX_SWEEPS forced to 1 the Jacobi sweep
    cannot converge, resid exceeds OFF_TOL, and rescue_unconverged_panels
    replaces the bad decompositions with jnp.linalg.eigh's."""
    import pyseqm_tpu.ops.eigh_pallas as ep
    from pyseqm_tpu.ops.density import rescue_unconverged_panels

    B, n = 16, 32
    A = jax.random.normal(jax.random.PRNGKey(11), (B, n, n), jnp.float32)
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2)) * 5.0

    old = ep.MAX_SWEEPS
    try:
        ep.MAX_SWEEPS = 1
        jax.clear_caches()   # MAX_SWEEPS is baked in at trace time
        e, v, resid = eigh_tpu(A, interpret=True, with_resid=True)
    finally:
        ep.MAX_SWEEPS = old
        jax.clear_caches()

    bad_expected = np.asarray(resid) > ep.OFF_TOL
    assert bad_expected.any(), "1-sweep Jacobi unexpectedly converged"

    e2, v2, bad = jax.jit(rescue_unconverged_panels)(A, e, v, resid)
    np.testing.assert_array_equal(np.asarray(bad), bad_expected)

    # rescued panels carry the exact decomposition
    e_ref = np.linalg.eigvalsh(np.asarray(A, np.float64))
    e2n = np.asarray(e2, np.float64)
    v2n = np.asarray(v2, np.float64)
    An = np.asarray(A, np.float64)
    nrm = np.abs(An).max()
    for b in range(B):
        if bad_expected[b]:
            np.testing.assert_allclose(e2n[b], e_ref[b], atol=5e-4 * nrm)
            res = np.abs(An[b] @ v2n[b] - e2n[b][None, :] * v2n[b]).max()
            assert res < 5.0e-4 * nrm
        else:
            # untouched panels keep the kernel's output
            np.testing.assert_array_equal(e2n[b], np.asarray(e, np.float64)[b])

    # a converged batch must flag nothing and pass through unchanged
    ec, vc, residc = eigh_tpu(A, interpret=True, with_resid=True)
    ec2, vc2, badc = jax.jit(rescue_unconverged_panels)(A, ec, vc, residc)
    assert not np.asarray(badc).any()
    np.testing.assert_array_equal(np.asarray(ec2), np.asarray(ec))
    np.testing.assert_array_equal(np.asarray(vc2), np.asarray(vc))


def test_sp2_panel_layout_roundtrip_and_diagonal():
    """panel_pack/panel_unpack are exact inverses (incl. batch padding);
    panel_diagonal reads per-molecule matrix diagonals without leaving
    the panel layout; sp2_purify_panels == sp2_purify_tpu modulo layout
    (interpret mode)."""
    from pyseqm_tpu.ops import sp2_pallas as sp

    key = jax.random.PRNGKey(7)
    B, n = 700, 16          # not a multiple of per_prog: exercises padding
    a = jax.random.normal(key, (B, n, n), jnp.float32)
    X = sp.panel_pack(a)
    m, per_prog, pad, G = sp.panel_geometry(B, n)
    assert X.shape == (G, sp.KPANEL * n, sp.TILE)
    back = sp.panel_unpack(X, B, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))
    d = sp.panel_diagonal(X, B, n)
    np.testing.assert_array_equal(
        np.asarray(d), np.asarray(jnp.diagonal(a, axis1=1, axis2=2)))

    # purification parity: panel io vs mat io (identical kernel inside)
    a0 = 0.02 * jax.random.normal(key, (512, n, n), jnp.float32)
    a0 = 0.5 * (a0 + jnp.swapaxes(a0, 1, 2))
    idx = jnp.arange(n)
    a0 = a0.at[:, idx, idx].set(jnp.linspace(0.9, 0.1, n)[None, :])
    nocc = jnp.full((512,), 5.0, jnp.float32)
    P_mat = sp.sp2_purify_tpu(a0, nocc, 1.0e-5, interpret=True)
    P_pan = sp.sp2_purify_panels(sp.panel_pack(a0), nocc, n, 1.0e-5,
                                 interpret=True)
    np.testing.assert_array_equal(
        np.asarray(sp.panel_unpack(P_pan, 512, n)), np.asarray(P_mat))


def test_panel_mask_matches_packed_mask():
    """density.panel_mask == panel_pack of the packed orbital mask outer
    product (the transpose-free construction is exact)."""
    import pyseqm_tpu as pq
    from pyseqm_tpu.ops import density as dn
    from pyseqm_tpu.ops import sp2_pallas as sp
    from pyseqm_tpu.system import make_system
    from pyseqm_tpu.utils.molecules import make_batch

    spc, co = make_batch(300, 8, jitter=0.02)
    const = pq.make_constants(dtype=jnp.float32)
    species = jnp.asarray(spc)
    K = pq.packed_heavy_count(spc)
    sys_ = make_system(const, species, jnp.asarray(co, jnp.float32),
                       heavy_count=K)
    A = species.shape[1]
    n_st = dn.packed_solver_size(K, A)
    mk = dn.static_pack_vec(dn.orbital_mask(sys_).astype(jnp.float32),
                            K, n_st)
    ref = sp.panel_pack(mk[:, :, None] * mk[:, None, :])
    got = dn.panel_mask(sys_, K, n_st)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
