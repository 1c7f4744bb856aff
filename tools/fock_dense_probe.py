"""Probe: where the 884-atom dense-split Fock build's 24 ms goes.

dense_layout_probe showed the XX coulomb+exchange core is 7.6 ms and
layout-insensitive; full fock_fwd is 24 ms (profile_nanostar).  This
times the remaining pieces in isolation (all scan-chained): the P
grid relayout, the one-center diagonal terms, the XH and HH block
contractions, the strided F-assembly scatters, and grid_to_mat.

Isolated stages can mispredict the fused program (CLAUDE.md) — use this
to LOCATE candidates, confirm any fix with profile_nanostar/bench.
Run on the TPU host: python tools/fock_dense_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.energy import _atom_parameters, _integral_stack
from pyseqm_tpu.ops.fock import fock
from pyseqm_tpu.ops.matrix import grid_to_mat, mat_to_grid
from pyseqm_tpu.ops.tetci import WPack, _w_apply
from pyseqm_tpu.scf import SCFConfig
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_alkane

R = 10


def chain_timer(fn, init, repeats=3):
    @jax.jit
    def many(c):
        return jax.lax.scan(lambda c, _: (fn(c), None), c, None, length=R)[0]

    c = jax.block_until_ready(many(init))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        c = jax.block_until_ready(many(c))
        best = min(best, (time.perf_counter() - t0) / R)
    return best


def main(n_carbons=294):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    z, x = make_alkane(n_carbons)
    species = jnp.asarray(z[None])
    coords = jnp.asarray(x[None], jnp.float32)
    K = pq.packed_heavy_count(z[None])
    const, tables, cfg = pq.build(
        "AM1", dtype=jnp.float32,
        scf=SCFConfig(eps=1.0e-3, converger=(2,), use_sp2=True,
                      sp2_eps=1.0e-4, sp2_precision="highest",
                      sp2_tight_bounds=True, max_iter=400,
                      pack_orbitals=pq.packed_orbital_size(z[None]),
                      pack_heavy=K),
        pack_pairs=True)
    out = jax.block_until_ready(jax.jit(
        lambda c: pq.energy(const, tables, cfg, species, c))(coords))
    P0 = out.P
    nmol, A = species.shape

    mmp = jax.default_matmul_precision(cfg.matmul_precision)
    with mmp:
        sys_ = jax.jit(lambda c: make_system(
            const, species, c, None, cfg.pair_outer_cutoff,
            heavy_count=K))(coords)
        p0 = _atom_parameters(tables, cfg.method, sys_, None, coords)
        p0.pop("Kbeta", None), p0.pop("g_ss_nuc", None)
        M0, w0, wf0 = jax.jit(lambda c: _integral_stack(
            const, sys_, p0, None, cfg))(coords)
    M0 = jax.block_until_ready(M0)
    print(f"system: {A} atoms, K={K}", file=sys.stderr)

    res = {}

    def stage(name, fn):
        res[name] = chain_timer(fn, P0)
        print(f"{name:28s} {res[name] * 1e3:8.2f} ms")
        sys.stdout.flush()

    # full fock (the profile_nanostar reference quantity)
    def full(P):
        with mmp:
            F = fock(sys_, P, M0, wf0, p0)
        return P + 1.0e-9 * F
    stage("fock full", full)

    # P relayout + diagonal extraction only
    def relayout(P):
        with mmp:
            Pg = mat_to_grid(P, A)
            idx = jnp.arange(A)
            Pd = Pg[:, idx, idx]
        return P + 1.0e-9 * (grid_to_mat(Pg) + jnp.sum(Pd))
    stage("mat_to_grid + grid_to_mat", relayout)

    sH, sL = slice(0, K), slice(K, None)

    # XH block contractions (no F assembly)
    def xh_only(P):
        with mmp:
            Pg = mat_to_grid(P, A)
            idx = jnp.arange(A)
            Pd = Pg[:, idx, idx]
            Pd_h, Pd_l = Pd[:, sH], Pd[:, sL]
            pss_l = Pd_l[..., 0, 0]
            d1 = jnp.sum(wf0.xh * pss_l[:, None, :, None, None], axis=2)
            d2 = jnp.sum(wf0.xh * Pd_h[:, :, None], axis=(1, -1, -2))
            Pcol = Pg[:, sH, sL, :, 0]
            xcol = -0.5 * jnp.sum(wf0.xh * Pcol[..., None, :], axis=-1)
            r = jnp.sum(d1) + jnp.sum(d2) + jnp.sum(xcol)
        return P + 1.0e-9 * r
    stage("XH contractions", xh_only)

    # HH block
    def hh_only(P):
        with mmp:
            Pg = mat_to_grid(P, A)
            idx = jnp.arange(A)
            pss_l = Pg[:, idx, idx][:, sL, 0, 0]
            d = jnp.sum(wf0.hh * pss_l[:, None, :], axis=2)
            xss = -0.5 * wf0.hh * Pg[:, sL, sL, 0, 0]
            r = jnp.sum(d) + jnp.sum(xss)
        return P + 1.0e-9 * r
    stage("HH contractions", hh_only)

    # XX w-apply (dense_layout_probe's quantity, for the same-session sum)
    def xx_only(P):
        with mmp:
            Pg = mat_to_grid(P, A)
            idx = jnp.arange(K)
            Pd_h = Pg[:, idx, idx]
            pack = WPack(ri=wf0.xx.rig, U=wf0.xx.ug)
            Xj = jnp.broadcast_to(Pd_h[:, None],
                                  wf0.xx.ug.shape[:3] + (4, 4))
            dsum_h = jnp.sum(_w_apply(pack, Xj, (1, 2, 3, 4)), axis=2)
            xch = -0.5 * _w_apply(pack, Pg[:, sH, sH], (1, 3, 2, 4))
            r = jnp.sum(dsum_h) + jnp.sum(xch)
        return P + 1.0e-9 * r
    stage("XX w-apply", xx_only)

    # F assembly scatters: all the .at[].add/.set traffic with cheap fills
    def assembly(P):
        with mmp:
            Pg = mat_to_grid(P, A)
            idx = jnp.arange(A)
            Pd = Pg[:, idx, idx]
            F = M0 + 0.0
            xch = Pg[:, sH, sH]
            F = F.at[:, sH, sH].add(xch)
            xcol = Pg[:, sH, sL, :, 0]
            F = F.at[:, sH, sL, :, 0].add(xcol)
            F = F.at[:, sL, sH, 0, :].add(jnp.swapaxes(xcol, 1, 2))
            F = F.at[:, sL, sL, 0, 0].add(Pg[:, sL, sL, 0, 0])
            idh = jnp.arange(K)
            F = F.at[:, idh, idh].add(Pd[:, sH])
            idl = jnp.arange(K, A)
            F = F.at[:, idl, idl].add(Pd[:, sL])
            F = F.at[:, idl, idl, 0, 0].add(Pd[:, sL, 0, 0])
        return P + 1.0e-9 * grid_to_mat(F)
    stage("F assembly scatters", assembly)

    covered = sum(v for k, v in res.items() if k != "fock full")
    print(f"{'sum of parts':28s} {covered * 1e3:8.2f} ms "
          f"(full {res['fock full'] * 1e3:.2f})")


if __name__ == "__main__":
    main()
