"""Probe: dense Fock-build layout — (nmol,K,K,4,4) vs channel-first.

profile_nanostar shows fock_fwd = 24 ms of the 50 ms 884-atom force step.
Hypothesis: the dense grids put the tiny (4,4) orbital dims minor, so
every materialized pass runs at 4x4/(8x128) = 1.6% TPU tile utilization.
Channel-first (nmol, 4, 4, K, K) keeps the big atom dims minor (full
lanes).  The w-apply core (_rot_to_local/_apply_T/_rot_from_local) is
shape-agnostic (lists of slabs), so only the boundary slicing differs.

Times the XX-block coulomb + exchange contraction (the fock hot core)
from a converged P, including the P relayout both variants pay.
Run on the TPU host: python tools/dense_layout_probe.py

MEASURED 2026-08-19 (884-atom alkane, K=294): REFUTED.  (K,K,4,4)
layout 7.48 ms, channel-first 28.01 ms — the 16 P-slabs + 22 ri-slabs
of separate (K,K) ops cost ~4x more HBM passes than the minor-(4,4)
tile underutilization.  Also bounds the XX contraction at 7.5 of the
24 ms nanostar fock_fwd: the rest is XH/HH blocks + grid assembly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.models.energy import _atom_parameters, _integral_stack
from pyseqm_tpu.ops import tetci
from pyseqm_tpu.ops.tetci import (WPack, _apply_T, _rot_from_local,
                                  _rot_to_local, _u_rows, _unstack, _w_apply)
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
    A = species.shape[1]
    print(f"system: {A} atoms, K={K}", file=sys.stderr)

    mmp = jax.default_matmul_precision(cfg.matmul_precision)
    with mmp:
        sys_ = jax.jit(lambda c: make_system(
            const, species, c, None, cfg.pair_outer_cutoff,
            heavy_count=K))(coords)
        p = _atom_parameters(tables, cfg.method, sys_, None, coords)
        p.pop("Kbeta", None), p.pop("g_ss_nuc", None)
        _, w, _ = jax.jit(lambda c: _integral_stack(
            const, jax.tree_util.tree_map(
                lambda v: v, sys_), p, None, cfg))(coords)
    rig, ug = jax.block_until_ready((w.xx.rig, w.xx.ug))
    nmol = 1
    print(f"XX grid: rig {tuple(rig.shape)}, ug {tuple(ug.shape)}",
          file=sys.stderr)

    # ---- (a) current layout: fock's XX coulomb + exchange ----
    def xx_current(P):
        with mmp:
            Pg = P.reshape(nmol, A, 4, A, 4).transpose(0, 1, 3, 2, 4)
            idx = jnp.arange(K)
            Pd_h = Pg[:, idx, idx]
            pack = WPack(ri=rig, U=ug)
            Xj = jnp.broadcast_to(Pd_h[:, None], ug.shape[:3] + (4, 4))
            dsum_h = jnp.sum(_w_apply(pack, Xj, (1, 2, 3, 4)), axis=2)
            xch = -0.5 * _w_apply(pack, Pg[:, :K, :K], (1, 3, 2, 4))
            r = jnp.sum(dsum_h) + jnp.sum(xch)
        return P + 1.0e-12 * r

    t = chain_timer(xx_current, P0)
    print(f"XX coulomb+exchange, (K,K,4,4) layout : {t * 1e3:8.2f} ms")

    # ---- (b) channel-first layout ----
    rig_cf = jax.block_until_ready(jnp.transpose(rig, (0, 3, 1, 2)))
    ug_cf = jax.block_until_ready(jnp.transpose(ug, (0, 3, 4, 1, 2)))

    def w_apply_cf(X, perm):
        """X: 4x4 list of (nmol, K, K) slabs; returns same structure."""
        u = [[ug_cf[:, a, k] for k in range(4)] for a in range(4)]
        ri_s = [rig_cf[:, r] for r in range(22)]
        Xloc = _rot_to_local(u, X)
        return _rot_from_local(u, _apply_T(ri_s, Xloc, perm))

    def xx_cf(P):
        with mmp:
            # channel-first block grid: one transpose (same class of
            # relayout as mat_to_grid in the current path)
            Pcf = P.reshape(nmol, A, 4, A, 4).transpose(0, 2, 4, 1, 3)
            PH = Pcf[:, :, :, :K, :K]
            idx = jnp.arange(K)
            # diagonal blocks (nmol, 4, 4, K); ket-broadcast over rows
            Pd = Pcf[:, :, :, idx, idx]
            Xj = [[jnp.broadcast_to(Pd[:, a, b][:, None, :],
                                    (nmol, K, K)) for b in range(4)]
                  for a in range(4)]
            coul = w_apply_cf(Xj, (1, 2, 3, 4))
            Xp = [[PH[:, a, b] for b in range(4)] for a in range(4)]
            xch = w_apply_cf(Xp, (1, 3, 2, 4))
            r = 0.0
            for a in range(4):
                for b in range(4):
                    r = r + jnp.sum(coul[a][b]) - 0.5 * jnp.sum(xch[a][b])
        return P + 1.0e-12 * r

    t_cf = chain_timer(xx_cf, P0)
    print(f"XX coulomb+exchange, channel-first    : {t_cf * 1e3:8.2f} ms")

    # parity of the reduced scalars
    a_ = xx_current(P0) - P0
    b_ = xx_cf(P0) - P0
    d = float(jnp.max(jnp.abs(a_ - b_)))
    print(f"parity |delta|max = {d:.3e}")


if __name__ == "__main__":
    main()
