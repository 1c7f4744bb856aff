"""Probe: SP2 kernel at packed orbital size vs full 4A on the headline batch.

The headline batch (molsize 8 small organics) has max 14 physical orbitals
but runs SP2 at n = 4A = 32; packing to 16 cuts per-molecule MXU FLOPs 4x
(panel contraction depth n, twice the molecules per 128-lane tile).  The
open question is whether the per-molecule orbital-permutation gathers
(take_along_axis on (B, 32, 32)) eat the win — measured here with
data-dependent scan chains (CLAUDE.md timing methodology).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import pyseqm_tpu as pq
from pyseqm_tpu.ops import density as dn
from pyseqm_tpu.ops import sp2_pallas
from pyseqm_tpu.system import make_system
from pyseqm_tpu.utils.molecules import make_batch

NMOL = 10240
R = 30


def timed(fn, x):
    # feed each call's output back as the next input: identical-args jit
    # replay on the axon backend returns cached results in ~0 ms
    # (CLAUDE.md timing methodology)
    out = jax.block_until_ready(fn(x))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(out))
        best = min(best, time.perf_counter() - t0)
    return best / R * 1e3, out


def main():
    const, tables, cfg = pq.build("AM1", dtype=jnp.float32)
    sp, co = make_batch(NMOL, 8, jitter=0.02)
    species = jnp.asarray(sp)
    coords = jnp.asarray(co, jnp.float32)
    sys = make_system(const, species, coords)
    pack_n = pq.packed_orbital_size(sp, multiple=16)
    print("pack_n =", pack_n)

    # a plausible F: masked random symmetric with atomic-scale diagonal
    key = jax.random.PRNGKey(0)
    n = 4 * species.shape[1]
    F0 = jax.random.normal(key, (NMOL, n, n), jnp.float32)
    F0 = 0.5 * (F0 + jnp.swapaxes(F0, 1, 2))
    m = dn.orbital_mask(sys).astype(jnp.float32)
    F0 = F0 * m[:, :, None] * m[:, None, :]
    diag = jnp.arange(n, dtype=jnp.float32)[None] - 10.0
    F0 = F0 + jnp.eye(n)[None] * diag[:, None] * m[:, :, None]
    noccd = sys.nocc.astype(jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)

    def prep_full(F):
        mm = m[:, :, None] * m[:, None, :]
        Fm = F * mm
        h1, hN = dn._gershgorin(Fm)
        Fp = Fm + eye[None] * ((1.0 - m) * hN[:, None])[:, None, :]
        a0 = (eye[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]
        return a0, mm

    @jax.jit
    def chain_full(F):
        def step(F, _):
            a0, mm = prep_full(F)
            P = sp2_pallas.sp2_purify_tpu(a0, noccd, 1.0e-5) * mm
            return F + 1.0e-9 * P, None
        return jax.lax.scan(step, F, None, length=R)[0]

    perm, inv = dn.orbital_permutation(sys)
    idxp = jnp.arange(pack_n)
    padp = idxp[None, :] >= sys.norb[:, None]

    @jax.jit
    def chain_packed(F):
        def step(F, _):
            Fp = dn.permute_mat(F, perm)[:, :pack_n, :pack_n]
            h1, hN = dn._gershgorin(Fp)
            d = jnp.where(padp, hN[:, None],
                          jnp.diagonal(Fp, axis1=-2, axis2=-1))
            Fp = Fp.at[:, idxp, idxp].set(d)
            eyep = jnp.eye(pack_n, dtype=F.dtype)
            a0 = (eyep[None] * hN[:, None, None] - Fp) \
                / (hN - h1)[:, None, None]
            Pp = sp2_pallas.sp2_purify_tpu(a0, noccd, 1.0e-5)
            P = dn.permute_mat(dn._unpack_embed(Pp, n), inv)
            P = P * m[:, :, None] * m[:, None, :]
            return F + 1.0e-9 * P, None
        return jax.lax.scan(step, F, None, length=R)[0]

    @jax.jit
    def chain_kernel16_only(F):
        # lower bound: packed kernel alone (reuses F's leading block)
        def step(F, _):
            a0 = F[:, :pack_n, :pack_n] * 1.0e-3
            Pp = sp2_pallas.sp2_purify_tpu(a0, noccd, 1.0e-5)
            return F.at[:, :pack_n, :pack_n].add(1.0e-9 * Pp), None
        return jax.lax.scan(step, F, None, length=R)[0]

    @jax.jit
    def chain_gathers_only(F):
        def step(F, _):
            Fp = dn.permute_mat(F, perm)[:, :pack_n, :pack_n]
            P = dn.permute_mat(dn._unpack_embed(Fp, n), inv)
            return F + 1.0e-9 * P, None
        return jax.lax.scan(step, F, None, length=R)[0]

    # --- static (gather-free) packing: first K atoms keep 4 orbitals,
    # the rest keep only s (valid because atoms are sorted descending Z,
    # so every atom past K is H or padding in every molecule) ---
    K = int(jnp.max(sys.nheavy))
    A = species.shape[1]
    n_st_raw = 3 * K + A
    n_st = -(-n_st_raw // 16) * 16
    print(f"static: K={K}, n_st={n_st_raw} -> {n_st}")

    def pack_rows(X, K, n_st):
        B, r, c = X.shape
        A = r // 4
        Xr = X.reshape(B, A, 4, c)
        rows = jnp.concatenate([X[:, :4 * K], Xr[:, K:, 0, :]], axis=1)
        if n_st > rows.shape[1]:
            rows = jnp.pad(rows, ((0, 0), (0, n_st - rows.shape[1]), (0, 0)))
        return rows

    def pack_static(X, K, n_st):
        Xp = pack_rows(X, K, n_st)                       # (B, n_st, 4A)
        Xp = pack_rows(jnp.swapaxes(Xp, 1, 2), K, n_st)  # (B, n_st, n_st)
        return jnp.swapaxes(Xp, 1, 2)

    def unpack_rows(Xp, K, A):
        B, r, c = Xp.shape
        heavy = Xp[:, :4 * K]
        hs = Xp[:, 4 * K:4 * K + (A - K)]                # (B, A-K, c)
        z = jnp.zeros((B, A - K, 3, c), Xp.dtype)
        hyd = jnp.concatenate([hs[:, :, None, :], z], axis=2)
        return jnp.concatenate([heavy, hyd.reshape(B, 4 * (A - K), c)],
                               axis=1)

    def unpack_static(Xp, K, A):
        X = unpack_rows(Xp, K, A)
        X = unpack_rows(jnp.swapaxes(X, 1, 2), K, A)
        return jnp.swapaxes(X, 1, 2)

    mp = pack_rows(m[:, :, None], K, n_st)[:, :, 0]      # packed orbital mask
    idxs = jnp.arange(n_st)

    @jax.jit
    def chain_static(F):
        def step(F, _):
            mm = m[:, :, None] * m[:, None, :]
            Fp = pack_static(F * mm, K, n_st)
            h1, hN = dn._gershgorin(Fp)
            eyep = jnp.eye(n_st, dtype=F.dtype)
            Fp = Fp + eyep[None] * ((1.0 - mp) * hN[:, None])[:, None, :]
            a0 = (eyep[None] * hN[:, None, None] - Fp) \
                / (hN - h1)[:, None, None]
            Pp = sp2_pallas.sp2_purify_tpu(a0, noccd, 1.0e-5)
            P = unpack_static(Pp, K, A) * mm
            return F + 1.0e-9 * P, None
        return jax.lax.scan(step, F, None, length=R)[0]

    t, out_st = timed(chain_static, F0)
    print(f"static pack->kernel16 : {t:7.3f} ms/call")

    t, out_full = timed(chain_full, F0)
    print(f"kernel n=32 full      : {t:7.3f} ms/call")
    print("chain static-vs-full max diff =",
          float(jnp.max(jnp.abs(out_st - out_full))))
    t, out = timed(chain_packed, F0)
    print(f"pack->kernel16->unpack: {t:7.3f} ms/call")
    t, _ = timed(chain_kernel16_only, F0)
    print(f"kernel n=16 alone     : {t:7.3f} ms/call")
    t, _ = timed(chain_gathers_only, F0)
    print(f"gathers alone         : {t:7.3f} ms/call")

    # parity: packed vs full on one call
    a0, mm = prep_full(F0)
    P_full = sp2_pallas.sp2_purify_tpu(a0, noccd, 1.0e-5) * mm
    Fp = dn.permute_mat(F0, perm)[:, :pack_n, :pack_n]
    h1, hN = dn._gershgorin(Fp)
    d = jnp.where(padp, hN[:, None], jnp.diagonal(Fp, axis1=-2, axis2=-1))
    Fp = Fp.at[:, idxp, idxp].set(d)
    eyep = jnp.eye(pack_n, dtype=jnp.float32)
    a0p = (eyep[None] * hN[:, None, None] - Fp) / (hN - h1)[:, None, None]
    Pp = sp2_pallas.sp2_purify_tpu(a0p, noccd, 1.0e-5)
    P_pack = dn.permute_mat(dn._unpack_embed(Pp, n), inv)
    P_pack = P_pack * m[:, :, None] * m[:, None, :]
    print("max |P_full - P_pack| =", float(jnp.max(jnp.abs(P_full - P_pack))))


if __name__ == "__main__":
    main()
