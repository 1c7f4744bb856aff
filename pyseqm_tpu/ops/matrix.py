"""Block-matrix layout helpers.

Matrices live in two layouts:
* grid:  (nmol, A, A, 4, 4) — atom-block grid, used for assembly/contraction
* mat:   (nmol, 4A, 4A)     — dense orbital matrix, used for eigh/SP2/energy

Unlike the reference (which keeps upper-triangle-only blocks and symmetrizes
at the end, fock.py:133-137), all blocks here are stored fully symmetric.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_to_mat(g):
    nmol, A = g.shape[0], g.shape[1]
    return g.transpose(0, 1, 3, 2, 4).reshape(nmol, 4 * A, 4 * A)


def mat_to_grid(m, A):
    nmol = m.shape[0]
    return m.reshape(nmol, A, 4, A, 4).transpose(0, 1, 3, 2, 4)


def diag_blocks(m, A):
    """(nmol, 4A, 4A) -> (nmol, A, 4, 4) diagonal atom blocks."""
    g = mat_to_grid(m, A)
    idx = jnp.arange(A)
    return g[:, idx, idx]


def pair_blocks(m, A, iu, ju):
    """(nmol, 4A, 4A) -> (nmol, NP, 4, 4) upper-triangle atom blocks."""
    g = mat_to_grid(m, A)
    return g[:, iu, ju]


def assemble_packed_mat(xx_grid, xh_col, hh, hh_diag, n_st):
    """Symmetric matrix in the STATIC PACKED layout from its class blocks.

    The packed layout (ops/density.py static_pack_mat: rows [0, 4K) =
    heavy-atom 4-orbital blocks, [4K, 4K+AH) = hydrogen s orbitals) makes
    the XH and HH blocks *contiguous* sub-matrices, so assembly is block
    concatenation — no strided scatters, and the 16-float interleave
    relayout is paid only on the (4K, 4K) heavy sub-block (~8x smaller
    than the full grid_to_mat; that relayout measured 7.4 ms and the
    grid scatters ~10 ms of the 18 ms 884-atom dense Fock build,
    tools/fock_dense_probe.py).

    xx_grid: (nmol, K, K, 4, 4) heavy-block cells, diagonal cells filled;
    xh_col:  (nmol, K, AH, 4) s-column of each (heavy, H) cell
             (value [i, j, a] lands at [4i+a, 4K+j] and its mirror);
    hh:      (nmol, AH, AH) s-s block (off-diagonal);
    hh_diag: (nmol, AH) its diagonal;
    returns (nmol, n_st, n_st), zero-padded.
    """
    nmol, K, AH = xh_col.shape[0], xh_col.shape[1], xh_col.shape[2]
    xx = xx_grid.transpose(0, 1, 3, 2, 4).reshape(nmol, 4 * K, 4 * K)
    xh = jnp.swapaxes(xh_col, 2, 3).reshape(nmol, 4 * K, AH)
    idl = jnp.arange(AH)
    hh = hh.at[:, idl, idl].set(hh_diag)
    top = jnp.concatenate([xx, xh], axis=2)
    bot = jnp.concatenate([jnp.swapaxes(xh, 1, 2), hh], axis=2)
    Mp = jnp.concatenate([top, bot], axis=1)
    pad = n_st - (4 * K + AH)
    if pad:
        Mp = jnp.pad(Mp, ((0, 0), (0, pad), (0, pad)))
    return Mp
