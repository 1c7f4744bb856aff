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
