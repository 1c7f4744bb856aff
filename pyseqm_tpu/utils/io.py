"""Trajectory / structure I/O: extended-xyz dump + xyz reading.

Covers the reference's dump format (MolecularDynamics.py:300-320) and the
xyz ingestion used by its scale test (tests/test10/test10.py).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..constants import ELEMENT_LABELS

_SYMBOL_TO_Z = {s.strip(): z for z, s in enumerate(ELEMENT_LABELS)}


def read_xyz(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a (single-frame) xyz file -> (species (N,), coords (N, 3))."""
    with open(path) as f:
        n = int(f.readline().split()[0])
        f.readline()
        species = np.zeros(n, dtype=np.int32)
        coords = np.zeros((n, 3))
        for i in range(n):
            parts = f.readline().split()
            sym = parts[0]
            species[i] = _SYMBOL_TO_Z.get(sym, 0) if not sym.isdigit() else int(sym)
            coords[i] = [float(x) for x in parts[1:4]]
    return species, coords


def dump_frame(prefix: str, const, species, state, obs,
               molids: Sequence[int] = (0,), forces=None):
    """Append one extended-xyz frame per selected molecule: coords,
    velocities, forces, Mulliken charge per atom — the reference's full
    column set (MolecularDynamics.py:300-320)."""
    species = np.asarray(species)
    x = np.asarray(state.coordinates)
    v = np.asarray(state.velocities)
    q = np.asarray(obs.charges)
    fz = (np.zeros_like(x) if forces is None else np.asarray(forces))
    for mol in molids:
        natom = int((species[mol] > 0).sum())
        with open(f"{prefix}.{mol}.xyz", "a+") as f:
            f.write(f"{natom}\n")
            f.write(f"step: {int(state.step)}, T={float(obs.T[mol]):.3f}K, "
                    f"Ek={float(obs.Ek[mol]):.16e}, Ep={float(obs.Epot[mol]):.16e}\n")
            for a in range(species.shape[1]):
                z = species[mol, a]
                if z > 0:
                    f.write("%2s % .10e % .10e % .10e % .10e % .10e % .10e"
                            " % .10e % .10e % .10e % .6f\n"
                            % (ELEMENT_LABELS[z].strip(),
                               x[mol, a, 0], x[mol, a, 1], x[mol, a, 2],
                               v[mol, a, 0], v[mol, a, 1], v[mol, a, 2],
                               fz[mol, a, 0], fz[mol, a, 1], fz[mol, a, 2],
                               q[mol, a]))
