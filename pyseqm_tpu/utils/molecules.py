"""Small-organic geometries for tests & benchmarks (Angstrom, species
sorted by descending Z as the framework requires)."""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# (species, coords) — approximate gas-phase geometries
MOLECULES = {
    "CH2O": (
        [8, 6, 1, 1],
        [[0.0, 0.0, 0.0], [1.2273, 0.0, 0.0],
         [1.8195, 0.9394, 0.0], [1.8193, -0.9395, 0.0]],
    ),
    "H2O": (
        [8, 1, 1],
        [[0.0, 0.0, 0.1173], [0.0, 0.7572, -0.4692], [0.0, -0.7572, -0.4692]],
    ),
    "CH4": (
        [6, 1, 1, 1, 1],
        [[0.0, 0.0, 0.0], [0.6276, 0.6276, 0.6276],
         [-0.6276, -0.6276, 0.6276], [-0.6276, 0.6276, -0.6276],
         [0.6276, -0.6276, -0.6276]],
    ),
    "NH3": (
        [7, 1, 1, 1],
        [[0.0, 0.0, 0.1173], [0.0, 0.9377, -0.2737],
         [0.8121, -0.4689, -0.2737], [-0.8121, -0.4689, -0.2737]],
    ),
    "CH3OH": (
        [8, 6, 1, 1, 1, 1],
        [[0.7079, 0.0, 0.0], [-0.7079, 0.0, 0.0],
         [1.0232, -0.8537, 0.3], [-1.0731, -0.8937, 0.5159],
         [-1.0731, 0.1021, -1.0371], [-1.1295, 0.8654, 0.5265]],
    ),
    "C2H6": (
        [6, 6, 1, 1, 1, 1, 1, 1],
        [[0.0, 0.0, 0.7680], [0.0, 0.0, -0.7680],
         [1.0192, 0.0, 1.1573], [-0.5096, 0.8826, 1.1573],
         [-0.5096, -0.8826, 1.1573], [-1.0192, 0.0, -1.1573],
         [0.5096, -0.8826, -1.1573], [0.5096, 0.8826, -1.1573]],
    ),
}


def make_batch(nmol: int, molsize: int = 8, names: Sequence[str] = None,
               jitter: float = 0.0, seed: int = 0
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Round-robin batch of small organics padded to ``molsize``."""
    names = [n for n in (names or MOLECULES.keys())
             if len(MOLECULES[n][0]) <= molsize]
    rng = np.random.RandomState(seed)
    species = np.zeros((nmol, molsize), dtype=np.int32)
    coords = np.zeros((nmol, molsize, 3))
    for i in range(nmol):
        z, x = MOLECULES[names[i % len(names)]]
        n = len(z)
        species[i, :n] = z
        xi = np.asarray(x)
        if jitter:
            xi = xi + jitter * rng.randn(*xi.shape)
        coords[i, :n] = xi
    return species, coords
