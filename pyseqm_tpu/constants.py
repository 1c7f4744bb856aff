"""Physical and element constants for NDDO semiempirical methods.

TPU-native reimplementation of the constant tables used by the reference
PYSEQM package (cf. seqm/seqm_functions/constants.py:1-141).  The numeric
values are the published MOPAC7 constants; the container is a frozen JAX
pytree of arrays instead of an nn.Module of buffers.

Units inside the library: Bohr for lengths (inputs in Angstrom are converted
with 1/A0), eV for energies, fs for time, Kelvin for temperature.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from jax import tree_util

# MOPAC7 values (intentionally not the CODATA ones, for parity with MOPAC).
EV = 27.21  # 1 hartree in eV
A0 = 0.529167  # Bohr radius in Angstrom
EV_KCALPMOL = 23.061  # 1 eV in kcal/mol
LENGTH_CONVERSION_FACTOR = 1.0 / A0  # Angstrom -> Bohr

# Pair overlap is neglected beyond this distance (Bohr);
# cf. reference constants.py:16
OVERLAP_CUTOFF = 40.0

ELEMENT_LABELS = [
    "0",
    "H", "He",
    "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar",
]

MAX_Z = 18  # element tables below cover H..Ar (rows 1-3)

# fmt: off
# valence-shell core charge per element
_TORE = [0.0,
         1.0,                                     0.0,
         1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0,      0.0,
         1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0,      0.0]
# principal quantum number of the valence shell
_QN = [0,
       1,                         0,
       2, 2, 2, 2, 2, 2, 2,       0,
       3, 3, 3, 3, 3, 3, 3,       0]
# occupation coefficients of the isolated-atom ground state used for Eiso
# (cf. MOPAC block.f / reference constants.py:69-105)
_USSC = [0.0,
         1.0,                                     0.0,
         1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0,      0.0,
         1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0,      0.0]
_UPPC = [0.0,
         0.0,                                     0.0,
         0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0,      6.0,
         0.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0,      6.0]
_GSSC = [0.0,
         0.0,                                     0.0,
         0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,      0.0,
         0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,      0.0]
_GSPC = [0.0,
         0.0,                                     0.0,
         0.0, 0.0, 2.0, 4.0, 6.0, 8.0, 10.0,     0.0,
         0.0, 0.0, 2.0, 4.0, 6.0, 8.0, 10.0,     0.0]
_HSPC = [0.0,
         0.0,                                     0.0,
         0.0, 0.0, -1.0, -2.0, -3.0, -4.0, -5.0, 0.0,
         0.0, 0.0, -1.0, -2.0, -3.0, -4.0, -5.0, 0.0]
_GP2C = [0.0,
         0.0,                                     0.0,
         0.0, 0.0, 0.0, 1.5, 4.5, 6.5, 10.0,     0.0,
         0.0, 0.0, 0.0, 1.5, 4.5, 6.5, 10.0,     0.0]
_GPPC = [0.0,
         0.0,                                     0.0,
         0.0, 0.0, 0.0, -0.5, -1.5, -0.5, 0.0,   0.0,
         0.0, 0.0, 0.0, -0.5, -1.5, -0.5, 0.0,   0.0]
# experimental heats of formation of the isolated atoms, kcal/mol
_EHEAT_KCAL = [0.000,
               52.102,                                                    0.0,
               38.410, 76.960, 135.700, 170.890, 113.000, 59.559, 18.890, 0.0,
               25.850, 35.000, 79.490, 108.390, 75.570, 66.400, 28.990,  0.0]
# atomic masses, g/mol
_MASS = [0.00000,
         1.00790,                                                         4.00260,
         6.94000, 9.01218, 10.81000, 12.01100, 14.00670, 15.99940, 18.99840, 20.17900,
         22.98977, 24.30500, 26.98154, 28.08550, 30.97376, 32.06000, 35.45300, 39.94800]
# fmt: on


@tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Constants:
    """Element-indexed constant tables as a JAX pytree.

    Index with an atomic-number array: ``const.tore[Z]``.
    """

    tore: jnp.ndarray
    qn: jnp.ndarray
    qn_int: jnp.ndarray
    ussc: jnp.ndarray
    uppc: jnp.ndarray
    gssc: jnp.ndarray
    gspc: jnp.ndarray
    hspc: jnp.ndarray
    gp2c: jnp.ndarray
    gppc: jnp.ndarray
    eheat: jnp.ndarray  # eV
    mass: jnp.ndarray


def make_constants(dtype=jnp.float32) -> Constants:
    f = lambda x: jnp.asarray(np.array(x), dtype=dtype)
    return Constants(
        tore=f(_TORE),
        qn=f(_QN),
        qn_int=jnp.asarray(np.array(_QN), dtype=jnp.int32),
        ussc=f(_USSC),
        uppc=f(_UPPC),
        gssc=f(_GSSC),
        gspc=f(_GSPC),
        hspc=f(_HSPC),
        gp2c=f(_GP2C),
        gppc=f(_GPPC),
        eheat=f(np.array(_EHEAT_KCAL) / EV_KCALPMOL),
        mass=f(_MASS),
    )
