"""pyseqm_tpu: TPU-native NDDO semiempirical quantum chemistry (JAX/XLA/Pallas).

A ground-up JAX reimplementation of the capabilities of PYSEQM
(github.com/lanl/PYSEQM): batched MNDO/AM1/PM3 SCF energies, analytic
forces through three SCF differentiation modes, geometry optimization,
Born-Oppenheimer MD (NVE / Langevin), extended-Lagrangian XL-BOMD, and
machine-learned Hamiltonian parameter hooks — designed for TPU: static
shapes, masked batching, lax control flow, MXU-friendly contractions and
jax.sharding data parallelism over the molecule axis.
"""
from .constants import EV, A0, Constants, make_constants  # noqa: F401
from .ops.density import (packed_heavy_count,  # noqa: F401
                          packed_orbital_size, packed_solver_size)
from .parameters import PARAMETER_LIST, load_element_tables  # noqa: F401
from .scf import SCFConfig  # noqa: F401
from .system import System, make_system, sort_species  # noqa: F401
from .models.energy import (SEQMConfig, build, energy, force,  # noqa: F401
                            hamiltonian)
from . import compat, system  # noqa: F401
from .compat import from_seqm_parameters  # noqa: F401

__version__ = "0.1.0"
