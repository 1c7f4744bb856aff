"""Semiempirical parameter tables (MNDO / AM1 / PM3).

Loads the published MOPAC parameter tables (packaged as .npz under
``pyseqm_tpu/params``) into element-indexed arrays, and gathers per-atom
parameter sets, merging in user/ML-supplied ("learned") overrides.

Mirrors the capability of the reference Pack_Parameters / params()
(seqm/basics.py:120-154, seqm/seqm_functions/parameters.py:4-31) with a
functional API: tables are plain dicts of jnp arrays (a pytree), so learned
parameters stay differentiable.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

_PARAM_DIR = os.path.join(os.path.dirname(__file__), "params")

# Per-method parameter name lists (cf. reference basics.py:14-29).
PARAMETER_LIST = {
    "MNDO": [
        "U_ss", "U_pp", "zeta_s", "zeta_p", "beta_s", "beta_p",
        "g_ss", "g_sp", "g_pp", "g_p2", "h_sp", "alpha",
    ],
    "AM1": [
        "U_ss", "U_pp", "zeta_s", "zeta_p", "beta_s", "beta_p",
        "g_ss", "g_sp", "g_pp", "g_p2", "h_sp", "alpha",
        "Gaussian1_K", "Gaussian2_K", "Gaussian3_K", "Gaussian4_K",
        "Gaussian1_L", "Gaussian2_L", "Gaussian3_L", "Gaussian4_L",
        "Gaussian1_M", "Gaussian2_M", "Gaussian3_M", "Gaussian4_M",
    ],
    "PM3": [
        "U_ss", "U_pp", "zeta_s", "zeta_p", "beta_s", "beta_p",
        "g_ss", "g_sp", "g_pp", "g_p2", "h_sp", "alpha",
        "Gaussian1_K", "Gaussian2_K",
        "Gaussian1_L", "Gaussian2_L",
        "Gaussian1_M", "Gaussian2_M",
    ],
}

# Number of core-core Gaussian correction terms per method.
N_GAUSSIANS = {"MNDO": 0, "AM1": 4, "PM3": 2}


def load_element_tables(method: str = "AM1", dtype=jnp.float32,
                        param_dir: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Element-indexed parameter tables: name -> (108,) array indexed by Z."""
    method = method.upper()
    if method not in PARAMETER_LIST:
        raise ValueError(f"method must be one of {list(PARAMETER_LIST)}, got {method}")
    d = np.load(os.path.join(param_dir or _PARAM_DIR, f"{method.lower()}.npz"))
    return {k: jnp.asarray(d[k], dtype=dtype) for k in PARAMETER_LIST[method]}


def gather_atom_parameters(
    tables: Mapping[str, jnp.ndarray],
    method: str,
    Z: jnp.ndarray,
    learned: Optional[Mapping[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-atom parameter dict for atomic numbers ``Z`` (any shape).

    ``learned`` entries (same shape as Z, or broadcastable) override the
    table values; names not in the method's parameter list (e.g. "Kbeta",
    "g_ss_nuc") pass through untouched so ML hooks can add them.
    """
    learned = dict(learned or {})
    out: Dict[str, jnp.ndarray] = {}
    for name in PARAMETER_LIST[method.upper()]:
        if name in learned:
            out[name] = learned.pop(name)
        else:
            out[name] = tables[name][Z]
    out.update(learned)  # pass-through extras (Kbeta, g_ss_nuc, ...)
    return out
