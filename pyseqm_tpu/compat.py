"""Migration shim for reference-PYSEQM users.

Converts the reference's ``seqm_parameters`` dict (doc/documentation.md:
35-51 and the module-level globals of scf_loop.py:16-27) into the typed
:class:`SEQMConfig` used here, so existing configurations port 1:1:

    cfg = from_seqm_parameters({
        'method': 'AM1', 'scf_eps': 1e-6, 'scf_converger': [2],
        'sp2': [True, 1e-5], 'elements': [0,1,6,8], 'learned': [],
        'pair_outer_cutoff': 1e10, 'eig': True, 'scf_backward': 1,
    })
"""
from __future__ import annotations

from typing import Mapping

from .models.energy import SEQMConfig
from .scf import SCFConfig


def from_seqm_parameters(sp: Mapping) -> SEQMConfig:
    converger = tuple(sp.get("scf_converger", [2]))
    sp2 = sp.get("sp2", [False])
    scf = SCFConfig(
        eps=float(sp.get("scf_eps", 1.0e-4)),
        converger=converger,
        use_sp2=bool(sp2[0]),
        sp2_eps=float(sp2[1]) if len(sp2) > 1 else 1.0e-4,
        backward=int(sp.get("scf_backward", 0)),
        backward_eps=float(sp.get("scf_backward_eps", 1.0e-2)),
    )
    return SEQMConfig(
        method=sp.get("method", "AM1"),
        scf=scf,
        hf_flag=bool(sp.get("Hf_flag", True)),
        pair_outer_cutoff=float(sp.get("pair_outer_cutoff", 1.0e10)),
        eig=bool(sp.get("eig", False)),
    )
