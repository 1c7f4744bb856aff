"""Generate f64 self-consistency fixtures for the row-3 capability.

The reference raises on every row-3 pair (diat_overlap.py:70-71), so no
reference goldens can exist; these fixtures pin OUR f64 path's energies,
forces and orbital energies at fixed documented geometries so any future
regression in the generated-coefficient overlap chain
(ops/overlap_general.py), the qn=3 multipole powers, or the method
tables is caught.  External (literature) pins live in tests/test_row3.py
(PM3 H2S vs Stewart 1989); everything here is self-consistency.

Run: python tools/gen_row3_fixtures.py  ->  tests/golden/row3_fixtures.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import pyseqm_tpu as pq
from pyseqm_tpu.scf import SCFConfig

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "row3_fixtures.npz")

# fixed experimental-ish geometries, atoms sorted by descending Z;
# molsize 5 covers every entry
TET = 109.47
_c, _s = np.cos(np.deg2rad(TET)), np.sin(np.deg2rad(TET))
MOLS = {
    "H2S": ([16, 1, 1, 0, 0],
            [[0, 0, 0], [1.34, 0, 0],
             [1.34 * np.cos(np.deg2rad(92.1)),
              1.34 * np.sin(np.deg2rad(92.1)), 0],
             [0, 0, 0], [0, 0, 0]]),
    "PH3": ([15, 1, 1, 1, 0],
            [[0, 0, 0], [1.42, 0, 0],
             [1.42 * np.cos(np.deg2rad(93.5)),
              1.42 * np.sin(np.deg2rad(93.5)), 0],
             [1.42 * np.cos(np.deg2rad(93.5)),
              1.42 * np.sin(np.deg2rad(93.5)) * np.cos(np.deg2rad(100.0)),
              1.42 * np.sin(np.deg2rad(93.5)) * np.sin(np.deg2rad(100.0))],
             [0, 0, 0]]),
    "SiH4": ([14, 1, 1, 1, 1],
             (1.48 / np.sqrt(3.0) * np.array(
                 [[0, 0, 0], [1, 1, 1], [1, -1, -1], [-1, 1, -1],
                  [-1, -1, 1]]) + [[0, 0, 0]] * 5).tolist()),
    "HCl": ([17, 1, 0, 0, 0],
            [[0, 0, 0], [1.275, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 0]]),
    # H z-component = 1.09 cos(109.47 deg) < 0: tetrahedral angle from
    # the C->Cl (+z) axis
    "CH3Cl": ([17, 6, 1, 1, 1],
              [[0, 0, 1.78], [0, 0, 0],
               [1.09 * _s, 0, 1.09 * _c],
               [-0.5 * 1.09 * _s, 0.8660 * 1.09 * _s, 1.09 * _c],
               [-0.5 * 1.09 * _s, -0.8660 * 1.09 * _s, 1.09 * _c]]),
    "AlH3": ([13, 1, 1, 1, 0],
             [[0, 0, 0], [1.58, 0, 0], [-0.79, 1.3684, 0],
              [-0.79, -1.3684, 0], [0, 0, 0]]),
}

# elements with all-zero parameter rows per method are excluded
METHOD_MOLS = {
    "MNDO": ["H2S", "PH3", "SiH4", "HCl", "CH3Cl", "AlH3"],
    "AM1": ["H2S", "PH3", "SiH4", "HCl", "CH3Cl", "AlH3"],
    "PM3": ["H2S", "PH3", "SiH4", "HCl", "CH3Cl", "AlH3"],
}


def main():
    out = {}
    for method, names in METHOD_MOLS.items():
        sp = np.array([MOLS[n][0] for n in names], np.int32)
        co = np.array([MOLS[n][1] for n in names], np.float64)
        const = pq.make_constants(dtype=jnp.float64)
        tables = pq.load_element_tables(method, dtype=jnp.float64)
        cfg = pq.SEQMConfig(method=method, row3=True, eig=True,
                            scf=SCFConfig(eps=1.0e-10, converger=(2,)))
        f, res = jax.jit(lambda c: pq.force(
            const, tables, cfg, jnp.asarray(sp), c))(jnp.asarray(co))
        assert not bool(res.notconverged.any()), method
        out[f"{method}_Hf"] = np.asarray(res.Hf)
        out[f"{method}_Etot"] = np.asarray(res.Etot)
        out[f"{method}_force"] = np.asarray(f)
        out[f"{method}_e_orb"] = np.asarray(res.e)
        out[f"{method}_species"] = sp
        out[f"{method}_coords"] = co
        KCAL = 23.060907
        print(method, {n: round(float(h) * KCAL, 2)
                       for n, h in zip(names, res.Hf)}, "(kcal/mol)")
    np.savez_compressed(OUT, names=np.array(list(METHOD_MOLS["MNDO"])),
                        **out)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
