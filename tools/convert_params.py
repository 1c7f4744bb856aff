"""Convert the published MOPAC semiempirical parameter tables (CSV form, as
shipped with PYSEQM: seqm/params/parameters_{MNDO,AM1,PM3}_MOPAC.csv) into
compact .npz tables indexed by atomic number.

These are published physical-model parameters (MOPAC7 / Dewar et al.), i.e.
data, not code.  The npz layout is our own: one (MAX_Z+1,) float64 array per
parameter name, plus a 'names' list.

Run once:  python tools/convert_params.py
"""
import csv
import os
import sys

import numpy as np

REF = "/root/reference/seqm/params"
OUT = os.path.join(os.path.dirname(__file__), "..", "pyseqm_tpu", "params")

MAX_Z = 107


def convert(method):
    fn = os.path.join(REF, f"parameters_{method}_MOPAC.csv")
    with open(fn) as f:
        reader = csv.reader(f)
        header = [h.strip() for h in next(reader)]
        # first two columns are N (atomic number) and sym (element symbol)
        names = header[2:]
        tables = {n: np.zeros(MAX_Z + 1, dtype=np.float64) for n in names}
        for row in reader:
            if not row or not row[0].strip():
                continue
            z = int(row[0])
            for i, n in enumerate(names):
                # the published CSVs contain cells with embedded spaces
                # (e.g. "1        0"); the upstream loader strips all
                # whitespace before parsing, so mirror that for parity
                v = row[2 + i].replace(" ", "")
                tables[n][z] = float(v) if v else 0.0
    out = os.path.join(OUT, f"{method.lower()}.npz")
    np.savez_compressed(out, **tables)
    print(f"wrote {out}: {len(names)} parameters x {MAX_Z + 1} elements")


if __name__ == "__main__":
    for m in ["MNDO", "AM1", "PM3"]:
        convert(m)
