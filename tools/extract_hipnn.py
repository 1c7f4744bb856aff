"""Extract the reference's shipped trained HIP-NN model into a plain .npz.

The reference distributes a trained learned-Hamiltonian model
(/root/reference/examples/model/model.pt, driven by examples/test.py:26-41)
as a pickled hippynn GraphModule.  hippynn itself is not installable here,
so — like tools/gen_golden.py does for energies — this tool runs against
the reference distribution offline (torch CPU) and converts its *data*
(trained weights + architecture hyperparameters) into a committed fixture
that pyseqm_tpu loads standalone (models/hipnn.py).

The pickle is opened with stub classes (no hippynn code is executed; the
stubs only capture each module's state dict), then the known module tree
is walked:

  OneHotSpecies -> species one-hot over species_set
  Hipnn         -> 2 interaction blocks (InteractLayer + 3 atom ResNets),
                   nf=80, 20 inverse-distance sensitivities
  HCharge       -> 3-level hierarchical head, 9 targets/atom
  SEQM_All      -> per-element base table p (Z,9), unit weights (9,),
                   learned PM3 parameter names

Usage: python tools/extract_hipnn.py [--out pyseqm_tpu/params/hipnn_pm3.npz]
"""
from __future__ import annotations

import argparse
import json
import pickle

import numpy as np
import torch

MODEL_PT = "/root/reference/examples/model/model.pt"


# --- stub unpickling ---------------------------------------------------------
class _Stub:
    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


class _StubModule(torch.nn.Module):
    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state


_made = {}


def _get_stub(mod, name):
    key = f"{mod}.{name}"
    if key not in _made:
        base = _StubModule if ("layers" in mod or "networks" in mod
                               or "GraphModule" in name
                               or "seqm_modules" in mod) else _Stub
        _made[key] = type(name, (base,), {"__module__": mod})
    return _made[key]


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("hippynn") or module.startswith("seqm"):
            return _get_stub(module, name)
        return super().find_class(module, name)


class _PickleShim:
    __name__ = "stub_pickle"
    Unpickler = _StubUnpickler
    load = staticmethod(pickle.load)


def load_graph(path=MODEL_PT):
    with open(path, "rb") as f:
        return torch.load(f, map_location="cpu", pickle_module=_PickleShim,
                          weights_only=False)


# --- extraction --------------------------------------------------------------
def _np(t):
    # the pickle's trained tensors are float64 — keep them (the f32
    # round-off was visible as ~1e-7 activation error vs the f64 replay)
    return t.detach().cpu().numpy().astype(np.float64)


def extract(path=MODEL_PT):
    m = load_graph(path)
    md = m._modules["moddict"]._modules
    by_type = {}
    for v in md.values():
        by_type.setdefault(type(v).__name__, []).append(v)

    onehot = by_type["OneHotSpecies"][0]
    hipnn = by_type["Hipnn"][0]
    hcharge = by_type["HCharge"][0]
    seqm_all = by_type["SEQM_All"][0]
    pair_idx = by_type["OpenPairIndexer"][0]

    out = {}
    meta = {
        "source": "reference examples/model/model.pt (hippynn GraphModule)",
        "method": seqm_all.method,
        "learned": list(seqm_all.learned),
        "elements": [int(e) for e in seqm_all.elements],
        "n_features": int(hipnn.nf),
        "n_features_in": int(hipnn.nf_in),
        "n_sensitivities": int(hipnn.n_sensitivities),
        "n_blocks": int(hipnn.ni),
        "n_atom_layers": int(hipnn.n_layers_per_block),
        "resnet": bool(hipnn.resnet),
        "dist_soft_min": float(hipnn.dist_soft_min),
        "dist_soft_max": float(hipnn.dist_soft_max),
        "dist_hard_max": float(hipnn.dist_hard_max),
        "pair_cutoff": float(pair_idx.hard_dist_cutoff),
        "activation": "softplus",
    }
    # one-hot over the non-blank species, in species_set order
    species_set = [int(s) for s in onehot.species_set.tolist() if int(s) != 0]
    meta["species_order"] = species_set

    out["seqm_p"] = _np(seqm_all._parameters["p"])          # (Zmax+1, 9)
    out["seqm_weight"] = _np(seqm_all._parameters["weight"])  # (9,)

    for bi, block in enumerate(hipnn._modules["blocks"]._modules.values()):
        layers = list(block._modules.values())
        inter = layers[0]
        il = inter._modules["base_layer"]
        sens = il._modules["sensitivity"]
        pre = f"b{bi}_"
        out[pre + "mu"] = _np(sens._parameters["mu"])[0]        # (20,)
        out[pre + "sigma"] = _np(sens._parameters["sigma"])[0]  # (20,)
        out[pre + "int_weights"] = _np(il._parameters["int_weights"])
        out[pre + "self_w"] = _np(il._modules["selfint"]._parameters["weight"])
        out[pre + "self_b"] = _np(il._modules["selfint"]._parameters["bias"])
        out[pre + "ires_w"] = _np(inter._modules["res_layer"]._parameters["weight"])
        out[pre + "ires_b"] = _np(inter._modules["res_layer"]._parameters["bias"])
        if "adjust_layer" in inter._modules:
            out[pre + "adjust_w"] = _np(
                inter._modules["adjust_layer"]._parameters["weight"])
        for ai, atom in enumerate(layers[1:]):
            apre = f"{pre}a{ai}_"
            out[apre + "base_w"] = _np(atom._modules["base_layer"]._parameters["weight"])
            out[apre + "base_b"] = _np(atom._modules["base_layer"]._parameters["bias"])
            out[apre + "res_w"] = _np(atom._modules["res_layer"]._parameters["weight"])
            out[apre + "res_b"] = _np(atom._modules["res_layer"]._parameters["bias"])

    for li, lay in enumerate(hcharge._modules["layers"]._modules.values()):
        out[f"head{li}_w"] = _np(lay._parameters["weight"])
        out[f"head{li}_b"] = _np(lay._parameters["bias"])

    out["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    return out, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="pyseqm_tpu/params/hipnn_pm3.npz")
    ap.add_argument("--model", default=MODEL_PT)
    args = ap.parse_args()
    out, meta = extract(args.model)
    np.savez_compressed(args.out, **out)
    print(json.dumps({"written": args.out, "arrays": len(out) - 1,
                      "meta": meta}))


if __name__ == "__main__":
    main()
