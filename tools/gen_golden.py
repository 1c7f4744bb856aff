"""Generate golden reference tensors by running the upstream PYSEQM
(PyTorch, float64, CPU) and dumping intermediates + results to
tests/golden/*.npz.

The goldens pin our TPU-native implementation to the reference numerics
(target: energies within 1e-6 eV).  Run once per change of test fixtures:

    python tools/gen_golden.py
"""
import os
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference")

from seqm.basics import Energy, Force, Parser, Pack_Parameters  # noqa: E402
from seqm.seqm_functions.constants import Constants  # noqa: E402
from seqm.seqm_functions.hcore import hcore  # noqa: E402
from seqm.seqm_functions.fock import fock  # noqa: E402

torch.set_default_dtype(torch.float64)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

# formaldehyde-like molecule reused across the reference tests (tests/test2.py:13-28)
CH2O = [
    [0.0000, 0.0000, 0.0000],
    [1.22732374, 0.0000, 0.0000],
    [1.8194841064614802, 0.93941263319067747, 0.0000],
    [1.8193342232738994, -0.93951967178254525, 3.0565334533430606e-06],
]
# a bent water molecule, sorted [8,1,1,(pad)]
H2O = [
    [0.0000, 0.0000, 0.1173],
    [0.0000, 0.7572, -0.4692],
    [0.0000, -0.7572, -0.4692],
    [0.0000, 0.0000, 0.0000],
]

SPECIES = [[8, 6, 1, 1], [8, 1, 1, 0]]
COORDS = [CH2O, H2O]


def seqm_parameters(method, elements, converger=[2], sp2=[False], eps=1.0e-10,
                    **extra):
    p = {
        "method": method,
        "scf_eps": eps,
        "scf_converger": converger,
        "sp2": sp2,
        "elements": elements,
        "learned": [],
        "pair_outer_cutoff": 1.0e10,
    }
    p.update(extra)
    return p


def run_method(method):
    device = torch.device("cpu")
    species = torch.as_tensor(SPECIES, dtype=torch.int64, device=device)
    coordinates = torch.tensor(COORDS, device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()))
    sp = seqm_parameters(method, elements)

    parser = Parser(sp)
    packpar = Pack_Parameters(sp)
    nmol, molsize, nHeavy, nHydro, nocc, Z, maskd, atom_molid, mask, \
        pair_molid, ni, nj, idxi, idxj, xij, rij = parser(const, species, coordinates)
    p = packpar(Z)

    beta = torch.cat((p["beta_s"].unsqueeze(1), p["beta_p"].unsqueeze(1)), dim=1)
    M, w = hcore(const, nmol, molsize, maskd, mask, idxi, idxj, ni, nj, xij,
                 rij, Z, p["zeta_s"], p["zeta_p"], p["U_ss"], p["U_pp"],
                 p["g_ss"], p["g_pp"], p["g_p2"], p["h_sp"], beta)
    Hcore = (M.reshape(nmol, molsize, molsize, 4, 4).transpose(2, 3)
             .reshape(nmol, 4 * molsize, 4 * molsize))
    Hfull = Hcore.triu() + Hcore.triu(1).transpose(1, 2)

    # pair bookkeeping so the jax side can map its dense pair grid
    pair_mol = pair_molid.numpy()
    # local atom indices within the molecule
    i_loc = (maskd[idxi] // molsize) % molsize
    j_loc = np.array([m % molsize for m in (maskd[idxj] % (molsize * molsize)).numpy()])
    i_loc = ((maskd[idxi] - pair_molid * molsize * molsize) // (molsize + 1)).numpy()
    j_loc = ((maskd[idxj] - pair_molid * molsize * molsize) // (molsize + 1)).numpy()

    # single Fock build from the reference initial guess
    P0 = torch.zeros_like(M)
    tore = const.tore
    P0[maskd[Z > 1], 0, 0] = tore[Z[Z > 1]] / 4.0
    P0[maskd, 1, 1] = P0[maskd, 0, 0]
    P0[maskd, 2, 2] = P0[maskd, 0, 0]
    P0[maskd, 3, 3] = P0[maskd, 0, 0]
    P0[maskd[Z == 1], 0, 0] = 1.0
    P0m = (P0.reshape(nmol, molsize, molsize, 4, 4).transpose(2, 3)
           .reshape(nmol, 4 * molsize, 4 * molsize))
    F1 = fock(nmol, molsize, P0m, M, maskd, mask, idxi, idxj, w,
              p["g_ss"], p["g_pp"], p["g_sp"], p["g_p2"], p["h_sp"])

    # full energy + force via the reference high-level modules
    coords2 = torch.tensor(COORDS, device=device)
    frc = Force(seqm_parameters(method, elements, eig=True))
    f, Pconv, Etot, Hf, Eelec, Enuc, Eiso, EnucAB, e_orb, charge, notcnv = frc(
        const, coords2, species)

    # SP2 density path golden (same molecules, sp2 purification)
    coords3 = torch.tensor(COORDS, device=device)
    frc2 = Force(seqm_parameters(method, elements, sp2=[True, 1.0e-5]))
    f2, _, _, Hf_sp2 = frc2(const, coords3, species)[:4]

    np.savez_compressed(
        os.path.join(OUT, f"{method.lower()}_ch2o_h2o.npz"),
        Hf_sp2=Hf_sp2.detach().numpy(), force_sp2=f2.detach().numpy(),
        species=np.array(SPECIES), coordinates=np.array(COORDS),
        pair_mol=pair_mol, pair_i=i_loc, pair_j=j_loc,
        rij=rij.numpy(), xij=xij.numpy(),
        w=w.detach().numpy(),
        hcore=Hfull.detach().numpy(),
        fock1=F1.detach().numpy(),
        P0=P0m.detach().numpy(),
        force=f.detach().numpy(),
        P=Pconv.detach().numpy(),
        Etot=Etot.detach().numpy(), Hf=Hf.detach().numpy(),
        Eelec=Eelec.detach().numpy(), Enuc=Enuc.detach().numpy(),
        Eiso=Eiso.detach().numpy(), EnucAB=EnucAB.detach().numpy(),
        e_orb=e_orb.detach().numpy(), charge=charge.detach().numpy(),
    )
    print(method, "Hf:", Hf.detach().numpy(), "Etot:", Etot.detach().numpy())


def run_param_grads():
    """Gradients wrt learned parameters + coordinates through SCF backward
    modes 1 (recursive adjoint) and 2 (backprop through the loop);
    cf. tests/test5.py, tests/test13.py, tests/test-train.py:85."""
    device = torch.device("cpu")
    species = torch.as_tensor(SPECIES, dtype=torch.int64, device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()))
    out = {}

    for mode, converger in ((1, [2]), (2, [1])):
        coordinates = torch.tensor(COORDS, device=device, requires_grad=True)
        sp = seqm_parameters("AM1", elements, converger=converger, eps=1.0e-10,
                             scf_backward=mode, scf_backward_eps=1.0e-8)
        ene = Energy(sp)
        # learned per-atom parameters initialized at the table values
        pp = Pack_Parameters(sp)
        Z = species.reshape(-1)[species.reshape(-1) > 0]
        learned = {}
        for name in ["U_ss", "zeta_s"]:
            full = Pack_Parameters(seqm_parameters("AM1", elements))
            idx = full.required_list.index(name)
            learned[name] = full.p[Z, idx].clone().detach().requires_grad_(True)
        sp["learned"] = list(learned)
        ene = Energy(sp)
        Hf = ene(const, coordinates, species, learned_parameters=learned,
                 all_terms=True)[0]
        Hf.sum().backward()
        out[f"Hf_m{mode}"] = Hf.detach().numpy()
        out[f"gU_ss_m{mode}"] = learned["U_ss"].grad.numpy()
        out[f"gzeta_s_m{mode}"] = learned["zeta_s"].grad.numpy()
        out[f"gcoord_m{mode}"] = coordinates.grad.detach().numpy()

    np.savez_compressed(os.path.join(OUT, "am1_param_grads.npz"),
                        species=np.array(SPECIES),
                        coordinates=np.array(COORDS), **out)
    for k, v in out.items():
        print(k, np.asarray(v).ravel()[:4])


def run_md_golden(method="AM1", nve_steps=5):
    """Deterministic (zero initial velocity) NVE + XL-BOMD trajectories
    for the CH2O/H2O batch; one golden file per method (AM1/MNDO/PM3)."""
    from seqm.MolecularDynamics import Molecular_Dynamics_Basic
    from seqm.XLBOMD import XL_BOMD

    device = torch.device("cpu")
    species = torch.as_tensor(SPECIES, dtype=torch.int64, device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()))
    out = {}

    sp = seqm_parameters(method, elements, eps=1.0e-10)
    md = Molecular_Dynamics_Basic(sp, timestep=1.0,
                                  output={"molid": [0], "thermo": 1,
                                          "dump": 10 ** 9, "prefix": "/tmp/md"})
    # stretch the geometry 3% off equilibrium so the trajectory is nontrivial
    coords = torch.tensor(COORDS, device=device) * 1.03
    vel = torch.zeros_like(coords)
    x, v, a = md.run(const, nve_steps, coords, vel, species)
    out["nve_coords"] = x.detach().numpy()
    out["nve_vel"] = v.detach().numpy()

    sp2cfg = seqm_parameters(method, elements, sp2=[False], eps=1.0e-10)
    xl = XL_BOMD(sp2cfg, timestep=1.0, k=5,
                 output={"molid": [0], "thermo": 1, "dump": 10 ** 9,
                         "prefix": "/tmp/xlmd"})
    coords = torch.tensor(COORDS, device=device) * 1.03
    vel = torch.zeros_like(coords)
    x, v, a, P, Pt = xl.run(const, 5, coords, vel, species)
    out["xl_coords"] = x.detach().numpy()
    out["xl_vel"] = v.detach().numpy()

    np.savez_compressed(os.path.join(OUT, f"{method.lower()}_md.npz"),
                        species=np.array(SPECIES),
                        coordinates=np.array(COORDS), **out)
    print(f"md golden done: {method} ({nve_steps} NVE steps)")


def run_batch_golden(method, nmol=96, molsize=8, jitter=0.08, seed=42):
    """Statistical golden batch (VERDICT r3 #6): nmol mixed-size jittered
    organics (the bench generator's round-robin CH2O/H2O/CH4/NH3/CH3OH/
    C2H6 set), reference f64 energies + forces + orbital energies.
    Broadens the parity evidence from 2 molecules/method to ~100
    (cf. the reference's own 101-copy sweep trick, tests/test6)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyseqm_tpu.utils.molecules import make_batch

    sp_np, co_np = make_batch(nmol, molsize, jitter=jitter, seed=seed)
    device = torch.device("cpu")
    species = torch.as_tensor(np.asarray(sp_np, np.int64), device=device)
    coords = torch.tensor(np.asarray(co_np, np.float64), device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()) - {0})

    frc = Force(seqm_parameters(method, elements, eig=True))
    f, Pconv, Etot, Hf, Eelec, Enuc, Eiso, EnucAB, e_orb, charge, notcnv = \
        frc(const, coords, species)
    assert not bool(notcnv.any()), "reference SCF failed on the batch"
    np.savez_compressed(
        os.path.join(OUT, f"{method.lower()}_batch{nmol}.npz"),
        species=np.asarray(sp_np), coordinates=np.asarray(co_np),
        Hf=Hf.detach().numpy(), Etot=Etot.detach().numpy(),
        Eelec=Eelec.detach().numpy(), Enuc=Enuc.detach().numpy(),
        force=f.detach().numpy(), e_orb=e_orb.detach().numpy(),
        charge=charge.detach().numpy())
    print(f"batch golden done: {method} nmol={nmol} "
          f"Hf[:3]={Hf.detach().numpy()[:3]}")


# even-valence-electron diatomics over the reference's effective element
# coverage (H..F; odd-electron systems raise, basics.py:73-74)
DIATOMICS = [(1, 1), (7, 1), (9, 1), (6, 6), (8, 6), (7, 7), (8, 8), (9, 9)]
DIATOMIC_R = np.concatenate([np.arange(0.75, 1.61, 0.1),
                             np.arange(1.8, 3.21, 0.35)])


def run_dissociation_golden(method):
    """Diatomic dissociation curves (cf. reference tests/test.py:27-33):
    every even-electron pair over H/C/N/O/F at 13 separations, reference
    f64 heats of formation.  Curves probe the integral series far from
    equilibrium (small-x Taylor branches, overlap decay) where the
    2-molecule goldens cannot."""
    device = torch.device("cpu")
    pairs = []
    for (zi, zj) in DIATOMICS:
        for r in DIATOMIC_R:
            pairs.append(((zi, zj), r))
    species = torch.as_tensor([[p[0][0], p[0][1]] for p in pairs],
                              dtype=torch.int64, device=device)
    coords = torch.tensor([[[0.0, 0.0, 0.0], [float(p[1]), 0.0, 0.0]]
                           for p in pairs], device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()))

    ene = Energy(seqm_parameters(method, elements))
    Hf, Etot, Eelec, Enuc, Eiso, EnucAB, e_orb, P, charge, notcnv = ene(
        const, coords, species, all_terms=True)
    np.savez_compressed(
        os.path.join(OUT, f"{method.lower()}_diatomics.npz"),
        species=species.numpy(), coordinates=coords.detach().numpy(),
        Hf=Hf.detach().numpy(), Etot=Etot.detach().numpy(),
        notconverged=notcnv.detach().numpy())
    print(f"dissociation golden done: {method} "
          f"{int(notcnv.sum())}/{len(pairs)} unconverged")


# charged closed-shell ions, molsize 5: H3O+ (+1), NH4+ (+1), OH- (-1)
CHARGED_SPECIES = [[8, 1, 1, 1, 0], [7, 1, 1, 1, 1], [8, 1, 0, 0, 0]]
CHARGED_COORDS = [
    # hydronium: trigonal pyramid, O-H 0.98 A
    [[0.0, 0.0, 0.0],
     [0.9014, 0.0, 0.3854],
     [-0.4507, 0.7806, 0.3854],
     [-0.4507, -0.7806, 0.3854],
     [0.0, 0.0, 0.0]],
    # ammonium: tetrahedral, N-H 1.03 A
    [[0.0, 0.0, 0.0],
     [0.5947, 0.5947, 0.5947],
     [-0.5947, -0.5947, 0.5947],
     [-0.5947, 0.5947, -0.5947],
     [0.5947, -0.5947, -0.5947]],
    # hydroxide: O-H 0.96 A
    [[0.0, 0.0, 0.0],
     [0.96, 0.0, 0.0],
     [0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0],
     [0.0, 0.0, 0.0]],
]
CHARGED_Q = [1, 1, -1]


def run_charged_golden(method="AM1", nve_steps=5):
    """Charged-molecule goldens: single-point energies/forces and a
    deterministic NVE trajectory with net charges threaded through the
    reference drivers (MolecularDynamics.py:335 -> basics.py:69-71)."""
    from seqm.MolecularDynamics import Molecular_Dynamics_Basic

    device = torch.device("cpu")
    species = torch.as_tensor(CHARGED_SPECIES, dtype=torch.int64,
                              device=device)
    coords = torch.tensor(CHARGED_COORDS, device=device)
    charges = torch.as_tensor(CHARGED_Q, dtype=torch.float64, device=device)
    const = Constants().to(device)
    elements = [0] + sorted(set(species.reshape(-1).tolist()) - {0})

    frc = Force(seqm_parameters(method, elements, eig=True))
    f, Pconv, Etot, Hf, Eelec, Enuc, Eiso, EnucAB, e_orb, charge, notcnv = \
        frc(const, coords, species, charges=charges)
    assert not bool(notcnv.any()), "reference SCF failed on charged batch"

    md = Molecular_Dynamics_Basic(
        seqm_parameters(method, elements, eps=1.0e-10), timestep=1.0,
        output={"molid": [0], "thermo": 1, "dump": 10 ** 9,
                "prefix": "/tmp/mdq"})
    c2 = torch.tensor(CHARGED_COORDS, device=device) * 1.03
    vel = torch.zeros_like(c2)
    x, v, a = md.run(const, nve_steps, c2, vel, species, charges=charges)

    np.savez_compressed(
        os.path.join(OUT, f"{method.lower()}_charged.npz"),
        species=np.array(CHARGED_SPECIES),
        coordinates=np.array(CHARGED_COORDS),
        charges=np.array(CHARGED_Q),
        Hf=Hf.detach().numpy(), Etot=Etot.detach().numpy(),
        Eelec=Eelec.detach().numpy(), Enuc=Enuc.detach().numpy(),
        force=f.detach().numpy(), e_orb=e_orb.detach().numpy(),
        nve_coords=x.detach().numpy(), nve_vel=v.detach().numpy())
    print(f"charged golden done: {method} Hf={Hf.detach().numpy()}")


if __name__ == "__main__":
    for m in ["AM1", "MNDO", "PM3"]:
        run_method(m)
    run_param_grads()
    # AM1 pins a longer (25-step) NVE horizon for drift checks; the other
    # methods pin 5-step trajectories (cf. reference tests/test7/test8)
    run_md_golden("AM1", nve_steps=25)
    run_md_golden("MNDO", nve_steps=5)
    run_md_golden("PM3", nve_steps=5)
    for m in ["AM1", "MNDO", "PM3"]:
        run_batch_golden(m)
        run_dissociation_golden(m)
    run_charged_golden("AM1")
