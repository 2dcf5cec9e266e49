"""
Molecular (non-PBC) DMET: fragments = orbital subsets of one cell
(reference system/molecule.py + solver usage on molecules).

Oracles:
  * fragment-tiling identity at the HF level: democratic fragment
    energies sum to the molecular RHF electronic energy.
  * DMET+FCI on fragments improves on HF toward full FCI.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def h4():
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.models.abinitio import make_molecule_lattice
    # linear H4 chain (all sites coupled -> nontrivial bath)
    atoms = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.8)),
             ("H", (0.0, 0.0, 3.6)), ("H", (0.0, 0.0, 5.4))]
    mol = Mole(atoms, basis="sto-6g")
    Lat, meta = make_molecule_lattice(mol)
    return Lat, meta


def test_molecule_fragment_tiling_hf(h4):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    Lat, meta = h4
    mol = meta["mole"]
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))

    E_frags, n_frags = [], []
    rho = np.asarray(Lat.rdm1_lo_R) * 0.5    # per-spin
    for frag in ([0, 1], [2, 3]):
        ImpHam, H1e, basis = dmet.ConstructImpHam(
            Lat, rho, vcor, matching=False, int_bath=True,
            imp_idx=frag, val_idx=frag)
        solver = SCFSolver(restricted=True, tol=1e-11)
        nelec_emb = 2 * len(frag)
        rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
            int_bath=True, solver=solver, imp_idx=list(range(len(frag))),
            solver_args={"nelec": nelec_emb})
        E_frags.append(EnergyImp * nlo - float(ImpHam.H0))
        n_frags.append(nelecImp * nlo)
    assert abs(sum(n_frags) - mol.nelectron) < 1e-6
    E_tot = sum(E_frags) + mol.energy_nuc()
    assert abs(E_tot - meta["E_hf"]) < 1e-6


def test_molecule_dmet_fci(h4):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.models.integral import Integral
    Lat, meta = h4
    mol = meta["mole"]
    nlo = meta["nlo"]
    Ham_mol = Integral(mol.nao, True, False, mol.energy_nuc(),
                       {"cd": meta["h_lo"][None]},
                       {"ccdd": meta["eri_lo"][None]})
    _, E_fci = FCI(restricted=True, tol=1e-11).run(Ham_mol,
                                                   nelec=mol.nelectron)
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    rho = np.asarray(Lat.rdm1_lo_R) * 0.5
    E_frags = []
    for frag in ([0, 1], [2, 3]):
        ImpHam, H1e, basis = dmet.ConstructImpHam(
            Lat, rho, vcor, matching=False, int_bath=True,
            imp_idx=frag, val_idx=frag)
        solver = FCI(restricted=True, tol=1e-11)
        nelec_emb = 2 * len(frag)
        rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)
        _, EnergyImp, _ = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
            int_bath=True, solver=solver, imp_idx=list(range(len(frag))),
            solver_args={"nelec": nelec_emb})
        E_frags.append(EnergyImp * nlo - float(ImpHam.H0))
    E_dmet = sum(E_frags) + mol.energy_nuc()
    E_hf = meta["E_hf"]
    assert E_dmet < E_hf - 1e-3
    assert abs(E_dmet - E_fci) < 0.5 * abs(E_hf - E_fci)


def test_multi_impurity_musolver(h4):
    """MuSolver over a LIST of impurity problems: one shared dmu fixes the
    summed electron count (reference MuSolver multi-impurity loop,
    Hubbard.py:124-196)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    Lat, meta = h4
    mol = meta["mole"]
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    rho = np.asarray(Lat.rdm1_lo_R) * 0.5

    frags = ([0, 1], [2, 3])
    ImpHams, bases, solvers, args, lats = [], [], [], [], []
    for frag in frags:
        ImpHam, H1e, basis = dmet.ConstructImpHam(
            Lat, rho, vcor, matching=False, int_bath=True,
            imp_idx=frag, val_idx=frag)
        ImpHams.append(ImpHam)
        bases.append(basis)
        solvers.append(FCI(restricted=True, tol=1e-11))
        args.append({"nelec": 2 * len(frag)})
        lats.append(Lat)
    mu_solver = dmet.MuSolver(adaptive=True)
    rhos, Es, ImpHams2, dmu = mu_solver(
        lats, mol.nelectron / (2.0 * mol.nao), ImpHams, bases, solvers,
        args, imp_idx=[list(range(len(f))) for f in frags])
    # summed impurity filling hits the target
    ntot = 0.0
    for rho_i, basis, frag in zip(rhos, bases, frags):
        ntot += dmet.transformResults(rho_i, None, basis, None, None,
                                      lattice=Lat,
                                      imp_idx=list(range(len(frag))))
    # MuSolver's metric: summed per-site impurity filling == 2 * filling
    target = 2.0 * (mol.nelectron / (2.0 * mol.nao))
    assert abs(ntot - target) < 1e-4
