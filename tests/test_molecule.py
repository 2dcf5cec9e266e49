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


def _h2o():
    from libdmet_preview_tpu.ints.md import MoleGeneral
    # experimental-ish geometry, dipole along z (bohr)
    r, th = 1.809, np.deg2rad(104.52)
    atoms = [("O", (0.0, 0.0, 0.0)),
             ("H", (r * np.sin(th / 2), 0.0, r * np.cos(th / 2))),
             ("H", (-r * np.sin(th / 2), 0.0, r * np.cos(th / 2)))]
    return MoleGeneral(atoms, basis="sto-3g")


def _rhf(mol, h_extra=None):
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF
    h = mol.intor_hcore()
    if h_extra is not None:
        h = h + h_extra
    Ham = Integral(mol.nao, True, False, mol.energy_nuc(),
                   {"cd": h[None]}, {"ccdd": mol.intor_eri()[None]},
                   ovlp=mol.intor_ovlp())
    scf = SCF()
    scf.set_system(mol.nelectron, 0, False, True)
    scf.set_integral(Ham)
    E, dm = scf.HF(tol=1e-12, MaxIter=200)
    return E, dm[0] + dm[1]


def test_molecule_mulliken_and_equivalence():
    """H2O/STO-3G: Mulliken charges sum to zero, O negative, the two H
    symmetry-equivalent; point-group orbits found geometrically
    (reference system/molecule.py + analyze.py parity)."""
    from libdmet_preview_tpu.utils.analysis import (mulliken_mol,
                                                    equivalent_atoms,
                                                    molecule_fragments)
    mol = _h2o()
    _, dm = _rhf(mol)
    pops, charges = mulliken_mol(mol, dm)
    assert abs(charges.sum()) < 1e-9
    assert charges[0] < -0.2
    assert abs(charges[1] - charges[2]) < 1e-8
    orbits = equivalent_atoms(mol)
    assert sorted(map(sorted, orbits)) == [[0], [1, 2]]
    frags = molecule_fragments(mol)
    assert frags[0][1] == list(range(5))        # O: 1s 2s 2p
    assert sorted(frags[1][1]) == [5, 6]        # the two H 1s


def test_molecule_dipole_vs_finite_field():
    """Analytic dipole (md.dipole_block integrals) == finite-field
    energy derivative dE/dF = -d_el, and the total H2O/STO-3G dipole
    lands at the textbook ~0.6-0.7 a.u. along z."""
    from libdmet_preview_tpu.utils.analysis import dipole_mol
    mol = _h2o()
    E0, dm = _rhf(mol)
    d = dipole_mol(mol, dm)
    assert abs(d[0]) < 1e-8 and abs(d[1]) < 1e-8
    assert 0.4 < d[2] < 0.9
    # finite field along z (origin at the charge center, matching
    # dipole_mol's default)
    origin = (mol.charges[:, None] * mol.coords).sum(0) / mol.charges.sum()
    r_int = mol.intor_dipole(origin=origin)[2]
    F = 2e-4
    Ep, _ = _rhf(mol, h_extra=F * r_int)
    Em, _ = _rhf(mol, h_extra=-F * r_int)
    d_el_ff = -(Ep - Em) / (2 * F)
    d_nuc = np.einsum("a, ax -> x", mol.charges, mol.coords - origin)[2]
    assert abs((d_el_ff + d_nuc) - d[2]) < 1e-6
