"""
Ab initio DMET on H rings (native Gaussian integrals, no PySCF).

Oracles (reference test strategy, SURVEY 4):
  * factorized (Cholesky) embedding-ERI transform vs brute-force 4-index
    transform (reference basis_transform/test/test_eri_transform*).
  * lattice mean field reproduces the molecular RHF energy exactly
    (reference test_mfd_fft.py:140 oracle, 1e-8).
  * DMET with interacting bath + HF solver reproduces the lattice HF
    energy per cell (reference test_mfd.py:153 oracle).
  * DMET + FCI improves on HF toward the exact (full FCI) energy.
"""

import numpy as np
import pytest


def test_eri_chol_vs_direct():
    from libdmet_preview_tpu.ops.eri_transform import (
        cholesky_eri, get_emb_eri_chol, get_emb_eri_mol)
    rng = np.random.RandomState(0)
    n, neo = 6, 4
    A = rng.randn(12, n, n)
    A = A + A.transpose(0, 2, 1)
    eri = np.einsum("xpq, xrs -> pqrs", A, A)
    L = cholesky_eri(eri, tol=1e-12)
    assert np.max(np.abs(np.einsum("xpq, xrs -> pqrs", L, L) - eri)) < 1e-8
    basis = rng.randn(2, 2, 3, neo)  # (spin, ncells, nlo, neo), n = 6
    g1 = get_emb_eri_chol(L, basis)
    g2 = get_emb_eri_mol(eri, basis)
    assert np.max(np.abs(g1 - g2)) < 1e-8


def test_get_emb_eri_dispatch():
    """Unified df_type dispatch (reference eri_transform.py:44-94 role):
    inferred routing on array rank agrees with the named drivers."""
    from libdmet_preview_tpu.ops.eri_transform import (
        cholesky_eri, get_emb_eri, get_emb_eri_chol, get_emb_eri_mol)
    rng = np.random.RandomState(1)
    n, neo = 6, 4
    A = rng.randn(12, n, n)
    A = A + A.transpose(0, 2, 1)
    eri = np.einsum("xpq, xrs -> pqrs", A, A)
    L = cholesky_eri(eri, tol=1e-12)
    basis = rng.randn(1, 2, 3, neo)
    ref_c = get_emb_eri_chol(L, basis)
    ref_m = get_emb_eri_mol(eri, basis)
    assert np.max(np.abs(get_emb_eri(L, basis) - ref_c)) == 0.0
    assert np.max(np.abs(get_emb_eri(eri, basis) - ref_m)) == 0.0
    assert np.max(np.abs(get_emb_eri(L, basis, df_type="chol")
                         - ref_c)) == 0.0
    with pytest.raises(ValueError):
        get_emb_eri(np.zeros((3, 3)), basis)


@pytest.fixture(scope="module")
def hring6():
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    return Lat, meta


def test_hring_latt_hf_oracle(hring6):
    """Lattice mean field == molecular RHF energy (same state)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    Lat, meta = hring6
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    ncells = Lat.ncells
    E_mf_cell = res["E"]
    assert abs(E_mf_cell - meta["E_hf"] / ncells) < 1e-8
    # folded rdm1 matches the molecular one
    assert np.max(np.abs(rho[0] * 2.0
                         - np.asarray(Lat.rdm1_lo_R)[0])) < 1e-7


def test_hring_dmet_hf_limit(hring6):
    """Interacting-bath DMET with an HF solver == lattice HF per cell."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    Lat, meta = hring6
    nlo = meta["nlo"]
    ncells = Lat.ncells
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)

    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=True)
    solver = SCFSolver(restricted=True, tol=1e-11)
    nelec_emb = (Lat.ncore + Lat.nval) * 2
    rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)
    rhoImp, EnergyImp, nelecImp = dmet.transformResults(
        rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=solver, solver_args={"nelec": nelec_emb})
    assert abs(nelecImp * nlo - meta["mole"].nelectron / ncells) < 1e-6
    assert abs(EnergyImp * nlo - meta["E_hf"] / ncells) < 1e-7


def test_hring_dmet_fci(hring6):
    """IB DMET + FCI: improves on HF, bounded below by full FCI."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.models.integral import Integral
    Lat, meta = hring6
    nlo = meta["nlo"]
    ncells = Lat.ncells
    mol = meta["mole"]

    # exact reference: molecular FCI in the LO basis
    Ham_mol = Integral(mol.nao, True, False, mol.energy_nuc(),
                       {"cd": meta["h_lo"][None]},
                       {"ccdd": meta["eri_lo"][None]})
    _, E_fci = FCI(restricted=True, tol=1e-11).run(Ham_mol,
                                                   nelec=mol.nelectron)

    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = mol.nelectron / (2.0 * mol.nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=True)
    solver = FCI(restricted=True, tol=1e-11)
    nelec_emb = (Lat.ncore + Lat.nval) * 2
    solver_args = {"nelec": nelec_emb}
    rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)
    rhoImp, EnergyImp, nelecImp = dmet.transformResults(
        rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=solver, solver_args=solver_args)
    E_dmet = EnergyImp * nlo * ncells        # total energy
    E_hf = meta["E_hf"]
    assert E_dmet < E_hf - 1e-4              # captures correlation
    # within 30% of the full correlation energy of the exact answer
    assert abs(E_dmet - E_fci) < 0.3 * abs(E_hf - E_fci)


@pytest.fixture(scope="module")
def hring_321g():
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="3-21g",
                                    localization="iao",
                                    minimal_ref="sto-6g")
    return Lat, meta


def test_hring_321g_iao_hf_oracle(hring_321g):
    """IAO+PAO basis is complete and val/virt-split: the lattice mean
    field reproduces the molecular RHF energy; PAOs carry ~zero HF
    occupation (IAOs exactly span the occupied space)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    Lat, meta = hring_321g
    nlo = meta["nlo"]
    assert meta["nval"] == 2 and meta["nvirt"] == 2
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    assert abs(res["E"] - meta["E_hf"] / Lat.ncells) < 1e-8
    # PAO occupations vanish at the HF level
    rdm_cell0 = np.asarray(Lat.rdm1_lo_R)[0, 0]
    assert np.max(np.abs(np.diag(rdm_cell0)[meta["nval"]:])) < 1e-10


def test_hring_321g_dmet_ccsd(hring_321g):
    """Valence-bath interacting-bath DMET + CCSD on the 3-21G ring:
    HF-limit oracle with the HF solver, then CCSD captures correlation."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    from libdmet_preview_tpu.solvers.cc import CCSD
    Lat, meta = hring_321g
    nlo = meta["nlo"]
    ncells = Lat.ncells
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=True)
    nelec_emb = (Lat.ncore + Lat.nval) * 2
    # HF-limit oracle (valence bath exactly spans the occupied space)
    hf = SCFSolver(restricted=True, tol=1e-11)
    rhoEmb, E_emb = hf.run(ImpHam, nelec=nelec_emb)
    _, E_hf_dmet, _ = dmet.transformResults(
        rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=hf, solver_args={"nelec": nelec_emb})
    assert abs(E_hf_dmet * nlo - meta["E_hf"] / ncells) < 1e-7
    # CCSD lowers the energy
    cc = CCSD(restricted=True, tol=1e-9)
    rhoEmb, E_emb = cc.run(ImpHam, nelec=nelec_emb)
    _, E_cc_dmet, _ = dmet.transformResults(
        rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=cc, solver_args={"nelec": nelec_emb})
    assert E_cc_dmet < E_hf_dmet - 1e-4


def test_hring_dmet_self_consistent(hring6):
    """Full self-consistent DMET (vcor fit + DIIS) on the sto-6g ring:
    must converge, improve on HF, and stay above... close to full FCI
    (reference test_self_consistency.py workflow)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS
    from libdmet_preview_tpu.models.integral import Integral
    Lat, meta = hring6
    nlo = meta["nlo"]
    ncells = Lat.ncells
    mol = meta["mole"]
    Ham_mol = Integral(mol.nao, True, False, mol.energy_nuc(),
                       {"cd": meta["h_lo"][None]},
                       {"ccdd": meta["eri_lo"][None]})
    _, E_fci = FCI(restricted=True, tol=1e-11).run(Ham_mol,
                                                   nelec=mol.nelectron)
    E_hf = meta["E_hf"]

    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = mol.nelectron / (2.0 * mol.nao)
    solver = FCI(restricted=True, tol=1e-11)
    adiis = DIIS(space=4)
    nelec_emb = (Lat.ncore + Lat.nval) * 2
    solver_args = {"nelec": nelec_emb}

    E_old, conv = 0.0, False
    for it in range(15):
        rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None,
                                         ires=True)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=True)
        rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
            int_bath=True, solver=solver, solver_args=solver_args)
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     filling, MaxIter2=0)
        if it >= 3:
            pvcor = adiis.update(np.hstack(vcor_new.param))
        else:
            pvcor = np.hstack(vcor_new.param)
        dV = np.linalg.norm(pvcor - vcor.param) / max(len(vcor.param), 1)
        vcor.update(pvcor)
        dE = EnergyImp - E_old
        E_old = EnergyImp
        if dV < 1e-6 and abs(dE) < 1e-7 and it > 2:
            conv = True
            break
    E_dmet = E_old * nlo * ncells
    assert conv
    assert E_dmet < E_hf - 1e-4
    assert abs(E_dmet - E_fci) < 0.5 * abs(E_hf - E_fci)


def test_hring_fractional_impurity(hring6):
    """Partial-cell impurities (reference test_1H_imp/test_half_imp
    family): the two half-cell fragments' democratic energies sum to the
    HF energy per cell when solved with the HF solver."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    Lat, meta = hring6
    nlo = meta["nlo"]
    ncells = Lat.ncells
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)

    E_frags, n_frags = [], []
    for frag in ([0], [1]):
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
        # Efrag includes the full per-cell constant H0 (reference
        # convention: each fragment run carries lattice.getH0()); undo the
        # /nscsites convention and strip H0 to get the electronic part
        E_frags.append(EnergyImp * nlo - float(ImpHam.H0))
        n_frags.append(nelecImp * nlo)
    assert abs(sum(n_frags) - meta["mole"].nelectron / ncells) < 1e-5
    E_cell = sum(E_frags) + meta["mole"].energy_nuc() / ncells
    assert abs(E_cell - meta["E_hf"] / ncells) < 1e-5


def test_csc_hf_fixed_point(hring6):
    """Charge self-consistency: with the HF solver the veff rebuild from
    the democratic global rdm is a FIXED POINT of the lattice fock
    (reference test_csc oracle), and E1-from-global matches the direct
    1-body energy."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    Lat, meta = hring6
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=True)
    solver = SCFSolver(restricted=True, tol=1e-11)
    nelec_emb = (Lat.ncore + Lat.nval) * 2
    rhoEmb, E_emb = solver.run(ImpHam, nelec=nelec_emb)

    # E1 from the global rdm == direct hcore energy of the HF state
    E1_glob = embham.get_E1_from_glob(Lat, rhoEmb, basis)
    rho_latt = np.asarray(Lat.rdm1_lo_R)   # total (spin-traced)
    h = np.asarray(Lat.getH1(kspace=False))
    E1_direct = float(np.einsum("Rpq, Rpq ->", h, rho_latt[0]))
    # precision limited by the SCF fixed points (molecular HF 1e-12,
    # embedded HF 1e-11 on E -> ~1e-6 on the density), not the transform
    assert abs(E1_glob - E1_direct) < 5e-6

    # CSC fixed point: the rebuilt fock equals the converged lattice fock
    fock_before = np.array(Lat.fock_lo_R, copy=True)
    rdm1_before = np.array(Lat.rdm1_lo_R, copy=True)
    dfock, _ = embham.update_lattice_csc(Lat, rhoEmb, basis)
    assert dfock < 1e-6
    # restore state for other tests sharing the fixture (the CSC update
    # also swaps in the democratic global rdm)
    Lat.fock_lo_R = fock_before
    Lat.fock_lo_k = Lat._pairify(Lat.R2k(fock_before))
    Lat.rdm1_lo_R = rdm1_before
    Lat.rdm1_lo_k = Lat._pairify(Lat.R2k(rdm1_before))


def test_gso_eri_chol_vs_brute_force():
    """GSO embedding ERI from Cholesky factors: the ph-transformed
    two-body factorizes as a syrk of (La - Lb); checked against the
    explicit species-blocked transform (reference get_emb_eri_gso)."""
    from libdmet_preview_tpu.ops.eri_transform import (cholesky_eri,
                                                       get_emb_eri_gso_chol)
    from libdmet_preview_tpu.ops.spinless import transform_eri_local_gso
    rng = np.random.RandomState(14)
    nao, neo = 3, 4
    A = rng.randn(6, nao, nao)
    A = A + A.transpose(0, 2, 1)
    g = np.einsum("xpq, xrs -> pqrs", A, A)
    L = cholesky_eri(g, tol=1e-12)
    nso = 2 * nao
    basis = rng.randn(1, 1, nso, neo)
    GV2 = np.asarray([g, g, -g])
    want = transform_eri_local_gso(basis[0, :, :nao, :],
                                   basis[0, :, nao:, :], GV2)
    got = get_emb_eri_gso_chol(L, basis)
    assert np.max(np.abs(got - want)) < 1e-9


def test_rdm1_idem_pdmet(hring6):
    """pDMET idempotency projection (reference get_rdm1_idem): the
    projected global rdm is idempotent, keeps the electron count, and is
    a FIXED POINT for an already-idempotent (HF) density."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    Lat, meta = hring6
    nlo = meta["nlo"]
    rho = np.asarray(Lat.rdm1_lo_R) * 0.5    # per-spin HF density
    nelec_spin = meta["mole"].nelectron / 2.0 / Lat.ncells * Lat.ncells
    rho_idem = embham.get_rdm1_idem(rho, meta["mole"].nelectron / 2.0,
                                    Lat.kmesh)
    assert np.max(np.abs(rho_idem - rho)) < 1e-7   # HF density: fixed point
    # perturb -> projection restores idempotency and the trace
    rng = np.random.RandomState(15)
    pert = rho.copy()
    pert[0, 0] += 0.05 * np.eye(nlo)
    rho_p = embham.get_rdm1_idem(pert, meta["mole"].nelectron / 2.0,
                                 Lat.kmesh)
    full = np.asarray(Lat.expand(rho_p))[0]
    assert np.max(np.abs(full @ full - full)) < 1e-8
    assert abs(np.trace(full) - meta["mole"].nelectron / 2.0) < 1e-8


def test_gdf_kresolved_transform(hring6):
    """k-resolved GDF embedding-ERI transform with momentum conservation
    (the reference's hot kernel, eri_transform.py:235-565): factors per
    momentum transfer, rotate+syrk per q, equals the brute-force
    real-space transform to machine precision."""
    from libdmet_preview_tpu.ops.eri_transform import (make_gdf_factors,
                                                       get_emb_eri_gdf,
                                                       get_emb_eri_mol)
    Lat, meta = hring6
    nc, nlo = Lat.ncells, Lat.nscsites
    rng = np.random.RandomState(4)
    neo = 4
    basis = rng.randn(1, nc, nlo, neo)
    basis_k = Lat.R2k_basis(basis)
    factors = make_gdf_factors(meta["eri_lo"], nc, nlo)
    g1 = get_emb_eri_gdf(factors, basis_k, nc, nlo)
    g2 = get_emb_eri_mol(meta["eri_lo"], basis)
    assert np.max(np.abs(g1 - g2)) < 1e-10
    # time-reversal-weighted irreducible-transfer loop is exact too
    g3 = get_emb_eri_gdf(factors, basis_k, nc, nlo, tr_symm=True)
    assert np.max(np.abs(g3 - g2)) < 1e-10
    # the per-q ranks are far below the full naux = nc*nlo^2 bound only
    # when screening triggers; at least verify rank-revealing consistency
    for q, (Fr, Fi) in factors.items():
        assert Fr.shape[-1] <= nc * nlo * nlo


def test_csc_full_loop_fci():
    """Full charge-self-consistent DMET loop (reference update_Ham/Knizia
    self-consistency): iterate FCI embedding + dmu fit -> democratic
    global rdm -> veff rebuild -> new lattice fock until the fock stops
    moving.  The loop must converge, hold the impurity filling, and give
    a stable correlated energy below HF."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    from libdmet_preview_tpu.solvers import FCI

    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    solver = FCI(restricted=True, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}

    E_hist, dfock, last_dmu = [], np.inf, 0.0
    for it in range(25):
        rho, mu = dmet.RHartreeFock(Lat, vcor, filling, None)
        ImpHam, H1e, basis = dmet.ConstructImpHam(
            Lat, rho, vcor, matching=False, int_bath=True)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
        rhoEmb, E_emb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        E_hist.append(EnergyImp)
        dfock, _ = embham.update_lattice_csc(Lat, rhoEmb, basis)
        if dfock < 1e-7 and it > 0:
            break
    assert dfock < 1e-7, "CSC fock did not converge: dfock=%g" % dfock
    assert abs(E_hist[-1] - E_hist[-2]) < 1e-7
    assert nelecImp * nlo == pytest.approx(
        meta["mole"].nelectron / 3.0, abs=1e-4)
    # correlated total per cell below the HF total per cell (EnergyImp
    # carries the full per-cell ImpHam.H0; swap it for the nuclear term)
    E_cell = E_hist[-1] * nlo - float(ImpHam.H0) \
        + meta["mole"].energy_nuc() / 3.0
    assert E_cell < meta["E_hf"] / 3.0 - 1e-6


def test_native_eri_core_matches_numpy():
    """The C++ integral core (ints/_gto_core.cpp via ctypes) reproduces
    the validated NumPy s-shell ERI loop to machine precision (the
    framework's ownership of the reference's PySCF-C libcgto role,
    SURVEY 2.8)."""
    import libdmet_preview_tpu.ints.native as native
    from libdmet_preview_tpu.ints.gto import Mole
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.4)),
                ("H", (1.2, 0.5, 0))], basis="sto-6g")
    out = native.eri_s_shells(mol.shells)
    if out is None:
        pytest.skip("native core unavailable (no g++)")
    import os
    os.environ["LIBDMET_TPU_NO_NATIVE"] = "1"
    try:
        native._LIB, native._TRIED = None, True
        ref = mol.intor_eri()
    finally:
        del os.environ["LIBDMET_TPU_NO_NATIVE"]
        native._TRIED = False
    assert np.abs(out - ref).max() < 1e-13


def test_gso_gdf_kresolved_transform(hring6):
    """GSO embedding ERI from k-resolved GDF factors (the reference's
    get_emb_eri_gso GDF driver for ab initio superconducting DMET):
    equals the brute-force species-blocked ph transform."""
    from libdmet_preview_tpu.ops.eri_transform import (make_gdf_factors,
                                                       get_emb_eri_gso_gdf)
    from libdmet_preview_tpu.ops.spinless import transform_eri_local_gso
    import jax.numpy as jnp
    Lat, meta = hring6
    nc, nao = Lat.ncells, Lat.nscsites
    rng = np.random.RandomState(9)
    neo = 4
    nso = 2 * nao
    basis = rng.randn(1, nc, nso, neo)
    basis_k = Lat.R2k_basis(basis)
    factors = make_gdf_factors(meta["eri_lo"], nc, nao)
    g1 = get_emb_eri_gso_gdf(factors, basis_k, nc, nao)
    # brute force: full-lattice dense GSO transform of the exact ERI
    g = meta["eri_lo"]          # (nsite,)*4 full lattice
    Ca = basis[0, :, :nao, :].reshape(nc * nao, neo)
    Cb = basis[0, :, nao:, :].reshape(nc * nao, neo)
    # dense route: g_gso = (aa-rot - bb-rot) applied to both index pairs
    Taa = np.asarray(jnp.einsum("pqrs, pi, qj -> ijrs", jnp.asarray(g),
                                jnp.asarray(Ca), jnp.asarray(Ca)))
    Tbb = np.asarray(jnp.einsum("pqrs, pi, qj -> ijrs", jnp.asarray(g),
                                jnp.asarray(Cb), jnp.asarray(Cb)))
    D = Taa - Tbb
    g2 = np.asarray(jnp.einsum("ijrs, rk, sl -> ijkl", jnp.asarray(D),
                               jnp.asarray(Ca), jnp.asarray(Ca))) \
        - np.asarray(jnp.einsum("ijrs, rk, sl -> ijkl", jnp.asarray(D),
                                jnp.asarray(Cb), jnp.asarray(Cb)))
    assert np.max(np.abs(g1 - g2)) < 1e-10
    # tr_symm weights exact too
    g3 = get_emb_eri_gso_gdf(factors, basis_k, nc, nao, tr_symm=True)
    assert np.max(np.abs(g3 - g2)) < 1e-10


def test_cderi_roundtrip_and_ingestion(hring6, tmp_path):
    """PySCF-layout CDERI HDF5 interop (ops/cderi.py, reference
    eri_transform.py:195-233 sr_loop role): export our per-transfer GDF
    factors, ingest them back through the full file surface (kptij
    matching, s2 tril unpacking for gamma-like diagonal pairs,
    segment concatenation, conjugate reverse pairs) and reproduce the
    brute-force embedding ERI exactly."""
    from libdmet_preview_tpu.ops.eri_transform import (make_gdf_factors,
                                                       get_emb_eri_gdf,
                                                       get_emb_eri_mol)
    from libdmet_preview_tpu.ops.cderi import write_cderi, read_cderi
    Lat, meta = hring6
    nc, nlo = Lat.ncells, Lat.nscsites
    kpts_scaled = np.asarray([[0.0, 0.0, f] for f in np.fft.fftfreq(nc)])
    kpts = 2.0 * np.pi * kpts_scaled / 3.7        # arbitrary cell length
    factors = make_gdf_factors(meta["eri_lo"], nc, nlo)
    fname = str(tmp_path / "cderi.h5")
    write_cderi(fname, factors, kpts, kpts_scaled, nlo)
    fac2 = read_cderi(fname, kpts, kpts_scaled, nlo)
    rng = np.random.RandomState(11)
    neo = 4
    basis = rng.randn(1, nc, nlo, neo)
    basis_k = Lat.R2k_basis(basis)
    ref = get_emb_eri_mol(meta["eri_lo"], basis)
    g = get_emb_eri_gdf(fac2, basis_k, nc, nlo)
    assert np.max(np.abs(g - ref)) < 1e-9
    # complex s1 branch exercised above; the REAL s2-packed branch is
    # exercised by a gamma-only factorization (real aux gauge)
    from libdmet_preview_tpu.ops.eri_transform import cholesky_eri
    eri0 = np.asarray(meta["eri_lo"])[:nlo, :nlo, :nlo, :nlo]
    L0 = cholesky_eri(eri0, tol=1e-12)            # (naux, nlo, nlo) real
    fac_g = {0: (np.moveaxis(L0, 0, -1)[None],
                 np.zeros((1, nlo, nlo, L0.shape[0])))}
    kpts_g = np.zeros((1, 3))
    fname_g = str(tmp_path / "cderi_gamma.h5")
    write_cderi(fname_g, fac_g, kpts_g, kpts_g, nlo)
    import h5py
    with h5py.File(fname_g, "r") as f:
        d = np.asarray(f["j3c/0/0"])
        assert not np.iscomplexobj(d) and d.shape[1] == nlo * (nlo + 1) // 2
    fac_g2 = read_cderi(fname_g, kpts_g, kpts_g, nlo)
    Fr, Fi = fac_g2[0]
    eri_back = np.einsum("pqx, rsx -> pqrs", Fr[0], Fr[0])
    assert np.abs(eri_back - eri0).max() < 1e-9
    assert np.abs(Fi).max() < 1e-12
