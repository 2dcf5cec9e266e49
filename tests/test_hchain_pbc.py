"""
Native periodic ab initio DMET: the reference's H-chain workloads, end to
end through the native integral engine (no PySCF anywhere).

Reference anchors (libdmet integration tests, GDF-based):
  * interacting bath, FCI, self-consistent vcor + charge SC:
    E_elec/cell = -1.243085261466
    (/root/reference/libdmet/test/test_self_consistency.py:249)
  * non-interacting bath, spin-polarized UHF lattice, FCI, iteration-0:
    E_elec/cell = -1.238248899089 at 1e-7
    (/root/reference/libdmet/test/test_non_int_bath_uhf.py:227)

Our integrals are exact AFT/Ewald (the reference's are GDF-fitted with an
even-tempered aux basis), so the residual vs the anchors is the density-
fitting error: measured 2.0e-5 (IB) and 9.1e-6 (NIB-UHF) -- well inside
the 1e-4 tolerance of the first anchor; the second is asserted at 5e-5.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def hchain_r():
    from libdmet_preview_tpu.models.abinitio import make_hchain_pbc_lattice
    return make_hchain_pbc_lattice(nk=3)


def test_pbc_integrals_madelung():
    """Ewald sum reproduces the NaCl Madelung constant."""
    from libdmet_preview_tpu.ints.pbc import PbcCell
    fcc = [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0)]
    coords = [np.array(p, float) for p in fcc] \
        + [np.array(p, float) + np.array([1.0, 0, 0]) for p in fcc]
    cell = PbcCell([("H", c) for c in coords], np.eye(3) * 2.0,
                   basis="sto-3g", unit="B")
    cell.charges = np.asarray([1.0] * 4 + [-1.0] * 4)
    M = -cell.energy_nuc() / 4.0
    assert abs(M - 1.7475645946) < 1e-9


def test_pbc_hf_molecular_limit():
    """PBC HF + the exchange-Madelung correction converges to the
    molecular RHF energy as the box grows (validates ovlp/kin/nuc/ERI
    and the Ewald background conventions jointly)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ints.pbc import PbcCell
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF

    def hf(S, h, eri, enuc, nelec):
        Ham = Integral(S.shape[0], True, False, enuc, {"cd": h[None]},
                       {"ccdd": eri[None]}, ovlp=S)
        m = SCF()
        m.set_system(nelec, 0, False, True)
        m.set_integral(Ham)
        E, _ = m.HF(tol=1e-12, MaxIter=200)
        return E

    atoms = [("H", (0, 0, 0)), ("H", (0, 0, 1.4))]
    mol = Mole(atoms, basis="3-21g")
    E_mol = hf(mol.intor_ovlp(), mol.intor_hcore(), mol.intor_eri(),
               mol.energy_nuc(), 2)
    L = 15.0
    cell = PbcCell(atoms, np.eye(3) * L, basis="3-21g", unit="B")
    xi = PbcCell([("H", (0, 0, 0))], np.eye(3) * L, basis="sto-3g",
                 unit="B").energy_nuc()
    E_pbc = hf(cell.intor_ovlp(), cell.intor_hcore(), cell.intor_eri(),
               cell.energy_nuc(), 2)
    # exxdiv=None misses the exchange Madelung term -N_e * xi_self;
    # remaining finite-size error is O(1/L^3)
    assert abs((E_pbc + 2 * xi) - E_mol) < 5e-3
    # the single-charge Ewald self energy itself: -1.41865 / L (cubic)
    assert abs(xi * L - (-1.41865)) < 1e-4


def test_hchain_hf_identity(hchain_r):
    """Lattice mean field on the DMET lattice == supercell RHF (electronic),
    and NIB DMET with the HF solver reproduces it (verify-skill oracle)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import update_ham_dense
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    from libdmet_preview_tpu.solvers import SCFSolver
    Lat, meta = hchain_r
    nsc = Lat.nscsites
    Filling = 6 / (nsc * 2.0 * 3)
    vcor = VcorLocal(True, False, nsc)
    vcor.assign(np.zeros((2, nsc, nsc)))
    rho, Mu, res = dmet.RHartreeFock(Lat, vcor, Filling, None, ires=True)
    assert abs(res["E"] - meta["E_hf_elec"] / 3) < 1e-7
    update_ham_dense(Lat, meta, np.asarray(rho)[0] * 2.0)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=False)
    solver = SCFSolver(restricted=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    rhoEmb, EnergyEmb = solver.run(ImpHam, **solver_args)
    _, EnergyImp, _ = dmet.transformResults(
        rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=False, solver=solver, solver_args=solver_args)
    assert abs(EnergyImp * nsc - meta["E_hf_elec"] / 3) < 1e-6


def test_hchain_ib_self_consistent_anchor(hchain_r):
    """Self-consistent interacting-bath FCI DMET on the 3-k-point H chain
    == the reference anchor -1.243085261466 (1e-4); measured diff 2.0e-5
    (exact-AFT vs GDF integrals)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import update_ham_dense
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    from libdmet_preview_tpu.ops.diis import DIIS
    from libdmet_preview_tpu.ops.fit import make_vcor_trace_unchanged
    from libdmet_preview_tpu.solvers import FCI
    Lat, meta = hchain_r
    nsc = Lat.nscsites
    Filling = 6 / (nsc * 2.0 * 3)
    vcor = VcorLocal(True, False, nsc)
    vcor.assign(np.zeros((2, nsc, nsc)))
    solver = FCI(restricted=True, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    adiis = DIIS(space=4)
    Mu, last_dmu, E_old = 0.0, 0.0, 0.0
    E_cell = None
    for it in range(12):
        rho, Mu, res = dmet.RHartreeFock(Lat, vcor, Filling, Mu, ires=True)
        update_ham_dense(Lat, meta, np.asarray(rho)[0] * 2.0)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=True)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
        solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, Filling, ImpHam, basis, solver, solver_args,
            thrnelec=1e-6, delta=0.01, step=0.1)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        E_cell = EnergyImp * nsc
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     Filling, MaxIter1=500, MaxIter2=0,
                                     ytol=1e-7, gtol=1e-4)
        if it >= 3:
            vcor_new = make_vcor_trace_unchanged(vcor_new, vcor)
        if it >= 4:
            pvcor = adiis.update(np.hstack(vcor_new.param))
        else:
            pvcor = np.hstack(vcor_new.param)
        dV = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
        vcor.update(pvcor)
        dE = E_cell - E_old
        E_old = E_cell
        if dV < 1e-5 and abs(dE) < 1e-6 and it > 4:
            break
    assert abs(E_cell - (-1.243085261466)) < 1e-4


def test_hchain_nib_uhf_anchor():
    """Iteration-0 NIB FCI DMET on the spin-polarized (AFM) UHF H chain
    with per-spin IAOs == the reference anchor -1.238248899089 (asserted
    1e-7 there against its own GDF integrals; measured diff 9.0e-6 with
    our exact integrals).  The residual is attributable to the
    REFERENCE's finite GDF auxiliary basis, not to this engine: with
    the range-separated ERI path the native integrals are converged to
    ~1e-10 (tests/test_pbc_3d.py::test_intor_eri_rs_sharp_converged)
    and the measured diff is unchanged (9.1e-6 on the default G mesh,
    9.0e-6 converged)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import (
        make_hchain_pbc_lattice_uhf, update_ham_dense_uhf)
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    from libdmet_preview_tpu.solvers import FCI
    Lat, meta = make_hchain_pbc_lattice_uhf(nk=3)
    nsc = Lat.nscsites
    Filling = 6 / (nsc * 2.0 * 3)
    vcor = VcorLocal(False, False, nsc)
    vcor.assign(np.zeros((2, nsc, nsc)))
    solver = FCI(restricted=False, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    rho, Mu, res = dmet.HartreeFock(Lat, vcor, Filling, None, ires=True)
    # the UHF lattice mean field must land on the polarized solution
    assert np.abs(np.asarray(rho)[0] - np.asarray(rho)[1]).max() > 0.3
    assert abs(res["E"] - meta["E_hf_elec"] / 3) < 1e-7
    update_ham_dense_uhf(Lat, meta, np.asarray(rho))
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=True,
                                              int_bath=False)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
        Lat, Filling, ImpHam, basis, solver, solver_args,
        thrnelec=5e-6, delta=0.01, step=0.1)
    _, EnergyImp, _ = dmet.transformResults(
        rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat, last_dmu=dmu,
        int_bath=False, solver=solver, solver_args=solver_args)
    assert abs(EnergyImp * nsc - (-1.238248899089)) < 5e-5


def test_hchain_1h_fractional_imp_anchor(hchain_r):
    """Self-consistent IB FCI DMET with a FRACTIONAL (1-H, half-cell)
    impurity -- val orbital [0] (first H's IAO) + virt orbital [2] (its
    PAO) -- == the reference anchor -0.623164674003
    (test_1H_imp.py:240, 1e-4; measured diff 1.1e-5).  Exercises
    imp_idx-restricted bath SVD, vcor idx_range, mu fit at Filling/2,
    and democratic-partitioning energy scaling for imp != cell."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import update_ham_dense
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    from libdmet_preview_tpu.ops.fit import make_vcor_trace_unchanged
    from libdmet_preview_tpu.solvers import FCI
    Lat, meta = hchain_r
    nsc = Lat.nscsites
    val0, virt0 = list(Lat.val_idx), list(Lat.virt_idx)
    try:
        Lat.set_val_virt_core([0], [2], [])
        Filling = 6 / (nsc * 2.0 * 3)
        vcor = VcorLocal(True, False, nsc, idx_range=[0, 2])
        vcor.assign(np.zeros((2, nsc, nsc)))
        solver = FCI(restricted=True, tol=1e-12)
        mu_solver = dmet.MuSolver(adaptive=True)
        Mu, last_dmu, E_old = 0.0, 0.0, 0.0
        E_frag = None
        for it in range(6):
            rho, Mu, res = dmet.RHartreeFock(Lat, vcor, Filling, Mu,
                                             ires=True)
            update_ham_dense(Lat, meta, np.asarray(rho)[0] * 2.0)
            ImpHam, H1e, basis = dmet.ConstructImpHam(
                Lat, rho, vcor, matching=True, int_bath=True)
            ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
            solver_args = {"nelec": min((Lat.ncore + Lat.nval) * 2, 6)}
            rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
                Lat, Filling * 0.5, ImpHam, basis, solver, solver_args,
                thrnelec=1e-5, delta=0.01, step=0.1)
            last_dmu += dmu
            _, EnergyImp, nelecImp = dmet.transformResults(
                rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
                last_dmu=last_dmu, int_bath=True, solver=solver,
                solver_args=solver_args)
            E_frag = EnergyImp * nsc
            vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor,
                                         np.inf, Filling, MaxIter1=500,
                                         MaxIter2=0, ytol=1e-8,
                                         gtol=1e-4)
            if it >= 3:
                vcor_new = make_vcor_trace_unchanged(vcor_new, vcor)
            pvcor = np.hstack(vcor_new.param)
            dV = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
            vcor.update(pvcor)
            dE, E_old = E_frag - E_old, E_frag
            if dV < 1e-5 and abs(dE) < 1e-5 and it > 2:
                break
        # half-cell fragment: one electron, half the cell energy
        assert abs(nelecImp * nsc - 1.0) < 1e-4
        assert abs(E_frag - (-0.623164674003)) < 1e-4
    finally:
        Lat.set_val_virt_core(val0, virt0, [])


def test_get_emb_eri_aft_streaming():
    """G-block-streamed AFT embedding-ERI driver == the embedding
    transform of the dense supercell ERI (the reference's AFT driver
    capability, eri_transform.py:566-779, never materializing the AO
    ERI -- the scaling path for large tori)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ints.pbc import make_hchain_supercell
    cell = make_hchain_supercell(nk=2, basis="sto-6g")
    rng = np.random.RandomState(0)
    C = rng.randn(cell.nao, 3)
    eri_dense = cell.intor_eri()
    ref = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", eri_dense, C, C, C,
                    C, optimize=True)
    out = cell.get_emb_eri_aft(C, blksize=5000)
    assert np.abs(out - ref).max() < 1e-10


def test_stripe_assembly_matches_full():
    """Translation-symmetric (stripe) integral assembly == the full
    supercell assembly at machine precision (first-block-column 1-body
    matrices + e^{-iG.T} phase reconstruction of the pair FT)."""
    from libdmet_preview_tpu.ints.pbc import make_hchain_supercell
    cs = make_hchain_supercell(nk=2, basis="sto-6g")
    cf = make_hchain_supercell(nk=2, basis="sto-6g")
    cf.ncells_tr = None     # disable the stripe path
    assert np.abs(cs.intor_ovlp() - cf.intor_ovlp()).max() < 1e-14
    assert np.abs(cs.intor_kin() - cf.intor_kin()).max() < 1e-14
    assert np.abs(cs.intor_nuc() - cf.intor_nuc()).max() < 1e-13
    assert np.abs(cs.intor_eri() - cf.intor_eri()).max() < 1e-13
