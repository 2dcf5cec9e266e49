"""
End-to-end DMET: 2D Hubbard 40x40, 2x2 impurity, half filling,
spin-unrestricted (AFM) mean field, FCI solver.

Reference energies (same configs, libdmet integration tests):
  non-interacting bath, U/t=6: E/site = -0.652114179764
      (/root/reference/libdmet/test/test_hub2d_nib.py:121)
  interacting bath,     U/t=2: E/site = -1.179836342898
      (/root/reference/libdmet/test/test_hub2d_ib.py:133)
"""

import numpy as np
import pytest


def run_hub2d(U, int_bath, max_iter=20, solver=None):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS, FDiisContext

    LatSize = (40, 40)
    ImpSize = (2, 2)
    Filling = 0.5
    Mu = U * Filling
    last_dmu = 0.0
    DiisStart = 4
    TraceStart = 3
    DiisDim = 4
    adiis = DIIS(space=DiisDim)
    dc = FDiisContext(DiisDim)

    Lat = dmet.SquareLattice(*LatSize, *ImpSize)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.AFInitGuess(ImpSize, U, Filling)

    if solver is None:
        solver = FCI(restricted=False, tol=1e-10)
    mu_solver = dmet.MuSolver(adaptive=True)

    E_old = 0.0
    conv = False
    EnergyImp = None
    for it in range(max_iter):
        rho, Mu, res = dmet.HartreeFock(Lat, vcor, Filling, Mu, ires=True)
        if int_bath:
            Lat.update_Ham(rho)

        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=int_bath)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)

        solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, Filling, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=int_bath, solver=solver,
            solver_args=solver_args)

        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     Filling, MaxIter2=0)
        if it >= TraceStart:
            ddiagV = np.average(np.diagonal(
                (vcor_new.get() - vcor.get())[:2], 0, 1, 2))
            vcor_new = dmet.addDiag(vcor_new, -ddiagV)

        if it >= DiisStart:
            pvcor = adiis.update(np.hstack(vcor_new.param))
        else:
            pvcor = np.hstack(vcor_new.param)

        dVcor_per_ele = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
        vcor.update(pvcor)
        dE = EnergyImp - E_old
        E_old = EnergyImp
        if dVcor_per_ele < 1e-5 and abs(dE) < 1e-5 and it > 3:
            conv = True
            break
    return EnergyImp, conv


def test_hub2d_nib():
    E, conv = run_hub2d(U=6.0, int_bath=False)
    assert abs(E - (-0.652114179764)) < 1e-4


def test_hub2d_ib():
    E, conv = run_hub2d(U=2.0, int_bath=True)
    assert abs(E - (-1.179836342898)) < 1e-4


def test_hub2d_nib_matching():
    """Same 2D NIB run with alpha/beta bath MATCHING enabled (the
    reference's default ConstructImpHam path, HubPhSymm.basisMatching):
    must reach the same converged energy."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS, FDiisContext

    U, LatSize, ImpSize, Filling = 6.0, (40, 40), (2, 2), 0.5
    Mu, last_dmu = U * Filling, 0.0
    adiis = DIIS(space=4)
    dc = FDiisContext(4)
    Lat = dmet.SquareLattice(*LatSize, *ImpSize)
    Lat.set_Ham(dmet.Ham(Lat, U), use_hcore_as_emb_ham=True)
    vcor = dmet.AFInitGuess(ImpSize, U, Filling)
    solver = FCI(restricted=False, tol=1e-10)
    mu_solver = dmet.MuSolver(adaptive=True)
    E_old, conv, EnergyImp = 0.0, False, None
    from libdmet_preview_tpu.dmet.hubbard import IterHistory
    history = IterHistory()
    for it in range(20):
        rho, Mu, res = dmet.HartreeFock(Lat, vcor, Filling, Mu, ires=True)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=True,
                                                  int_bath=False)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
        solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, Filling, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=False, solver=solver,
            solver_args=solver_args)
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     Filling, MaxIter2=0)
        if it >= 3:
            ddiagV = np.average(np.diagonal(
                (vcor_new.get() - vcor.get())[:2], 0, 1, 2))
            vcor_new = dmet.addDiag(vcor_new, -ddiagV)
        pvcor = adiis.update(np.hstack(vcor_new.param)) if it >= 4 \
            else np.hstack(vcor_new.param)
        dV = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
        vcor.update(pvcor)
        dE = EnergyImp - E_old
        history.update(EnergyImp, err, nelecImp, dV, dc)
        E_old = EnergyImp
        if dV < 1e-5 and abs(dE) < 1e-5 and it > 3:
            conv = True
            break
    assert conv
    assert abs(EnergyImp - (-0.652114179764)) < 1e-4


def test_hub2d_nib_uccsd():
    """Second NIB anchor (reference test_hub2d_nib.py:248): the same
    40x40 U=6 half-filled workload solved with UCCSD instead of FCI,
    E/site = -0.650255236756."""
    from libdmet_preview_tpu.solvers import CCSD
    solver = CCSD(restricted=False, tol=1e-9)
    E, conv = run_hub2d(U=6.0, int_bath=False, solver=solver)
    assert abs(E - (-0.650255236756)) < 1e-4


def test_hub2d_ib_fock():
    """Fock-embedding IB anchor (reference test_hub2d_ib.py:140-272
    test_hub2d_ib_fock): 6x6 U=8 half filling, 2x2 impurity, interacting
    bath built on the UPDATED FOCK (use_hcore_as_emb_ham=False, charge
    self-consistent), beta=1000, UHF-FCI, FULL-lattice-only vcor fit
    (MaxIter1=0) with impurity-block residual; E/site = -0.51685 at
    1e-4.  Drives the gradient-based finite-beta FitVcorFull (global-mu
    zrho_fermi program)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import mfd
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS

    U, beta = 8.0, 1000.0
    LatSize, ImpSize, Filling = (6, 6), (2, 2), 0.5
    Mu, last_dmu = U * Filling, 0.0
    Lat = dmet.SquareLattice(*LatSize, *ImpSize)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=False)
    nsc = Lat.nscsites
    vcor = dmet.VcorLocal(False, False, nsc)
    vcor.update(np.zeros(vcor.length()))

    # AFM-seeded self-consistent UHF, then lock the Fock (reference
    # HartreeFock(scf=True, dm0=AFM) + update_Ham)
    rho_seed = np.zeros((2, Lat.ncells, nsc, nsc))
    rho_seed[0, 0] = np.diag([1.0, 0.0, 0.0, 1.0])
    rho_seed[1, 0] = np.diag([0.0, 1.0, 1.0, 0.0])
    Lat.update_Ham(rho_seed)
    rho, Mu, E, res = mfd.HF_scf(Lat, vcor, Filling, False, beta=beta,
                                 ires=True)
    Lat.update_Ham(rho)

    solver = FCI(restricted=False, tol=1e-10)
    mu_solver = dmet.MuSolver(adaptive=True)
    adiis = DIIS(space=4)
    E_old, conv, EnergyImp = 0.0, False, None
    for it in range(50):
        rho, Mu, res = dmet.HartreeFock(Lat, vcor, Filling, Mu,
                                        beta=beta, ires=True)
        Lat.update_Ham(rho)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=True)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
        solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, Filling, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, beta,
                                     Filling, MaxIter1=0, MaxIter2=300,
                                     imp_fit=True, BFGS=True)
        if it >= 4:
            pvcor = adiis.update(np.hstack(vcor_new.param))
        else:
            pvcor = np.hstack(vcor_new.param)
        dVcor = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
        vcor.update(pvcor)
        dE = EnergyImp - E_old
        E_old = EnergyImp
        if dVcor < 1e-5 and abs(dE) < 1e-6 and it > 3:
            conv = True
            break
    assert abs(EnergyImp - (-0.51685)) < 1e-4
