"""
End-to-end DMET: 1D Hubbard chain, 18 sites, U/t = 4, half filling,
2-site impurity, FCI solver.

Reference energies (same configs, libdmet integration tests):
  non-interacting bath: E/site = -0.552733945102
      (/root/reference/libdmet/test/test_hub1d_nib.py:121)
  interacting bath:     E/site = -0.572957334871
      (/root/reference/libdmet/test/test_hub1d_ib.py:125)
"""

import numpy as np
import pytest


def run_hub1d(int_bath, max_iter=20):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS, FDiisContext

    U = 4.0
    LatSize = 18
    ImpSize = 2
    Filling = 0.5
    Mu = U * Filling
    last_dmu = 0.0
    DiisStart = 4
    TraceStart = 3
    DiisDim = 4
    adiis = DIIS(space=DiisDim)
    dc = FDiisContext(DiisDim)

    Lat = dmet.ChainLattice(LatSize, ImpSize)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess(ImpSize, U, Filling)
    nscsites = Lat.nscsites

    solver = FCI(restricted=True, tol=1e-11)
    mu_solver = dmet.MuSolver(adaptive=True)

    E_old = 0.0
    conv = False
    EnergyImp = None
    for it in range(max_iter):
        rho, Mu, res = dmet.RHartreeFock(Lat, vcor, Filling, Mu, ires=True)
        if int_bath:
            Lat.update_Ham(rho * 2.0)

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


def test_hub1d_nib():
    E, conv = run_hub1d(int_bath=False)
    assert abs(E - (-0.552733945102)) < 1e-4


def test_hub1d_ib():
    E, conv = run_hub1d(int_bath=True)
    assert abs(E - (-0.572957334871)) < 1e-4


def test_hub1d_finite_T():
    """Finite-temperature DMET: same loop at beta = 50 converges and lands
    near the zero-T energy (smooth occupations; reference ftsystem-based
    finite-beta fit path)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops.diis import DIIS

    U, LatSize, ImpSize, Filling, beta = 4.0, 18, 2, 0.5, 50.0
    Mu = U * Filling
    adiis = DIIS(space=4)
    Lat = dmet.ChainLattice(LatSize, ImpSize)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess(ImpSize, U, Filling)
    solver = FCI(restricted=True, tol=1e-11)
    mu_solver = dmet.MuSolver(adaptive=True)
    E_old, conv, EnergyImp = 0.0, False, None
    last_dmu = 0.0
    for it in range(20):
        rho, Mu, res = dmet.RHartreeFock(Lat, vcor, Filling, Mu, beta=beta,
                                         ires=True)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
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
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, beta,
                                     Filling, MaxIter2=0)
        if it >= 3:
            ddiagV = np.average(np.diagonal(
                (vcor_new.get() - vcor.get())[:2], 0, 1, 2))
            vcor_new = dmet.addDiag(vcor_new, -ddiagV)
        if it >= 4:
            pvcor = adiis.update(np.hstack(vcor_new.param))
        else:
            pvcor = np.hstack(vcor_new.param)
        dV = np.linalg.norm(pvcor - vcor.param) / len(vcor.param)
        vcor.update(pvcor)
        dE = EnergyImp - E_old
        E_old = EnergyImp
        if dV < 1e-5 and abs(dE) < 1e-5 and it > 3:
            conv = True
            break
    assert conv
    # beta = 50 at U/t = 4: close to the T = 0 result
    assert abs(EnergyImp - (-0.552733945102)) < 2e-2


def test_run_dmet_driver():
    """One-call driver (dmet.loop.run_dmet): reproduces the hand-written
    NIB loop's reference energy on the 1D Hubbard chain."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.dmet.loop import run_dmet
    from libdmet_preview_tpu.utils.config import DmetConfig

    Lat = dmet.ChainLattice(18, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess([2], 4.0, 0.5)
    cfg = DmetConfig(filling=0.5, restricted=False, int_bath=False,
                     solver="FCI", max_iter=20)
    res = run_dmet(Lat, vcor, cfg)
    assert res.converged
    assert abs(res.e_per_site - (-0.552733945102)) < 1e-4
    assert abs(res.nelec_imp - 1.0) < 1e-4
    assert len(res.history) >= 4
