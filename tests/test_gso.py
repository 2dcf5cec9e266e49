"""
GSO / spinless formalism tests (reference analog:
libdmet/test/test_spinless_model.py).

Oracles:
  * particle-hole transform exactness: FCI of the transformed spinless
    Hamiltonian at fixed transformed particle number == FCI of the
    physical Hamiltonian with -mu*N, up to the transform constants.
  * one-shot GSO-DMET == one-shot spin-unrestricted DMET (zero pairing),
    the same check the reference asserts at test_spinless_model.py:117.
"""

import os

import numpy as np
import pytest


def test_ph_transform_exact():
    """Molecular (single cell) 4-site Hubbard ring at half filling."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops import spinless

    nao, U = 4, 3.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    mu = U / 2.0  # ph-symmetric point: half filling is gapped in mu

    # physical FCI at half filling
    Ham = Integral(nao, True, False, 0.0, {"cd": h[None]}, {"ccdd": g[None]})
    _, E_phys = FCI(restricted=True, tol=1e-12).run(Ham, nelec=nao)
    E_grand = E_phys - mu * nao

    # transformed spinless FCI at N_T = nao
    GH1_c, GH0 = spinless.transform_H1_k(((h[None]), (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(mu, nao)
    eye_basis = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye_basis[:, :nao, :],
                                            eye_basis[:, nao:, :], GV2)
    H0 = GH0 + GV0 - mu * nao
    GHam = Integral(nso, True, False, H0, {"cd": H1_so[None]},
                    {"ccdd": g_so[None]})
    _, E_T = FCI(restricted=True, ghf=True, tol=1e-12).run(GHam, nelec=nao)
    assert abs(E_T - E_grand) < 1e-9


def afm_vcor(nao_imp, m):
    """Fixed AFM staggered potential [va, vb] (gapped at half filling)."""
    stag = np.diag([(-1.0) ** i for i in range(nao_imp)])
    return np.asarray([m * stag, -m * stag])


def run_uhf_dmet_1shot(L, nao_imp, U, filling, m=0.0):
    """One-shot spin-unrestricted DMET (NIB, FCI), fixed vcor."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI

    Lat = dmet.ChainLattice(L, nao_imp)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.VcorLocal(False, False, nao_imp)
    vcor.assign(afm_vcor(nao_imp, m))

    rho, Mu, res = dmet.HartreeFock(Lat, vcor, filling, U * filling,
                                    ires=True)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False, int_bath=False)
    solver = FCI(restricted=False, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    # large dmu needed away from half filling: iterate the mu fit,
    # accumulating last_dmu (as the DMET loop does across iterations)
    last_dmu = 0.0
    for _ in range(12):
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args, step=0.4)
        last_dmu += dmu
        _, _, nelecImp = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=False, solver=solver,
            solver_args=solver_args)
        if abs(nelecImp - 2 * filling) < 1e-6:
            break
    rhoImp, EnergyImp, nelecImp = dmet.transformResults(
        rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
        last_dmu=last_dmu, int_bath=False, solver=solver,
        solver_args=solver_args)
    return EnergyImp, nelecImp


def run_gso_dmet_1shot(L, nao_imp, U, filling, m=0.0):
    from libdmet_preview_tpu.dmet import hubbard_gso as dmet
    from libdmet_preview_tpu.ops import spinless
    from libdmet_preview_tpu.solvers import FCI

    Lat = dmet.ChainLattice(L, nao_imp)
    Ham = dmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    gham = dmet.GSOHam(Lat)
    va, vb = afm_vcor(nao_imp, m)
    vmat = spinless.combine_vcor([va, vb, np.zeros_like(va)])
    GRho, mu, res = dmet.GHartreeFock(gham, filling, mu0=U * filling,
                                      vcor_mat=vmat)
    ImpHam, _, basis = dmet.ConstructImpHam(gham, GRho, mu, vcor_mat=vmat)
    solver = FCI(restricted=True, ghf=True, tol=1e-12)
    rdm, E_emb, ImpHam_d, dmu = dmet.SolveImpHam_with_fitting(
        gham, filling, ImpHam, basis, solver, thrnelec=1e-7)
    GRhoImp, Efrag, n = dmet.transformResults(rdm, E_emb, basis, ImpHam_d,
                                              gham, mu, last_dmu=dmu)
    return Efrag, n


def test_gso_1shot_equals_uhf():
    # half filling + fixed AFM vcor: gapped, frames agree (the condition
    # under which the reference asserts GSO == UHF,
    # test_spinless_model.py:117)
    L, nimp, U, filling, m = 12, 2, 4.0, 0.5, 0.5
    E_uhf, n_uhf = run_uhf_dmet_1shot(L, nimp, U, filling, m=m)
    E_gso, n_gso = run_gso_dmet_1shot(L, nimp, U, filling, m=m)
    assert abs(n_uhf - 2 * filling) < 1e-5
    assert abs(n_gso - 2 * filling) < 1e-5
    assert abs(E_gso - E_uhf) < 1e-6


def test_gso_bath_scdm_invariance():
    """SCDM bath localization is a unitary rotation of the bath block:
    the embedding SPACE (projector) is unchanged (reference
    embBasis(localize_bath='scdm') option)."""
    from libdmet_preview_tpu.dmet import hubbard_gso as dmet
    from libdmet_preview_tpu.ops import spinless
    Lat = dmet.ChainLattice(12, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    gham = dmet.GSOHam(Lat)
    GRho, mu, res = dmet.GHartreeFock(gham, 0.5, mu0=2.0)
    b0 = spinless.get_emb_basis(Lat, GRho)
    b1 = spinless.get_emb_basis(Lat, GRho, localize_bath="scdm")
    B0 = b0.reshape(-1, b0.shape[-1])
    B1 = b1.reshape(-1, b1.shape[-1])
    # orthonormal and same span
    assert np.max(np.abs(B1.T @ B1 - np.eye(B1.shape[1]))) < 1e-9
    assert np.max(np.abs(B0 @ B0.T - B1 @ B1.T)) < 1e-9
    # bath got more local: SCDM should not decrease the max column weight
    w0 = np.max(np.abs(b0[0, :, :, b0.shape[-1] // 2:]))
    w1 = np.max(np.abs(b1[0, :, :, b1.shape[-1] // 2:]))
    assert w1 > w0 - 1e-9


def test_ph_transform_exact_abinitio():
    """Particle-hole transform with FULL molecular ERIs (H4 ring,
    sto-6g, Lowdin LOs): transformed spinless FCI at fixed N_T equals
    the physical FCI of H - mu*N.  Validates the ab initio GSO
    ingredients: transform_H2_local on a dense ERI and the
    (La - Lb)-syrk embedding kernel at identity basis."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.ops import spinless
    from libdmet_preview_tpu.ops.eri_transform import (cholesky_eri,
                                                       get_emb_eri_gso_chol)
    from libdmet_preview_tpu.ints.gto import Mole, h_ring
    from libdmet_preview_tpu.models.abinitio import lowdin

    mol = Mole(h_ring(4, 1.8), basis="sto-6g")
    nao = mol.nao
    S, hcore, eri = mol.intor_ovlp(), mol.intor_hcore(), mol.intor_eri()
    C = lowdin(S)
    h = C.T @ hcore @ C
    g = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", eri, C, C, C, C,
                  optimize=True)
    mu = 0.0   # half filling of the H ring sits around mu ~ 0 in LO basis

    Ham = Integral(nao, True, False, 0.0, {"cd": h[None]}, {"ccdd": g[None]})
    _, E_phys = FCI(restricted=True, tol=1e-12).run(Ham, nelec=nao)
    E_grand = E_phys - mu * nao

    GH1_c, GH0 = spinless.transform_H1_k((h[None], np.zeros_like(h)[None]))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(mu, nao)
    # GSO two-body via the Cholesky (La - Lb) syrk at the identity basis
    L = cholesky_eri(g, tol=1e-12)
    eye_basis = np.eye(nso).reshape(1, 1, nso, nso)
    g_so = get_emb_eri_gso_chol(L, eye_basis)
    # one-body consistency of the factorized route vs transform_H2_local:
    # both must produce the same spinless interaction
    g_ref = spinless.transform_eri_local_gso(eye_basis[0, :, :nao, :],
                                             eye_basis[0, :, nao:, :], GV2)
    assert np.max(np.abs(g_so - g_ref)) < 1e-8
    H0 = GH0 + GV0 - mu * nao
    GHam = Integral(nso, True, False, H0, {"cd": H1_so[None]},
                    {"ccdd": g_so[None]})
    _, E_T = FCI(restricted=True, ghf=True, tol=1e-12).run(GHam, nelec=nao)
    assert abs(E_T - E_grand) < 1e-8


def test_gso_rho_glob_hf_limit():
    """Democratic global GSO density == mean-field GRho in the HF limit
    (spinless analog of the reference get_rho_glob_R oracle,
    spinless_helper.py:442)."""
    from libdmet_preview_tpu.dmet import hubbard_gso as dmet
    from libdmet_preview_tpu.ops import spinless, embham
    Lat = dmet.ChainLattice(12, 2)
    Ham = dmet.Ham(Lat, 0.0)      # U = 0: embedded state == mean field
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    gham = dmet.GSOHam(Lat)
    GRho, mu, res = dmet.GHartreeFock(gham, 0.25, mu0=-1.4)
    basis = spinless.get_emb_basis(Lat, GRho)
    # fold the k-space GRho into the embedding (HF-limit embedded rdm)
    basis_k = Lat.R2k_basis(basis)
    GRho_emb = np.asarray(embham.foldRho_k(res["rho_k"], basis_k))
    rho_glob = embham.get_rho_glob_R(basis, Lat, GRho_emb)
    assert np.max(np.abs(rho_glob[0] - GRho)) < 1e-8


def test_musolver_save_load(tmp_path):
    """MuSolver history pickle round trip (reference frecord pattern,
    Hubbard.py:308-321)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    ms = dmet.MuSolver(adaptive=True)
    ms.history = [[(0.0, 0.9), (0.05, 0.95)], [(0.0, 0.98), (0.02, 1.0)]]
    path = str(tmp_path / "frecord")
    ms.save(path)
    ms2 = dmet.MuSolver(adaptive=True)
    ms2.load(path)
    assert ms2.history == ms.history
    pred = ms2.predict(0.97, 1.0)
    assert pred is not None and 0.0 < pred < 0.5


def test_gso_abinitio_1shot_equals_slater_nib():
    """Ab initio GSO-DMET (cholesky lattice, zero pairing) == restricted
    Slater NIB DMET on the same H-ring system: the reference's cuprate
    GSO workflow exactness check (eri_transform.get_emb_eri_gso +
    HubbardGSO on ab initio lattices), with both paths driven from the
    hcore mean field (gapped, vcor = 0)."""
    import libdmet_preview_tpu.dmet.hubbard as sdmet
    from libdmet_preview_tpu.dmet import hubbard_gso as gdmet
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    from libdmet_preview_tpu.solvers import FCI

    def build():
        Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                        r_bond=1.8, basis="sto-6g")
        Lat.use_hcore_as_emb_ham = True
        return Lat, meta

    # --- Slater NIB reference ---
    Lat, meta = build()
    nlo = meta["nlo"]
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    vcor = sdmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    rho, Mu = sdmet.RHartreeFock(Lat, vcor, filling, None)
    ImpHam, H1e, basis = sdmet.ConstructImpHam(Lat, rho, vcor,
                                               matching=False,
                                               int_bath=False)
    solver = FCI(restricted=True, tol=1e-12)
    mu_solver = sdmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    last_dmu = 0.0
    for _ in range(30):
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args, step=0.4)
        last_dmu += dmu
        _, _, nelecImp = sdmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=False, solver=solver,
            solver_args=solver_args)
        if abs(nelecImp - 2 * filling) < 1e-8:
            break
    _, E_sl, n_sl = sdmet.transformResults(
        rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
        last_dmu=last_dmu, int_bath=False, solver=solver,
        solver_args=solver_args)

    # --- GSO path on the same lattice ---
    Lat2, _ = build()
    gham = gdmet.GSOHam(Lat2, use_hcore=True)
    GRho, mu, res = gdmet.GHartreeFock(gham, filling, mu0=0.0)
    gImpHam, _, gbasis = gdmet.ConstructImpHam(gham, GRho, mu)
    gsolver = FCI(restricted=True, ghf=True, tol=1e-12)
    rdm, E_emb, gImpHam_d, gdmu = gdmet.SolveImpHam_with_fitting(
        gham, filling, gImpHam, gbasis, gsolver, thrnelec=1e-8)
    _, E_gso, n_gso = gdmet.transformResults(rdm, E_emb, gbasis,
                                             gImpHam_d, gham, mu,
                                             last_dmu=gdmu)
    assert abs(n_sl - 2 * filling) < 5e-6
    assert abs(n_gso - 2 * filling) < 5e-6
    assert abs(E_gso - E_sl) < 1e-5


def test_gks_gso_mean_field():
    """Generalized KS in the GSO frame (reference kgks role): with no
    functional it reduces exactly to GHF_mu_fit; with a density-dependent
    local potential it converges self-consistently, holds the physical
    filling, and responds to the functional (state changes)."""
    from libdmet_preview_tpu.dmet import hubbard_gso as dmet
    from libdmet_preview_tpu.ops import spinless
    Lat = dmet.ChainLattice(12, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    gham = dmet.GSOHam(Lat)
    GH1 = (gham.GH1_k[0], gham.GH1_k[1])
    nao = Lat.nscsites

    G0, mu0, _ = spinless.GHF_mu_fit(Lat, GH1,
                                     np.zeros((2 * nao, 2 * nao)), 0.4,
                                     mu0=0.0, beta=50.0)
    G1, mu1, r1 = spinless.GKS_mu_fit(Lat, GH1, 0.4, None, mu0=0.0,
                                      beta=50.0)
    assert np.abs(np.asarray(G1) - np.asarray(G0)).max() < 1e-12

    # a Hartree-like local functional with a staggered coupling (a
    # uniform shift would be absorbed by the mu fit): v_s = u*stag*n_{-s}
    u = 0.5
    stag = np.diag([1.0, -1.0])

    def xc_eval(rA, rB):
        return (u * stag * np.diag(np.diag(rB)),
                u * stag * np.diag(np.diag(rA)))

    # finite T smooths the fractional frontier occupations (the
    # self-consistency is discontinuous at T = 0 degeneracies)
    G2, mu2, r2 = spinless.GKS_mu_fit(Lat, GH1, 0.4, xc_eval, mu0=0.0,
                                      conv_tol=1e-9, mix=0.4,
                                      max_cycle=200, beta=50.0)
    assert r2["dGRho"] < 1e-9
    rA, rB, _ = spinless.extract_rdm(np.asarray(G2)[0])
    n_phys = np.trace(rA) + np.trace(rB)
    assert abs(n_phys - 0.4 * 2 * nao) < 1e-6
    assert np.abs(np.asarray(G2) - np.asarray(G0)).max() > 1e-3

def test_gso_abinitio_int_bath_equals_slater_ib():
    """INTERACTING-BATH ab initio GSO-DMET == restricted Slater IB DMET
    on the same H-ring (reference test_gso_hchain_int_bath.py:16-25: the
    GSO impurity rdm must match the RHF-frame result; the reference
    asserts the rdm at 1e-5 and never the energy).  Additionally asserts
    the STRONGER internal oracle that the democratically-scaled GSO
    energy functional (spinless.get_H_dmet_ib) evaluated on the
    mean-field embedded determinant reproduces the lattice HF energy per
    cell EXACTLY -- the defining interacting-bath identity."""
    import libdmet_preview_tpu.dmet.hubbard as sdmet
    from libdmet_preview_tpu.dmet import hubbard_gso as gdmet
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    from libdmet_preview_tpu.ops import spinless, embham
    from libdmet_preview_tpu.solvers import FCI

    def build():
        return make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                   r_bond=1.8, basis="sto-6g")

    # --- Slater IB FCI reference ---
    Lat, meta = build()
    nlo = meta["nlo"]
    ncells = Lat.ncells
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    vcor = sdmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    rho, Mu, res = sdmet.RHartreeFock(Lat, vcor, filling, None, ires=True)
    ImpHam, H1e, basis = sdmet.ConstructImpHam(Lat, rho, vcor,
                                               matching=False,
                                               int_bath=True)
    solver = FCI(restricted=True, tol=1e-12)
    mu_solver = sdmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    last_dmu = 0.0
    for _ in range(30):
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args, step=0.4)
        last_dmu += dmu
        _, _, nelecImp = sdmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        if abs(nelecImp - 2 * filling) < 1e-8:
            break
    rhoImp_sl, E_sl, n_sl = sdmet.transformResults(
        rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
        last_dmu=last_dmu, int_bath=True, solver=solver,
        solver_args=solver_args)

    # --- GSO IB path ---
    Lat2, _ = build()
    gham = gdmet.GSOHam(Lat2, int_bath=True)
    GRho, mu, gres = gdmet.GHartreeFock(gham, filling, mu0=0.0)
    gImpHam, _, gbasis = gdmet.ConstructImpHam(gham, GRho, mu,
                                               GRho_k=gres["rho_k"])

    # interacting-bath HF identity: scaled functional on the mean-field
    # embedded determinant == lattice HF per cell (machine precision)
    basis_k = Lat2.R2k_basis(gbasis)
    G_mf = np.asarray(embham.foldRho_k(gres["rho_k"], basis_k))
    if G_mf.ndim == 3:
        G_mf = G_mf[0]
    H0 = float(Lat2.getH0()) + gham.GH0 + gham.GV0
    Ham_s = spinless.get_H_dmet_ib(Lat2, gbasis, gham.GH1_full_k,
                                   gham.JK_core, gImpHam, H0)
    h1s = np.asarray(Ham_s.H1["cd"][0])
    gs = np.asarray(Ham_s.H2["ccdd"][0])
    E_mf = (np.einsum("pq, qp", h1s, G_mf)
            + 0.5 * (np.einsum("pqrs, qp, sr", gs, G_mf, G_mf)
                     - np.einsum("pqrs, sp, qr", gs, G_mf, G_mf)) + H0)
    assert abs(E_mf - meta["E_hf"] / ncells) < 1e-10

    # embedded FCI + dmu fit; rdm and energy vs the Slater IB result
    gsolver = FCI(restricted=True, ghf=True, tol=1e-12)
    rdm, E_emb, gImpHam_d, gdmu = gdmet.SolveImpHam_with_fitting(
        gham, filling, gImpHam, gbasis, gsolver, thrnelec=1e-8)
    GRhoImp, E_gso, n_gso = gdmet.transformResults(
        rdm, E_emb, gbasis, gImpHam_d, gham, mu, last_dmu=gdmu,
        solver=gsolver)
    rho_A, rho_B, _ = spinless.extract_rdm(GRhoImp)
    rhoImp_phys = np.asarray(rhoImp_sl)[0] * 2.0     # spin-traced
    assert np.max(np.abs(rho_A + rho_B - rhoImp_phys)) < 5e-6
    assert abs(n_gso - 2 * filling) < 1e-6
    assert abs(E_gso - E_sl) < 1e-4


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="~10 min doped GSO loop; set RUN_SLOW=1")
def test_spinless_doped_anchor():
    """DOPED spinless DMET anchor (reference test_spinless_model.py:321
    test_spinless_fci_08): 60x60 U=6 square lattice, 2x2 impurity,
    filling 0.4, non-interacting bath, GHF-FCI, AFM+random-pairing init,
    beta=1000 mean field, SCDM bath localization, mu-absorbable trace
    fix; E/site = -1.001725641814 at 2e-4.  Exercises the physical-mu
    fit and the dmu secant away from half filling in the GSO frame."""
    import libdmet_preview_tpu.dmet.hubbard as sdmet
    from libdmet_preview_tpu.dmet.loop import run_dmet_sc
    from libdmet_preview_tpu.solvers import FCI

    U, filling = 6.0, 0.4
    Lat = sdmet.SquareLattice(60, 60, 2, 2)
    Ham = sdmet.Ham(Lat, U)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = sdmet.AFInitGuess((2, 2), U, filling, rand=0.001,
                             bogoliubov=True, bogo_res=True)
    solver = FCI(restricted=True, ghf=True, tol=1e-10)
    res = run_dmet_sc(Lat, vcor, filling, solver=solver, max_iter=30,
                      mu0=U * filling, thrnelec=1e-6, beta=1000.0,
                      localize_bath="scdm", trace_start=3,
                      conv_tol_vcor=5e-5)
    assert abs(res.nelec_imp - 2 * filling) < 1e-4
    assert abs(res.e_per_site - (-1.001725641814)) < 2e-4


def test_gso_ccsd_ghf_mode():
    """GSO-frame CC solvers (reference gccsd/gccd/gmp2 roles):
    CCSD(ghf=True) on the ph-transformed 2-site Hubbard dimer (a
    2-particle problem, where CCSD is exact) reproduces the spinless FCI
    energy and FULL spin-orbital rdm1, and run_dmet_ham is
    RDM-consistent; MP2(ghf=True) is variationally sane."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, CCSD, MP2
    from libdmet_preview_tpu.ops import spinless

    nao, U = 2, 3.0
    h = np.zeros((nao, nao))
    h[0, 1] = h[1, 0] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    GH1_c, GH0 = spinless.transform_H1_k(((h[None]),
                                          (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(U / 2.0, nao)
    eye = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye[:, :nao, :],
                                            eye[:, nao:, :], GV2)
    GHam = Integral(nso, True, False, GH0 + GV0 - U / 2.0 * nao,
                    {"cd": H1_so[None]}, {"ccdd": g_so[None]})

    rdm_f, E_f = FCI(restricted=True, ghf=True, tol=1e-12).run(
        GHam, nelec=nao)
    cc = CCSD(ghf=True, tol=1e-11)
    rdm_c, E_c = cc.run(GHam, nelec=nao)
    assert abs(E_c - E_f) < 1e-9
    assert rdm_c.shape == (1, nso, nso)
    assert abs(np.trace(rdm_c[0]) - nao) < 1e-9
    assert np.abs(np.asarray(rdm_c)[0] - np.asarray(rdm_f)[0]).max() < 1e-7
    assert abs(cc.run_dmet_ham(GHam) - E_f) < 1e-8

    mp = MP2(ghf=True, tol=1e-11)
    _, E_mp = mp.run(GHam, nelec=nao)
    assert E_mp > E_f - 1e-10      # not below exact
    assert E_mp < 0.0
