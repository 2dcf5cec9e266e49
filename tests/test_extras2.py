"""
add_bath, VcorSymmBogo, MO matching, get_symm_orb, projected Wannier,
cvx_frac (reference slater.py:2278, Hubbard.py:1233, make_basis.py:990,
analyze.py:539, pywannier90/proj_wannier, fit.py:362).
"""

import numpy as np
import pytest


def _chain(nc=12, nimp=2, u=4.0):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.hamiltonian import HubbardHamiltonian
    Lat = dmet.ChainLattice(nc * nimp, nimp)
    Ham = HubbardHamiltonian(Lat, u)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    return Lat


def test_add_bath_enlarges_and_stays_orthonormal():
    from libdmet_preview_tpu.ops import mfd, embham
    Lat = _chain()
    import libdmet_preview_tpu.dmet.hubbard as dmet
    vcor = dmet.VcorLocal(True, False, Lat.nscsites)
    vcor.update(np.zeros(vcor.length()))
    rho, mu = dmet.RHartreeFock(Lat, vcor, 0.5, 0.0)
    basis = embham.get_emb_basis(Lat, np.asarray(rho))
    neo0 = basis.shape[-1]

    # complex band structure for the frontier window (host side)
    (h_re, h_im) = Lat.getH1(kspace=True)
    h = np.asarray(h_re) + 1j * np.asarray(h_im)
    ew, ev = np.linalg.eigh(h)
    nocc = ew.size // 2   # half filling

    big = embham.add_bath(Lat, basis, ew, ev, nocc, nfrac=2)
    neo1 = big.shape[-1]
    assert neo0 < neo1 <= neo0 + 4
    # original columns untouched; all columns orthonormal
    B = big[0].reshape(-1, neo1)
    assert np.allclose(B[:, :neo0], basis[0].reshape(-1, neo0))
    assert np.allclose(B.T @ B, np.eye(neo1), atol=1e-8)


def test_vcor_symm_bogo():
    from libdmet_preview_tpu.ops.vcor import VcorSymmBogo, VcorLocal
    rot = [1, 3, 0, 2]
    mir = [1, 0, 3, 2]
    v = VcorSymmBogo(False, 4, [rot, mir])
    rng = np.random.RandomState(0)
    v.update(rng.randn(v.length()))
    M = np.asarray(v.evaluate())
    assert M.shape == (3, 4, 4)
    P = np.eye(4)[rot]
    for s in range(3):
        assert np.allclose(P @ M[s] @ P.T, M[s])
    assert np.allclose(M[2], M[2].T)
    assert v.length() < VcorLocal(False, True, 4).length()
    # gradient tensor matches evaluate linearity
    g = np.asarray(v.gradient())
    p = rng.randn(v.length())
    v.update(p)
    assert np.allclose(np.einsum("p, psij -> sij", p, g), v.evaluate())


def test_mo_matching():
    from libdmet_preview_tpu.lo.mo_match import (find_closest_mo,
                                                 get_mo_ovlp, trans_mo)
    rng = np.random.RandomState(5)
    mo_ref = np.linalg.qr(rng.randn(8, 5))[0]
    U = np.linalg.qr(rng.randn(5, 5))[0]
    mo_new = mo_ref @ U
    mo_rot, u = find_closest_mo(mo_new, mo_ref, return_rotmat=True)
    assert np.allclose(mo_rot, mo_ref, atol=1e-9)
    assert np.allclose(trans_mo(mo_new, u), mo_rot)
    S = get_mo_ovlp(mo_rot, mo_ref)
    assert np.allclose(S, np.eye(5), atol=1e-9)
    # with a metric
    A = rng.randn(8, 8)
    ovlp = A @ A.T + 8 * np.eye(8)
    L = np.linalg.cholesky(ovlp)
    mo_ref2 = np.linalg.qr(rng.randn(8, 3))[0]
    mo_ref2 = np.linalg.solve(L.T, mo_ref2)   # S-orthonormal
    mo_new2 = mo_ref2 @ np.linalg.qr(rng.randn(3, 3))[0]
    mo_rot2 = find_closest_mo(mo_new2, mo_ref2, ovlp=ovlp)
    assert np.allclose(mo_rot2, mo_ref2, atol=1e-8)


def test_get_symm_orb_c4v():
    from libdmet_preview_tpu.utils.analysis import get_symm_orb
    blocks = get_symm_orb([[1, 2, 3, 0], [1, 0, 3, 2]])
    P = np.eye(4)[[1, 2, 3, 0]]
    tot = 0
    for B in blocks:
        tot += B.shape[1]
        proj = B @ B.T
        assert np.allclose(P @ proj @ P.T, proj, atol=1e-8)
        assert np.allclose(B.T @ B, np.eye(B.shape[1]), atol=1e-10)
    assert tot == 4


def test_proj_wannier_isolated_band():
    """Two-orbital gapped chain: projecting the guess onto the lowest band
    reproduces the band projector exactly."""
    from libdmet_preview_tpu.lo.wannier import (proj_wannier,
                                                get_C_ao_lo_wannier)
    nk = 8
    ks = 2 * np.pi * np.fft.fftfreq(nk)
    C_mo = np.empty((nk, 2, 2), dtype=complex)
    for i, k in enumerate(ks):
        hk = np.array([[-2.0, 1.0 + 0.4 * np.exp(-1j * k)],
                       [1.0 + 0.4 * np.exp(1j * k), 2.0]])
        _, v = np.linalg.eigh(hk)
        C_mo[i] = v
    guess = np.array([[1.0], [0.0]])
    C_lo = proj_wannier(C_mo, guess, band_idx=[0])
    for i in range(nk):
        band = np.outer(C_mo[i][:, 0], C_mo[i][:, 0].conj())
        wan = np.outer(C_lo[i][:, 0], C_lo[i][:, 0].conj())
        assert np.allclose(band, wan, atol=1e-10)
        assert abs(np.linalg.norm(C_lo[i][:, 0]) - 1.0) < 1e-10
        # fixed gauge: positive overlap with the guess
        assert (C_lo[i][:, 0].conj() @ guess[:, 0]).real > 0
    pair = get_C_ao_lo_wannier(None, C_mo, guess, band_idx=[0])
    assert pair[0].shape == (1, nk, 2, 1)
    # W90 is the native maxloc driver now (tests/test_wannier.py);
    # mismatched num_wann is rejected with a pointer at disentanglement
    from libdmet_preview_tpu.lo.wannier import W90
    with pytest.raises(TypeError):
        W90()


def test_cvx_frac_capped_simplex():
    from libdmet_preview_tpu.ops.fit import cvx_frac
    rng = np.random.RandomState(3)
    A = rng.randn(6, 6)
    A = A + A.T
    _, C = np.linalg.eigh(A)
    d0 = np.array([1.0, 0.8, 0.6, 0.4, 0.2, 0.0])
    rho = C @ np.diag(d0) @ C.T
    w = cvx_frac(C, rho, d0.sum())
    assert np.allclose(np.sort(w), np.sort(d0), atol=1e-7)
    # infeasible diag gets projected: trace + box respected
    w2 = cvx_frac(C, 3.0 * rho, 3.0)
    assert abs(w2.sum() - 3.0) < 1e-8
    assert w2.min() >= -1e-12 and w2.max() <= 1 + 1e-12


def test_rdm2_glob_democratic():
    """Global rdm2 by 4-anchor democratic partitioning (reference
    slater_helper.py:311): the all-impurity block (0,0,0) is EXACT in the
    non-interacting limit (determinant factorization), and the chemist
    (ij)<->(kl) symmetry holds."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    from libdmet_preview_tpu.models.hamiltonian import HubbardHamiltonian

    Lat = dmet.ChainLattice(12, 2)
    Ham = HubbardHamiltonian(Lat, 0.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.VcorLocal(True, False, 2)
    vcor.update(np.zeros(vcor.length()))
    rho, mu = dmet.RHartreeFock(Lat, vcor, 0.25, 0.0)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=False)
    solver = SCFSolver(restricted=True, tol=1e-12)
    ne = (Lat.ncore + Lat.nval) * 2
    rhoEmb, E = solver.run(ImpHam, nelec=ne)
    rdm2 = np.asarray(solver.make_rdm2())[0]
    G = embham.get_rdm2_glob_R(basis, Lat, rdm2)
    rg = np.asarray(embham.get_rho_glob_R(basis, Lat,
                                          np.asarray(rhoEmb)))[0] * 2.0
    det000 = np.einsum("ij, kl -> ijkl", rg[0], rg[0]) \
        - 0.5 * np.einsum("il, kj -> ijkl", rg[0], rg[0])
    assert np.abs(G[0, 0, 0] - det000).max() < 1e-8
    # chemist (ij) <-> (kl) symmetry of the same-cell block
    assert np.abs(G[0, 0, 0] - G[0, 0, 0].transpose(2, 3, 0, 1)).max() \
        < 1e-10
    # single-cell lattice: democratic == plain transform == rdm2_emb
    Lat1 = dmet.ChainLattice(2, 2)
    Ham1 = HubbardHamiltonian(Lat1, 1.0)
    Lat1.set_Ham(Ham1, use_hcore_as_emb_ham=True)
    eye_basis = np.eye(2).reshape(1, 1, 2, 2)
    r2 = np.random.RandomState(0).randn(2, 2, 2, 2)
    r2 = r2 + r2.transpose(1, 0, 3, 2)
    r2 = r2 + r2.transpose(2, 3, 0, 1)
    G1 = embham.get_rdm2_glob_R(eye_basis, Lat1, r2)
    assert np.abs(G1[0, 0, 0] - r2).max() < 1e-12


def test_ibo_localization():
    """IBO (PM-with-IAO-charges, quartic): on an H4 chain the localized
    occupied orbitals concentrate on bonds -- the max atomic IAO charge
    per orbital increases and the orbitals stay orthonormal."""
    import jax
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.lo.iao import get_iao
    from libdmet_preview_tpu.lo.localize import localize_ibo, ibo_metric
    from libdmet_preview_tpu.solvers.scf import SCF
    from libdmet_preview_tpu.models.integral import Integral
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.6)),
                ("H", (0, 0, 3.6)), ("H", (0, 0, 5.2))], basis="sto-6g")
    S = mol.intor_ovlp()
    Ham = Integral(mol.nao, True, False, mol.energy_nuc(),
                   {"cd": mol.intor_hcore()[None]},
                   {"ccdd": mol.intor_eri()[None]}, ovlp=S)
    myscf = SCF()
    myscf.set_system(4, 0, False, True)
    myscf.set_integral(Ham)
    myscf.HF(tol=1e-11)
    C_occ = myscf.mo_coeff[0][:, :2]
    C_iao = get_iao(S, S, S, C_occ)     # minimal basis: IAO ref == basis
    slices = [(i, i + 1) for i in range(4)]
    m0 = float(ibo_metric(C_occ, C_iao, S, slices))
    C_loc, m1 = localize_ibo(C_occ, C_iao, S, slices)
    assert m1 >= m0 - 1e-10
    assert np.allclose(C_loc.T @ S @ C_loc, np.eye(2), atol=1e-8)
    # localized: each orbital sits mostly on one bond (2 atoms)
    proj = C_iao.T @ S @ C_loc
    for i in range(2):
        q = np.sort(proj[:, i] ** 2)[::-1]
        assert q[:2].sum() > 0.85


def test_mo_composition():
    from libdmet_preview_tpu.utils.analysis import mo_composition
    rng = np.random.RandomState(0)
    C = np.linalg.qr(rng.randn(6, 6))[0]
    comp = mo_composition(C, {"a": [0, 1, 2], "b": [3, 4, 5]})
    tot = comp["a"] + comp["b"]
    assert np.allclose(tot, 1.0)
    # complex-pair input
    Ck = (C[None], np.zeros((1, 6, 6)))
    comp_k = mo_composition(Ck, {"a": [0, 1, 2]})
    assert np.allclose(comp_k["a"], comp["a"])


def test_ao2mo_restore_ham_roundtrip():
    """Integral rotation to an (S-orthonormal) MO basis and back
    (reference scf.py ao2mo_Ham/restore_Ham): energies are invariant and
    the roundtrip reproduces the original integrals."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import random_integral
    from libdmet_preview_tpu.solvers.scf import (SCF, ao2mo_Ham,
                                                 restore_Ham)
    from libdmet_preview_tpu.solvers import FCI
    Ham = random_integral(4, restricted=True, seed=3)
    rng = np.random.RandomState(1)
    C = np.linalg.qr(rng.randn(4, 4))[0]
    Ham_mo = ao2mo_Ham(Ham, C)
    _, E1 = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    _, E2 = FCI(restricted=True, tol=1e-12).run(Ham_mo, nelec=4)
    assert abs(E1 - E2) < 1e-9
    Ham_back = restore_Ham(Ham_mo, C)
    assert np.abs(np.asarray(Ham_back.H1["cd"])
                  - np.asarray(Ham.H1["cd"])).max() < 1e-10
    from libdmet_preview_tpu.models.integral import restore_eri
    g0 = restore_eri(np.asarray(Ham.H2["ccdd"][0]), 4, 1)
    g1 = np.asarray(Ham_back.H2["ccdd"][0])
    assert np.abs(g1 - g0).max() < 1e-9


def test_lo_time_reversal_symmetrize():
    from libdmet_preview_tpu.lo.lowdin import (symmetrize_lo_kpair,
                                               check_lo_time_reversal)
    rng = np.random.RandomState(0)
    nk, n = 6, 3
    neg = np.array([(-k) % nk for k in range(nk)])
    C_re = rng.randn(nk, n, n)
    C_im = rng.randn(nk, n, n) * 0.1
    assert check_lo_time_reversal(C_re, C_im, neg) > 0.1
    S_re, S_im = symmetrize_lo_kpair(C_re, C_im, neg)
    assert check_lo_time_reversal(S_re, S_im, neg) < 1e-14
    # already-symmetric input is a fixed point
    T_re, T_im = symmetrize_lo_kpair(S_re, S_im, neg)
    assert np.abs(T_re - S_re).max() < 1e-14


def test_make_real_columns():
    """Real-gauge fixer (Martin-basis capability): columns that are real
    up to a phase become exactly real; genuinely complex columns are
    flagged."""
    from libdmet_preview_tpu.lo.lowdin import make_real_columns
    rng = np.random.RandomState(0)
    r = rng.randn(5, 3)
    th = np.array([0.3, -1.2, 2.0])
    C = r * np.exp(1j * th)[None, :]
    re, im, ok = make_real_columns(C.real, C.imag)
    assert ok.all()
    assert np.abs(im).max() < 1e-12
    # recovered real vectors span the same columns (up to sign)
    for j in range(3):
        s = np.sign(re[:, j] @ r[:, j])
        assert np.allclose(re[:, j] * s, r[:, j], atol=1e-12)
    # a genuinely complex column is flagged not-ok
    Cbad = C.copy()
    Cbad[:, 0] = r[:, 0] * np.exp(1j * np.linspace(0, 1.5, 5))
    _, _, ok2 = make_real_columns(Cbad.real, Cbad.imag)
    assert not ok2[0] and ok2[1] and ok2[2]


def test_iter_history_table(capsys):
    """IterHistory writes the per-iteration convergence table (reference
    HubPhSymm.py:302-325)."""
    from libdmet_preview_tpu.dmet.hubbard import IterHistory
    from libdmet_preview_tpu.ops.diis import FDiisContext
    hist = IterHistory()
    dc = FDiisContext(4)
    hist.update(-0.5, 0.01, 1e-3, 1e-4, dc)
    hist.update(-0.51, 0.005, 5e-4, 5e-5, dc)
    out = capsys.readouterr()
    assert len(hist.history) == 2
    assert hist.history[-1][0] == -0.51


def test_fit_vcor_full_stage():
    """Whole-lattice fit stage (reference FitVcorFull/TwoStep,
    slater.py:1352-1714): the full stage re-solves the mean field per
    step and never worsens ITS OWN objective (the folded full-lattice
    density match); the two-step wrapper runs end to end."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import fit as vfit
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.models.hamiltonian import HubbardHamiltonian

    Lat = dmet.ChainLattice(12, 2)
    Ham = HubbardHamiltonian(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess([2], 4.0, 0.5)
    rho, mu = dmet.RHartreeFock(Lat, vcor, 0.5, None)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=False)
    solver = FCI(restricted=True, tol=1e-11)
    rhoEmb, E = solver.run(ImpHam, nelec=(Lat.ncore + Lat.nval) * 2)

    import copy
    v_full, err_begin, err_end = vfit.FitVcorFull(
        rhoEmb, Lat, basis, copy.deepcopy(vcor), np.inf, 0.5, MaxIter=8)
    assert np.isfinite(err_begin) and np.isfinite(err_end)
    assert err_end <= err_begin + 1e-12
    v_two, err_two = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf, 0.5,
                                  MaxIter1=150, MaxIter2=5)
    assert np.isfinite(err_two)
    assert v_two.get().shape == np.asarray(vcor.get()).shape


def test_minimize_dispatcher():
    """Optimizer dispatcher (reference fit.py minimize): every method
    reaches the quadratic minimum."""
    from libdmet_preview_tpu.ops.fit import minimize
    A = np.diag([1.0, 3.0, 0.5])
    b = np.array([1.0, -2.0, 0.5])

    def fg(x):
        x = np.asarray(x)
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    x_star = np.linalg.solve(A, b)
    for method in ("CG", "BFGS", "trust-ncg", "SD"):
        kw = {"ytol": 1e-14, "gtol": 1e-8} if method == "CG" else {}
        x, f = minimize(fg, np.zeros(3), method=method, max_iter=500,
                        **kw)
        tol = 1e-2 if method == "SD" else 1e-5
        assert np.abs(np.asarray(x) - x_star).max() < tol, method


def test_scdm_smear():
    """Smeared SCDM (reference weight-function SCDM for entangled
    bands): the rotation is orthogonal (span preserved) and the pivots
    avoid columns weighted out by the occupation window."""
    from libdmet_preview_tpu.lo.scdm import scdm_smear
    rng = np.random.RandomState(0)
    C = np.linalg.qr(rng.randn(10, 6))[0]
    e = np.array([-2.0, -1.5, -1.0, 5.0, 6.0, 7.0])
    C_loc, piv = scdm_smear(C, e, mu=0.0, sigma=0.2, return_piv=True)
    assert np.allclose(C_loc.T @ C_loc, np.eye(6), atol=1e-10)
    assert np.allclose(C_loc @ C_loc.T, C @ C.T, atol=1e-10)
    for kind in ("gauss", "fermi"):
        C2 = scdm_smear(C, e, mu=0.0, sigma=0.2, kind=kind)
        assert np.allclose(C2 @ C2.T, C @ C.T, atol=1e-10)


def test_scdm_k():
    """k-point SCDM: per-k unitary (span preserved) with one shared
    pivot set; at the localized gauge the selected rows are
    near-diagonal-dominant."""
    from libdmet_preview_tpu.lo.scdm import scdm_k
    rng = np.random.RandomState(1)
    nk, nao, nmo = 4, 8, 3
    C = np.linalg.qr(rng.randn(nk, nao, nao) +
                     1j * rng.randn(nk, nao, nao))[0][:, :, :nmo]
    C_loc, piv = scdm_k(C, return_piv=True)
    assert len(set(piv.tolist())) == nmo
    for k in range(nk):
        P0 = C[k] @ C[k].conj().T
        P1 = C_loc[k] @ C_loc[k].conj().T
        assert np.abs(P0 - P1).max() < 1e-10
        assert np.abs(C_loc[k].conj().T @ C_loc[k] - np.eye(nmo)).max() \
            < 1e-10


def test_er_random_start_pool():
    """ER localization with a random-start pool (reference edmiston.py
    model variant): the pooled maximum is never worse than the single
    start."""
    from libdmet_preview_tpu.lo.localize import localize_er
    rng = np.random.RandomState(3)
    A = rng.randn(6, 4, 4)
    A = A + A.transpose(0, 2, 1)
    eri = np.einsum("xpq, xrs -> pqrs", A, A)
    C0 = np.linalg.qr(rng.randn(4, 3))[0]
    C1, m1 = localize_er(C0, eri)
    C3, m3 = localize_er(C0, eri, n_start=3)
    assert m3 >= m1 - 1e-9
    assert np.allclose(C3.T @ C3, np.eye(3), atol=1e-8)


def test_minimize_newton_hvp():
    """Second-order (trust-region Newton, HVP-only) minimizer -- the
    reference's CIAH augmented-Hessian role (fit_helper.py:678-969), with
    the Hessian-vector product from jax.jvp through the gradient."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from libdmet_preview_tpu.ops.fit import minimize

    rng = np.random.RandomState(0)
    n = 12
    A = rng.randn(n, n)
    A = A @ A.T + np.eye(n)
    b = rng.randn(n)

    def cost(x):
        # quartic bowl: nonquadratic but convex near the optimum
        q = 0.5 * x @ (A @ x) - b @ x
        return q + 0.05 * jnp.sum(x ** 4)

    vg = jax.jit(jax.value_and_grad(cost))
    grad = jax.jit(jax.grad(cost))

    def fun_grad(x):
        f, g = vg(jnp.asarray(x))
        return float(f), np.asarray(g)

    def hvp(x, p):
        return np.asarray(jax.jvp(grad, (jnp.asarray(x),),
                                  (jnp.asarray(p),))[1])

    x_ref = np.linalg.solve(A, b)   # rough start reference
    x, f = minimize(fun_grad, np.zeros(n), method="AH", max_iter=50,
                    hvp=hvp, gtol=1e-9)
    g_end = np.abs(fun_grad(x)[1]).max()
    assert g_end < 1e-8
    # second-order convergence beats plain CG at equal iteration budget
    x_cg, f_cg = minimize(fun_grad, np.zeros(n), method="CG", max_iter=8)
    x_ah, f_ah = minimize(fun_grad, np.zeros(n), method="AH", max_iter=8,
                          hvp=hvp)
    assert f_ah <= f_cg + 1e-12

    # and it drives the vcor fit: FitVcorEmb(method='AH') reaches the CG
    # result on the Hubbard workload
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops.fit import FitVcorEmb
    from libdmet_preview_tpu.ops import mfd, embham
    import copy
    Lat = dmet.ChainLattice(12, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess((2,), 4.0, 0.5)
    rho, mu, E = mfd.HF(Lat, vcor, 0.5, True)
    basis = embham.embBasis(Lat, rho)
    rng2 = np.random.RandomState(5)
    neo = basis.shape[-1]
    t = rng2.randn(1, neo, neo) * 0.05
    target = np.eye(neo)[None] * 0.5 + 0.5 * (t + t.transpose(0, 2, 1))
    v1 = copy.deepcopy(vcor)
    v2 = copy.deepcopy(vcor)
    _, e0_cg, e_cg = FitVcorEmb(target, Lat, basis, v1, np.inf,
                                MaxIter=200)
    _, e0_ah, e_ah = FitVcorEmb(target, Lat, basis, v2, np.inf,
                                MaxIter=50, method="AH")
    assert e_ah < e0_ah
    assert e_ah < e_cg * 1.2 + 1e-8


def test_active_space_projector_and_fit():
    """Active-space vcor fitting (reference slater.py:2121-2300 +
    test_fit_active_space.py): projector math and the P_act/C_act hooks
    of FitVcorEmb."""
    import copy
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import mfd, embham
    from libdmet_preview_tpu.ops.fit import (
        FitVcorEmb, get_active_projector, get_active_projector_full,
        make_rdm1_P)

    Lat = dmet.ChainLattice(8, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess((2,), 4.0, 0.0)
    # filling 3/8 keeps the discrete chain spectrum gapped (half filling
    # is degenerate at the Fermi level -> non-idempotent rho)
    rho, mu, E = mfd.HF(Lat, vcor, 3.0 / 8.0, True)
    rho_full = Lat.expand(rho)              # (1, nsites, nsites), per-spin
    fock_full = Lat.expand(np.asarray(Lat.getH1(kspace=False)))[None]
    nsites = rho_full.shape[-1]
    nocc_exact = int(round(np.trace(rho_full[0])))

    # 1. full active space: P spans everything, mean field is reproduced
    P, nocc = get_active_projector(range(nsites), rho_full)
    assert P.shape == (1, nsites, nsites)
    assert nocc[0] == nocc_exact
    assert np.allclose(P[0].T @ P[0], np.eye(nsites), atol=1e-10)
    Pf = get_active_projector_full(P)
    assert np.allclose(Pf[0], np.eye(nsites), atol=1e-10)
    rho_P = make_rdm1_P(fock_full, None, P, nocc)
    assert np.allclose(rho_P, rho_full, atol=1e-8)

    # 2. subset: orthonormal columns, projected density idempotent with
    #    the right electron count inside the subspace
    act_idx = [0, 1, 2, 3]
    P2, nocc2 = get_active_projector(act_idx, rho_full)
    nact = P2.shape[-1]
    assert nact < nsites
    assert np.allclose(P2[0].T @ P2[0], np.eye(nact), atol=1e-10)
    rho_P2 = make_rdm1_P(fock_full, None, P2, nocc2, project_back=False)
    assert np.allclose(rho_P2[0] @ rho_P2[0], rho_P2[0], atol=1e-8)
    assert abs(np.trace(rho_P2[0]) - nocc2[0]) < 1e-8

    # 3. FitVcorEmb with full-space P_act/C_act == the plain fit
    basis = embham.embBasis(Lat, rho)
    neo = basis.shape[-1]
    rng = np.random.RandomState(7)
    t = rng.randn(1, neo, neo) * 0.05
    target = np.eye(neo)[None] * 0.5 + 0.5 * (t + t.transpose(0, 2, 1))
    beta = 400.0
    v1, v2 = copy.deepcopy(vcor), copy.deepcopy(vcor)
    _, e0_plain, e_plain = FitVcorEmb(target, Lat, basis, v1, beta,
                                      MaxIter=80)
    _, e0_act, e_act = FitVcorEmb(target, Lat, basis, v2, beta,
                                  MaxIter=80, P_act=P,
                                  C_act=np.eye(neo)[None])
    assert abs(e0_act - e0_plain) < 1e-10
    assert abs(e_act - e_plain) < 1e-6
    assert np.allclose(v1.param, v2.param, atol=1e-4)

    # 4. restricted subspace fit: error decreases, vcor moves
    v3 = copy.deepcopy(vcor)
    C_act = np.asarray(basis)[0].reshape(-1, neo).T @ (
        get_active_projector_full(P2)[0] @
        np.asarray(basis)[0].reshape(-1, neo))
    # orthonormalize the active embedding columns (drop null directions)
    w, V = np.linalg.eigh(C_act @ C_act.T)
    C_cols = V[:, w > 1e-8]
    _, e0_sub, e_sub = FitVcorEmb(target, Lat, basis, v3, beta,
                                  MaxIter=60, P_act=P2,
                                  C_act=C_cols[None])
    assert e_sub < e0_sub
    assert np.linalg.norm(v3.param - vcor.param) > 1e-8

    # 5. zero-T C_act fit routes through the large-beta Fermi op and
    #    agrees with the plain zero-T fit for a full-space projector
    v4, v5 = copy.deepcopy(vcor), copy.deepcopy(vcor)
    _, e0_zt, e_zt = FitVcorEmb(target, Lat, basis, v4, np.inf,
                                MaxIter=80)
    _, e0_zta, e_zta = FitVcorEmb(target, Lat, basis, v5, np.inf,
                                  MaxIter=80, C_act=np.eye(neo)[None])
    assert abs(e0_zta - e0_zt) < 1e-8
    assert abs(e_zta - e_zt) < 1e-5
