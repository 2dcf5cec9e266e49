"""
KS-DFT (grid, functionals, SCF) and DFT-in-DMET double counting
(reference pdft_helper.py:43-500, KRKSpU family's KS core; here:
ints/grid.py, ints/xc.py, solvers/ksdft.py, embham xc_dc path).

Oracles:
  * quadrature grid reproduces the ANALYTIC overlap matrix;
  * Slater exchange of a single Gaussian density matches the closed-form
    integral to machine precision;
  * v_xc (autodiff) == finite differences of E_xc;
  * RKS with xc=None, hyb=1 is EXACTLY Hartree-Fock;
  * the xc double-counting branch of _emb_H1 with vxc=0, hyb=1
    reproduces the standard interacting-bath H1 exactly;
  * LSDA-in-DMET end-to-end on the H ring holds the filling.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def h2():
    from libdmet_preview_tpu.ints.gto import Mole
    return Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-6g")


def test_grid_reproduces_overlap(h2):
    from libdmet_preview_tpu.ints.grid import becke_grid, eval_ao
    g, w = becke_grid(h2, n_rad=60)
    ao = eval_ao(h2, g)
    Sg = (ao * w) @ ao.T
    assert np.abs(Sg - h2.intor_ovlp()).max() < 1e-6


def test_slater_exchange_analytic():
    """X of a normalized-primitive Gaussian density: closed form
    -Cx 2^{1/3} * 2 * ((N^2/2)^{4/3} (3 pi / 8 alpha)^{3/2})."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.ints.grid import becke_grid
    from libdmet_preview_tpu.ints.xc import eval_exc_vxc
    alpha = 0.8
    mol = Mole([("H", (0, 0, 0))], basis="sto-6g")
    g, w = becke_grid(mol, n_rad=80, n_theta=14, n_phi=28)
    N = (2 * alpha / np.pi) ** 0.75
    ao = (N * np.exp(-alpha * np.sum(g ** 2, axis=1)))[None]
    dm = np.array([[1.0]])
    Cx = 0.75 * (3 / np.pi) ** (1 / 3.0)
    I = (N ** 2 / 2) ** (4 / 3.0) * (3 * np.pi / (8 * alpha)) ** 1.5
    Ex_ref = -Cx * 2 ** (1 / 3.0) * 2 * I
    exc, _ = eval_exc_vxc(dm, ao, w, restricted=True, xc="slater")
    assert abs(exc - Ex_ref) < 1e-12


def test_vxc_autodiff_vs_fd(h2):
    import jax.numpy as jnp
    from libdmet_preview_tpu.ints.grid import becke_grid, eval_ao
    from libdmet_preview_tpu.ints.xc import eval_exc_vxc, _exc_from_dm
    g, w = becke_grid(h2, n_rad=40)
    ao = eval_ao(h2, g)
    rng = np.random.RandomState(0)
    A = rng.randn(2, 2)
    D = A @ A.T * 0.3 + 0.4 * np.eye(2)
    exc0, vxc0 = eval_exc_vxc(D, ao, w, restricted=True, xc="lsda")
    eps = 1e-6
    fd = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            Dp = D.copy()
            Dp[i, j] += eps
            fd[i, j] = (float(_exc_from_dm(jnp.asarray(Dp),
                                           jnp.asarray(ao),
                                           jnp.asarray(w), True, "lsda"))
                        - exc0) / eps
    fd = 0.5 * (fd + fd.T)
    assert np.abs(fd - vxc0).max() < 1e-6


def test_rks_as_hf_identity(h2):
    """RKS with xc=None and hyb=1 is plain RHF: energy matches the SCF
    solver on the same integrals to 1e-9."""
    from libdmet_preview_tpu.solvers.ksdft import RKS
    from libdmet_preview_tpu.solvers.scf import SCF
    from libdmet_preview_tpu.models.integral import Integral
    hf = RKS(h2, xc=None, hyb=1.0)
    E_ks, _ = hf.kernel()
    assert hf.converged
    Ham = Integral(h2.nao, True, False, h2.energy_nuc(),
                   {"cd": h2.intor_hcore()[None]},
                   {"ccdd": h2.intor_eri()[None]}, ovlp=h2.intor_ovlp())
    myscf = SCF()
    myscf.set_system(h2.nelectron, 0, False, True)
    myscf.set_integral(Ham)
    E_hf, _ = myscf.HF(tol=1e-12)
    assert abs(E_ks - E_hf) < 1e-9


def test_lsda_h2_and_h_atom(h2):
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.solvers.ksdft import RKS, UKS
    ks = RKS(h2, xc="lsda")
    E, dm = ks.kernel()
    assert ks.converged
    # electron count on the grid and sane energy window
    assert abs(np.sum(dm * h2.intor_ovlp()) - 2.0) < 1e-9
    assert -1.3 < E < -0.9
    molh = Mole([("H", (0, 0, 0))], basis="sto-6g")
    uks = UKS(molh, xc="lsda", nelec=(1, 0))
    Eu, dmu = uks.kernel()
    assert uks.converged
    assert -0.6 < Eu < -0.3
    # fully polarized: beta channel empty
    assert np.abs(dmu[1]).max() < 1e-10


def test_dc_branch_hf_limit_identity():
    """_emb_H1 with xc_dc returning zero and hyb=1 must equal the
    standard interacting-bath branch bit-for-bit."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    nlo = meta["nlo"]
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu = dmet.RHartreeFock(Lat, vcor, filling, None)
    ImpHam_std, _, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                matching=False,
                                                int_bath=True)
    Lat.xc_dc = lambda rho_lo: np.zeros_like(rho_lo)
    Lat.xc_hyb = 1.0
    ImpHam_dc, _, _ = dmet.ConstructImpHam(Lat, rho, vcor,
                                           matching=False, int_bath=True)
    assert np.abs(np.asarray(ImpHam_dc.H1["cd"])
                  - np.asarray(ImpHam_std.H1["cd"])).max() < 1e-11


def test_lsda_in_dmet_hring():
    """End-to-end LSDA-in-DMET: KS lattice + xc double counting + FCI
    embedding with a dmu fit holds the filling; the embedded impurity
    density stays close to the KS one."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import (make_h_ring_lattice,
                                                     attach_ks)
    from libdmet_preview_tpu.solvers import FCI
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    nlo = meta["nlo"]
    ks = attach_ks(Lat, meta, xc="lsda")
    vcor = dmet.VcorLocal(True, False, nlo)
    vcor.update(np.zeros(vcor.length()))
    filling = meta["mole"].nelectron / (2.0 * meta["mole"].nao)
    rho, mu = dmet.RHartreeFock(Lat, vcor, filling, None)
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=True)
    solver = FCI(restricted=True, tol=1e-12)
    mu_solver = dmet.MuSolver(adaptive=True)
    solver_args = {"nelec": (Lat.ncore + Lat.nval) * 2}
    last_dmu = 0.0
    for _ in range(20):
        rhoEmb, E_emb, ImpHam, dmu = mu_solver(
            Lat, filling, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        rhoImp, EnergyImp, nelecImp = dmet.transformResults(
            rhoEmb, E_emb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        if abs(nelecImp - 2 * filling) < 1e-6:
            break
    assert abs(nelecImp - 2 * filling) < 1e-6
    # impurity density close to the KS lattice density (correlation is a
    # small correction on this gapped system)
    rho_ks_imp = np.asarray(Lat.rdm1_lo_R)[0, 0]
    assert np.abs(np.asarray(rhoImp)[0] * 2.0 - rho_ks_imp).max() < 0.05


# ---------------------------------------------------------------------
# GGA (PBE) — reference parity for the functional family the reference
# gets from libxc (pdft_helper consumers run any KS functional; PBE is
# the workhorse in its periodic examples).


def test_pw92_matches_vwn5():
    """PW92 and VWN5 are independent fits of the same uniform-gas data:
    they must agree to ~1 mHa over the physical rs range at any zeta."""
    import jax.numpy as jnp
    from libdmet_preview_tpu.ints.xc import pw92_eps_c, _vwn_eps, \
        _f_zeta, _FPP0
    rs = jnp.asarray([0.5, 1.0, 2.0, 5.0, 10.0, 20.0])
    for zeta in (0.0, 0.5, 0.999):
        eP = _vwn_eps(rs, "P")
        eF = _vwn_eps(rs, "F")
        eA = _vwn_eps(rs, "A")
        f = _f_zeta(zeta)
        vwn = eP + eA * f / _FPP0 * (1.0 - zeta ** 4) \
            + (eF - eP) * f * zeta ** 4
        pw = pw92_eps_c(rs, zeta)
        assert np.abs(np.asarray(pw - vwn)).max() < 2e-3


def test_pbe_reduces_to_lda_at_zero_gradient():
    """PBE with sigma = 0: Fx -> 1 (Slater) and H -> 0 (PW92)."""
    from libdmet_preview_tpu.ints.xc import (pbe_exc_density,
                                             ldapw_exc_density)
    rng = np.random.RandomState(1)
    ra = rng.rand(50) * 2.0 + 1e-3
    rb = rng.rand(50) * 2.0 + 1e-3
    z = np.zeros(50)
    pbe0 = np.asarray(pbe_exc_density(ra, rb, z, z, z))
    lda = np.asarray(ldapw_exc_density(ra, rb))
    assert np.abs(pbe0 - lda).max() < 1e-12


def test_eval_ao_grad_vs_fd():
    """Analytic AO gradients == central finite differences, for the
    s-shell Mole AND a general-l (p, d) MoleGeneral."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.ints.md import MoleGeneral
    from libdmet_preview_tpu.ints.grid import eval_ao, eval_ao_grad
    rng = np.random.RandomState(2)
    pts = rng.randn(20, 3) * 1.5
    eps = 1e-5
    mols = [
        Mole([("H", (0, 0, 0)), ("H", (0.2, -0.3, 1.4))], basis="sto-6g"),
        MoleGeneral([("H", (0.1, 0.0, -0.2))], basis="pd",
                    basis_data={("H", "pd"): [(1, [(0.8, 1.0),
                                                   (0.3, 0.5)]),
                                              (2, [(0.6, 1.0)])]}),
    ]
    for mol in mols:
        grad = eval_ao_grad(mol, pts)
        for ax in range(3):
            dp = pts.copy()
            dm = pts.copy()
            dp[:, ax] += eps
            dm[:, ax] -= eps
            fd = (eval_ao(mol, dp) - eval_ao(mol, dm)) / (2 * eps)
            assert np.abs(fd - grad[ax]).max() < 1e-8


def test_pbe_vxc_autodiff_vs_fd(h2):
    """The FULL PBE potential matrix (incl. the gradient-correction
    -div[de/d(nabla rho)] term) from jax.grad == finite differences of
    E_xc, restricted and unrestricted."""
    import jax.numpy as jnp
    from libdmet_preview_tpu.ints.grid import becke_grid, eval_ao, \
        eval_ao_grad
    from libdmet_preview_tpu.ints.xc import eval_exc_vxc, _exc_from_dm
    g, w = becke_grid(h2, n_rad=40)
    ao = eval_ao(h2, g)
    aog = eval_ao_grad(h2, g)
    rng = np.random.RandomState(0)
    A = rng.randn(2, 2)
    D = A @ A.T * 0.3 + 0.4 * np.eye(2)
    eps = 1e-6

    exc0, vxc0 = eval_exc_vxc(D, ao, w, restricted=True, xc="pbe",
                              ao_grad=aog)
    fd = np.zeros((2, 2))
    for i in range(2):
        for j in range(2):
            Dp = D.copy()
            Dp[i, j] += eps
            fd[i, j] = (float(_exc_from_dm(
                jnp.asarray(Dp), jnp.asarray(ao), jnp.asarray(w), True,
                "pbe", jnp.asarray(aog))) - exc0) / eps
    fd = 0.5 * (fd + fd.T)
    assert np.abs(fd - vxc0).max() < 1e-6

    Du = np.stack([0.6 * D, 0.4 * D])
    excu, vxcu = eval_exc_vxc(Du, ao, w, restricted=False, xc="pbe",
                              ao_grad=aog)
    fdu = np.zeros((2, 2, 2))
    for s in range(2):
        for i in range(2):
            for j in range(2):
                Dp = Du.copy()
                Dp[s, i, j] += eps
                fdu[s, i, j] = (float(_exc_from_dm(
                    jnp.asarray(Dp), jnp.asarray(ao), jnp.asarray(w),
                    False, "pbe", jnp.asarray(aog))) - excu) / eps
        fdu[s] = 0.5 * (fdu[s] + fdu[s].T)
    assert np.abs(fdu - vxcu).max() < 1e-6


def test_rks_pbe_h2(h2):
    """RKS(PBE) on H2: converges; the gradient correction lowers E_xc
    relative to LSDA (PBE's Fx >= 1) but stays a small correction."""
    from libdmet_preview_tpu.solvers.ksdft import RKS
    ks_l = RKS(h2, xc="lsda", n_rad=50)
    ks_p = RKS(h2, xc="pbe", n_rad=50)
    e_l, _ = ks_l.kernel()
    e_p, _ = ks_p.kernel()
    assert ks_l.converged and ks_p.converged
    assert e_p < e_l          # Fx > 1 where s > 0: more negative Ex
    assert abs(e_p - e_l) < 0.08
    assert -1.3 < e_p < -0.9


def test_uks_pbe_h_atom():
    """Fully spin-polarized PBE (zeta = 1 guard path): the H atom in
    UKS converges and improves on LSDA toward the exact -0.5."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.solvers.ksdft import UKS
    mol = Mole([("H", (0, 0, 0))], basis="sto-6g")
    uks_l = UKS(mol, xc="lsda", nelec=(1, 0), n_rad=50)
    uks_p = UKS(mol, xc="pbe", nelec=(1, 0), n_rad=50)
    e_l, _ = uks_l.kernel()
    e_p, _ = uks_p.kernel()
    assert uks_l.converged and uks_p.converged
    assert e_p < e_l
    assert abs(e_p - (-0.5)) < abs(e_l - (-0.5))


def test_pbe_in_dmet_dc_identity():
    """attach_ks(xc='pbe') installs a GGA double-counting evaluator:
    xc_dc on the KS lattice density reproduces the molecular PBE vxc
    rotated to LOs (consistency of the DFT-in-DMET plumbing)."""
    from libdmet_preview_tpu.models.abinitio import (make_h_ring_lattice,
                                                     attach_ks)
    from libdmet_preview_tpu.ints.xc import eval_exc_vxc
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    ks = attach_ks(Lat, meta, xc="pbe")
    assert ks.converged
    C = meta["C_ao_lo"]
    S = meta["mole"].intor_ovlp()
    SC = S @ C
    rho_lo = SC.T @ ks.dm @ SC
    v_dc = Lat.xc_dc(rho_lo)
    _, vxc_ao = eval_exc_vxc(ks.dm, ks.ao_g, ks.grid[1],
                             restricted=True, xc="pbe",
                             ao_grad=ks.ao_grad_g)
    assert np.abs(v_dc - C.T @ vxc_ao @ C).max() < 1e-12
