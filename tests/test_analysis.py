"""
Observables, global density matrix, checkpoint/resume
(reference analogs: system/analyze.py, utils/get_order_param.py,
slater_helper.get_rho_glob_R with its test_E1_from_glob oracle,
the np.save/restart checkpoint pattern).
"""

import numpy as np
import pytest


def test_rho_glob_hf_limit():
    """In the HF limit the democratic global rdm reproduces the lattice
    mean-field rdm exactly (reference test_E1_from_glob oracle)."""
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.ops import embham
    import jax.numpy as jnp

    Lat = dmet.ChainLattice(12, 2)
    Ham = dmet.Ham(Lat, 0.0)        # U = 0: embedded HF state == lattice HF
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.VcorLocal(True, False, 2)
    vcor.update(np.zeros(vcor.length()))
    rho, mu, res = dmet.RHartreeFock(Lat, vcor, 0.25, None, ires=True)
    basis = embham.get_emb_basis(Lat, rho)
    basis_k = Lat.R2k_basis(basis)
    rho_emb = np.asarray(embham.foldRho_k(res["rho_k"], basis_k))
    rho_glob = embham.get_rho_glob_R(basis, Lat, rho_emb)
    assert np.max(np.abs(rho_glob - rho)) < 1e-8


def test_mulliken_and_orders():
    from libdmet_preview_tpu.utils.analysis import (
        mulliken_lo, get_order_param_afm, bond_order, get_dos,
        spin_corr_mean_field)
    rdm = np.asarray([np.diag([0.9, 0.1]), np.diag([0.1, 0.9])])
    pop, charge, spin_d = mulliken_lo(rdm)
    assert np.allclose(charge, [1.0, 1.0])
    assert np.allclose(spin_d, [0.8, -0.8])
    m = get_order_param_afm(rdm)
    assert abs(m - 0.4) < 1e-12
    # DOS integrates to the number of levels
    ws, dos = get_dos(np.asarray([-1.0, 0.0, 1.0]), sigma=0.05, nw=2000)
    n_int = np.trapezoid(dos, ws)
    assert abs(n_int - 3.0) < 1e-3
    # bond order of a H2-like bonding state
    c = np.ones((2, 1)) / np.sqrt(2)
    d = c @ c.T
    assert abs(bond_order(np.asarray([d, d]), 0, 1) - 1.0) < 1e-12
    # <Sz_i Sz_j> for a polarized pair
    assert spin_corr_mean_field(rdm, 0, 1) < 0


def test_sc_order_param():
    from libdmet_preview_tpu.utils.analysis import get_order_param_sc
    nao = 2
    kappa = np.diag([0.3, 0.3])
    GRho = np.zeros((2 * nao, 2 * nao))
    GRho[:nao, nao:] = kappa
    GRho[nao:, :nao] = kappa.T
    assert abs(get_order_param_sc(GRho) - 0.3) < 1e-12


def test_checkpoint_roundtrip(tmp_path):
    from libdmet_preview_tpu.utils.chkfile import (
        save_dmet_iter, load_dmet_iter, restart_from_dmet_iter)
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    rng = np.random.RandomState(0)
    v = VcorLocal(False, False, 2)
    p = rng.randn(v.length())
    path = str(tmp_path / "dmet_iter_3.npz")
    save_dmet_iter(path, mu=1.5, last_dmu=-0.2, vcor_param=p,
                   rho_emb=rng.randn(2, 4, 4))
    data = load_dmet_iter(path)
    assert np.allclose(data["vcor_param"], p)
    v2 = VcorLocal(False, False, 2)
    mu, last_dmu = restart_from_dmet_iter(v2, path)
    assert abs(mu - 1.5) < 1e-12 and abs(last_dmu + 0.2) < 1e-12
    assert np.allclose(v2.param, p)


def test_spin_corr_from_rdm2_fci():
    """Correlated <Sz_i Sz_j> from FCI RDMs on the 2-site Hubbard dimer:
    matches the analytic ground-state value and approaches the singlet
    limit -0.25 + O(t/U) at large U."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.utils.analysis import spin_corr_from_rdm2

    for U in (4.0, 40.0):
        Ham = hubbard_integral(2, U=U, restricted=True)
        fci = FCI(restricted=True, tol=1e-12)
        rdm1, E = fci.run(Ham, nelec=2)
        from libdmet_preview_tpu.solvers.fci import make_rdm2s
        Gaa, Gbb, Gab = make_rdm2s(fci.ci, fci.norb, fci.nelec)
        rdm2 = np.asarray([Gaa, Gbb, Gab])
        rdm1_s = np.asarray(rdm1)
        if rdm1_s.shape[0] == 1:
            rdm1_s = np.concatenate([rdm1_s, rdm1_s]) * 1.0
        # analytic 2-site Hubbard ground state: <Sz1 Sz2> =
        # -(1/4) * 16t^2 / (U*sqrt(U^2+16) + U^2 + 16)... use the exact
        # wavefunction instead: |gs> = cos(a)(singlet covalent)
        # + sin(a)(ionic); <Sz1 Sz2> = -0.25 cos^2(a) ... compute from
        # diagonalizing the 2x2 block directly
        t = 1.0
        H2 = np.array([[0.0, 2.0 * t], [2.0 * t, U]])
        w, v = np.linalg.eigh(H2)
        c_cov, c_ion = v[0, 0], v[1, 0]
        sz_exact = -0.25 * c_cov ** 2 + 0.0 * c_ion ** 2
        got = spin_corr_from_rdm2(rdm1_s, rdm2, 0, 1)
        assert abs(got - sz_exact) < 1e-8
        if U == 40.0:
            assert got < -0.2


def test_bond_pairs_torus():
    """get_bond_pairs on a 2x2 periodic square (spacing 1): exactly
    2*natm = 8 unique nearest-neighbor Cu-Cu bonds, 4 along x and 4
    along y (wrap-around bonds distinct from direct ones)."""
    from libdmet_preview_tpu.utils.analysis import get_bond_pairs
    coords = np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.]])
    cell = np.diag([2.0, 2.0])
    species = ["Cu"] * 4
    bonds = get_bond_pairs(coords, cell=cell, species=species,
                           bond_type=[("Cu", "Cu")],
                           length_range=(0.5, 1.3))
    assert len(bonds) == 8
    nx = sum(1 for (_, _, v, _) in bonds if abs(v[0]) > 1e-8)
    ny = sum(1 for (_, _, v, _) in bonds if abs(v[1]) > 1e-8)
    assert nx == 4 and ny == 4


def test_order_ab_initio_dwave():
    """A constructed d-wave anomalous density (+kappa on x bonds,
    -kappa on y bonds of the Cu torus) gives a nonzero d-wave order and
    an exactly cancelling s-wave order (the defining signature)."""
    from libdmet_preview_tpu.utils.analysis import (get_bond_pairs,
                                                    get_order_ab_initio)
    kappa = 0.07
    coords = np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.]])
    cell = np.diag([2.0, 2.0])
    species = ["Cu"] * 4
    offsets = [np.array([i]) for i in range(4)]
    rdm1_d = np.zeros((4, 4))
    for (i, j, v, _) in get_bond_pairs(coords, cell=cell, species=species,
                                       bond_type=[("Cu", "Cu")],
                                       length_range=(0.5, 1.3)):
        sgn = 1.0 if abs(v[0]) > 1e-8 else -1.0
        rdm1_d[i, j] = rdm1_d[j, i] = sgn * kappa
    res_d = get_order_ab_initio(rdm1_d, coords, species, offsets,
                                cell=cell, length_range=(0.5, 1.3))
    res_s = get_order_ab_initio(rdm1_d, coords, species, offsets,
                                cell=cell, length_range=(0.5, 1.3),
                                s_wave=True)
    # 8 bonds, each contributing sqrt(2)*kappa with aligned signs
    assert abs(res_d["m_tot"] - 8 * np.sqrt(2) * kappa) < 1e-12
    assert res_s["m_tot"] < 1e-12


def test_checkerboard_order_afm():
    """Checkerboard AFM extraction on a CuO2-like cell: staggered Cu
    moments +-m recovered exactly; O moments and charges reported."""
    from libdmet_preview_tpu.utils.analysis import get_checkerboard_order
    m = 0.31
    # 2x2 Cu checkerboard + one O on each Cu-Cu x-bond midpoint
    coords = np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.],
                       [0.5, 0.], [0.5, 1.]])
    species = ["Cu"] * 4 + ["O"] * 2
    offsets = [np.array([i]) for i in range(6)]
    na = np.array([0.5 + m, 0.5 - m, 0.5 - m, 0.5 + m, 0.95, 0.95])
    nb = np.array([0.5 - m, 0.5 + m, 0.5 + m, 0.5 - m, 0.95, 0.95])
    rdm1 = np.asarray([np.diag(na), np.diag(nb)])
    res = get_checkerboard_order(rdm1, coords, species, offsets, d_dd=1.0)
    assert abs(res["m_AFM"] - m) < 1e-12
    assert abs(res["m_FM_Cu"]) < 1e-12
    assert np.allclose(res["charge_Cu"], 1.0)
    assert np.allclose(res["charge_O"], 1.9)
    assert abs(res["m_AFM_O"]) < 1e-12


# ---------------------------------------------------------------------
# band structure / Fermi surface / ELF (reference utils/plot.py
# plot_bands:1095, get_kdis:1133, get_fermi_surface:1204, ELF:324-633)


def test_get_bands_tight_binding_exact():
    """Fourier interpolation of the stripe Hamiltonian reproduces the
    analytic tight-binding band -2t cos(2 pi k) at ARBITRARY k (not
    just the BvK mesh)."""
    from libdmet_preview_tpu.utils.analysis import get_bands, k_path, \
        get_kdis
    t = 1.0
    N = 8
    h_R = np.zeros((N, 1, 1))
    h_R[1, 0, 0] = -t
    h_R[N - 1, 0, 0] = -t
    kf = np.linspace(0.0, 0.5, 23)            # off-mesh points included
    ew = get_bands(h_R, kf[:, None])
    ref = -2.0 * t * np.cos(2 * np.pi * kf)
    assert np.abs(ew[:, 0] - ref).max() < 1e-12
    # path helper + distances
    path = k_path(np.array([[0.0], [0.5]]), n_per_seg=10)
    kdis, kdis_sp = get_kdis(path, kpts_sp=np.array([[0.0], [0.5]]))
    assert abs(kdis[-1] - 0.5) < 1e-12
    assert np.allclose(kdis_sp, [0.0, 0.5])


def test_get_bands_generalized_with_overlap():
    """Generalized eigenproblem branch: scaling the overlap rescales
    nothing when S == I, and a constant S = c*I divides h by c."""
    from libdmet_preview_tpu.utils.analysis import get_bands
    N = 6
    rng = np.random.RandomState(0)
    h0 = rng.randn(2, 2)
    h_R = np.zeros((N, 2, 2))
    h_R[0] = h0 + h0.T
    s_R = np.zeros((N, 2, 2))
    s_R[0] = 2.0 * np.eye(2)
    kf = np.linspace(0, 1, 7)[:, None]
    e1 = get_bands(h_R, kf)
    e2 = get_bands(h_R, kf, ovlp_R=s_R)
    assert np.abs(e2 - e1 / 2.0).max() < 1e-12


def test_fermi_surface_weights():
    from libdmet_preview_tpu.utils.analysis import get_fermi_surface
    e = np.array([[0.0, 1.0], [0.5, 2.0]])
    w = get_fermi_surface(e, mu=0.0, sigma=0.1)
    assert w.shape == (2,)
    assert w[0] > w[1]          # a level exactly at mu dominates


def test_elf_single_orbital_is_one():
    """ELF == 1 identically for any 2-electron closed-shell (single
    occupied orbital) system: tau == |grad rho|^2 / (8 rho) exactly."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.utils.analysis import eval_elf
    mol = Mole([("He", (0, 0, 0))], basis="sto-3g")
    # closed-shell 2e density in the 1-AO basis
    dm = np.array([[2.0]])
    rng = np.random.RandomState(3)
    pts = rng.randn(40, 3)
    elf = eval_elf(mol, dm, pts, restricted=True)
    assert np.abs(elf - 1.0).max() < 1e-8


def test_elf_uniformlike_below_one():
    """A many-orbital delocalized density has ELF < 1 where orbitals
    overlap (Pauli kinetic energy > 0)."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.utils.analysis import eval_elf
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.4)),
                ("H", (0, 0, 2.8)), ("H", (0, 0, 4.2))], basis="sto-6g")
    S = mol.intor_ovlp()
    w, v = np.linalg.eigh(S)
    A = v @ np.diag(w ** -0.5) @ v.T
    h = mol.intor_hcore()
    e, c = np.linalg.eigh(A @ h @ A)
    C = A @ c
    dm = 2.0 * C[:, :2] @ C[:, :2].T
    pts = np.array([[0.0, 0.0, z] for z in np.linspace(0.5, 3.5, 9)])
    elf = eval_elf(mol, dm, pts, restricted=True)
    assert np.all(elf < 1.0 - 1e-6)
    assert np.all(elf > 0.0)


def test_plot_bands_writes_file(tmp_path):
    from libdmet_preview_tpu.utils.analysis import (get_bands, k_path,
                                                    get_kdis, plot_bands)
    N = 6
    h_R = np.zeros((N, 1, 1))
    h_R[1, 0, 0] = -1.0
    h_R[N - 1, 0, 0] = -1.0
    path = k_path(np.array([[0.0], [0.5]]), n_per_seg=12)
    ew = get_bands(h_R, path)
    kdis, kdis_sp = get_kdis(path, kpts_sp=np.array([[0.0], [0.5]]))
    out = plot_bands(str(tmp_path / "bands.png"), kdis, ew,
                     kdis_sp=kdis_sp, labels_sp=["G", "X"], e_fermi=0.0)
    if out is not None:
        import os
        assert os.path.getsize(out) > 0
