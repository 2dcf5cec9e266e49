"""
3D translation groups in the periodic integral engine: the general
tr_diff difference table (ints/pbc.py set_translations), stripe assembly
of 1-body matrices on a 2x2x1 mesh, and the translation-symmetric
'full'-format ERI (eri_trans_full) against the dense supercell ERI --
the scaling machinery for the north-star diamond 3x3x3 workload.
"""

import numpy as np
import pytest


def _h2_crystal(kmesh, with_translations):
    """H2-molecule crystal: one H2 per cell, cells on a kmesh."""
    from libdmet_preview_tpu.ints import pbc as pbcmod
    L = 4.0
    a_cell = np.diag([L, L, L])
    cell_atoms = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 1.4))]
    t_vecs = []
    atoms = []
    for cx in range(kmesh[0]):
        for cy in range(kmesh[1]):
            for cz in range(kmesh[2]):
                T = np.array([cx * L, cy * L, cz * L])
                t_vecs.append(T)
                for sym, xyz in cell_atoms:
                    atoms.append((sym, np.asarray(xyz) + T))
    a_sc = np.diag([kmesh[0] * L, kmesh[1] * L, kmesh[2] * L])
    basis_data = {("H", "tight"): [(0, [(1.3, 1.0), (0.5, 0.4)])]}
    cell = pbcmod.PbcCell(atoms, a_sc, basis="tight",
                          basis_data=basis_data, precision=1e-10)
    if with_translations:
        cell.set_translations(int(np.prod(kmesh)), np.asarray(t_vecs))
    return cell


def test_tr_diff_table_3d():
    """tr_diff[C, D] indexes T_C - T_D for a 2x2x2 product group."""
    cell = _h2_crystal((2, 2, 2), True)
    N = cell.ncells_tr
    t = cell.t_vecs
    ainv = np.linalg.inv(cell.a)
    for C in range(N):
        for D in range(N):
            E = cell.tr_diff[C, D]
            d = (t[C] - t[D] - t[E]) @ ainv
            assert np.allclose(d - np.round(d), 0.0, atol=1e-9)


def test_stripe_3d_one_body_vs_dense():
    """ovlp/hcore via the 3D stripe fast path == dense assembly."""
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    cd = _h2_crystal(km, False)
    assert np.abs(cs.intor_ovlp() - cd.intor_ovlp()).max() < 1e-10
    assert np.abs(cs.intor_hcore() - cd.intor_hcore()).max() < 1e-8


def test_eri_trans_full_vs_dense():
    """eri_trans_full == the dense supercell ERI reindexed into the
    'full' translation format, on a 2x2x1 mesh."""
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    cd = _h2_crystal(km, False)
    eriF = cs.eri_trans_full()
    dense = cd.intor_eri()
    N = cs.ncells_tr
    m = cs.nao_cell
    db = dense.reshape(N, m, N, m, N, m, N, m)
    for R1 in range(N):
        for R2 in range(N):
            for R3 in range(N):
                ref = db[0, :, R1, :, R2, :, R3, :]
                assert np.abs(eriF[R1, R2, R3] - ref).max() < 1e-9, \
                    (R1, R2, R3)


def test_kscf_stripe_vs_dense_hf():
    """k-space stripe HF with translation-ERI JK == dense supercell HF
    (same torus, 2x2x1 mesh)."""
    from libdmet_preview_tpu.models.abinitio import (kscf_stripe_hf,
                                                     _stripe_symm_tr)
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    cd = _h2_crystal(km, False)
    S = cd.intor_ovlp()
    h = cd.intor_hcore()
    eri = cd.intor_eri()
    nsite = cd.nao
    Ham = Integral(nsite, True, False, 0.0, {"cd": h[None]},
                   {"ccdd": eri[None]}, ovlp=S)
    scf = SCF()
    scf.set_system(cd.nelectron, 0, False, True)
    scf.set_integral(Ham)
    E_dense, dm = scf.HF(tol=1e-12, MaxIter=200)

    m = cs.nao_cell
    h_st = _stripe_symm_tr(cs.intor_hcore(), cs.tr_diff, m)
    S_st = _stripe_symm_tr(cs.intor_ovlp(), cs.tr_diff, m)
    eriF = cs.eri_trans_full()
    E_k, rho_st, fock_st = kscf_stripe_hf(h_st, S_st, eriF, cs.tr_diff,
                                          km, cs.nelectron, tol=1e-12)
    assert abs(E_k - E_dense) < 1e-8
    # density stripes match the translation-symmetrized dense density
    rho_dense = _stripe_symm_tr(dm[0] + dm[1], cs.tr_diff, m)
    assert np.abs(rho_st - rho_dense).max() < 1e-6


def test_emb_eri_aft_stripe_vs_dense():
    """Streamed embedding ERI from the cached FT block column (stripe
    fast path + cross-spin variant) == dense-ERI transform."""
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    cd = _h2_crystal(km, False)
    rng = np.random.default_rng(3)
    n = cs.nao
    Ca = rng.normal(size=(n, 3))
    Cb = rng.normal(size=(n, 2))
    dense = cd.intor_eri()
    ref_aa = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", dense,
                       Ca, Ca, Ca, Ca, optimize=True)
    got = cs.get_emb_eri_aft(Ca)
    assert np.abs(got - ref_aa).max() < 1e-8
    ref_ab = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", dense,
                       Ca, Ca, Cb, Cb, optimize=True)
    got_ab = cs.get_emb_eri_aft_cross(Ca, Cb)
    assert np.abs(got_ab - ref_ab).max() < 1e-8


def test_emb_eri_fft_df():
    """Native FFT-DF driver (uniform-grid pair densities + FFT Coulomb
    contraction; the reference's FFTDF embedding-ERI role,
    eri_transform.py get_emb_eri_fft, delegated there to PySCF
    pbc.df.FFTDF) == the analytic AFT driver on a GTH pseudopotential
    cell.  At 2x the cell mesh the measured aliasing error vs the
    gmax-converged AFT is 3.1e-7 (the DEFAULT AFT mesh itself sits at
    3.3e-4 on this cell)."""
    from libdmet_preview_tpu.ints.pbc import PbcCell
    from libdmet_preview_tpu.ints.basisopt import make_gth_valence_basis
    bd = {("H", "tpu-szv"): make_gth_valence_basis("H")}
    cell = PbcCell([("H", (0, 0, 0)), ("H", (1.6, 0, 0))],
                   np.eye(3) * 3.2, basis="tpu-szv", basis_data=bd,
                   unit="B", pseudo="gth-pade", precision=1e-8)
    rng = np.random.default_rng(0)
    C = rng.normal(size=(cell.nao, 2))
    ref = cell.get_emb_eri_aft(C)
    mesh2 = tuple(2 * n + 1 for n in cell.mesh)
    out = cell.get_emb_eri_fft(C, mesh=mesh2)
    assert np.abs(out - ref).max() < 2e-4
    # internal FFT consistency: grid quadrature of the overlap
    pts = cell.grid_coords(mesh2)
    ao = cell.eval_ao_pbc(pts)
    S_grid = ao.T @ ao * (cell.vol / len(pts))
    assert np.abs(S_grid - cell.intor_ovlp()).max() < 1e-5


def test_eri_block_erf_attenuated():
    """The erf(w r)/r attenuated eri_block (MD formalism: Hermite
    exponent alpha -> theta with a sqrt(theta/alpha) prefactor):
    (i) w -> large recovers the bare Coulomb block exactly;
    (ii) bare - erf == the image-summed erfc block at a single zero
    image (independent code path: batched two-kernel R table)."""
    from libdmet_preview_tpu.ints.md import (Shell, eri_block,
                                             eri_block_erfc_tsum)
    np.random.seed(0)
    sh1 = Shell(np.array([0.0, 0.0, 0.0]), 0, [(1.1, 1.0), (0.4, 0.5)])
    sh2 = Shell(np.array([0.8, 0.2, -0.3]), 1, [(0.7, 1.0)])
    bare = eri_block(sh1, sh2, sh2, sh1)
    hi = eri_block(sh1, sh2, sh2, sh1, omega=2000.0)
    assert np.abs(hi - bare).max() < 1e-7  # residual ~ O(1/w^2)
    erf05 = eri_block(sh1, sh2, sh2, sh1, omega=0.5)
    sr = eri_block_erfc_tsum(sh1, sh2, sh2, sh1, (None, None, None),
                             np.zeros((1, 3)), 0.5)
    assert np.abs((bare - erf05) - sr).max() < 1e-10


def test_emb_eri_rs_vs_aft():
    """Range-separated embedding-ERI driver (the reference's MDF role,
    eri_transform.py:566-1087: compact + planewave split; here real-
    space erfc short range via the native erfc_eri_rows C kernel +
    coarse-mesh erf long range) == the analytic AFT driver, including
    the cross-spin variant, on the 2x2x1 stripe torus."""
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    rng = np.random.default_rng(3)
    n = cs.nao
    Ca = rng.normal(size=(n, 3))
    Cb = rng.normal(size=(n, 2))
    ref = cs.get_emb_eri_aft(Ca)
    got = cs.get_emb_eri_rs(Ca, omega=1.0)
    assert np.abs(got - ref).max() < 5e-7
    ref_ab = cs.get_emb_eri_aft_cross(Ca, Cb)
    got_ab = cs.get_emb_eri_rs_cross(Ca, Cb, omega=1.0)
    assert np.abs(got_ab - ref_ab).max() < 5e-7


def test_emb_eri_rs_general_l():
    """RS driver == AFT with p shells in the basis (exercises the
    general-l Hermite contraction path of the native kernel)."""
    from libdmet_preview_tpu.ints import pbc as pbcmod
    L = 5.0
    basis_data = {("H", "sp"): [(0, [(0.9, 1.0)]), (1, [(0.6, 1.0)])]}
    atoms = []
    tvs = []
    for cx in range(2):
        T = np.array([cx * L, 0.0, 0.0])
        tvs.append(T)
        atoms += [("H", T), ("H", T + np.array([0.0, 0.0, 1.4]))]
    cell = pbcmod.PbcCell(atoms, np.diag([2 * L, L, L]), basis="sp",
                          basis_data=basis_data, precision=1e-9)
    cell.set_translations(2, np.asarray(tvs))
    rng = np.random.default_rng(1)
    C = rng.normal(size=(cell.nao, 3))
    ref = cell.get_emb_eri_aft(C)
    got = cell.get_emb_eri_rs(C, omega=0.8)
    assert np.abs(got - ref).max() < 5e-6 * max(1.0, np.abs(ref).max())


def test_eri_trans_full_rs():
    """Range-separated translation-'full' ERI == the G-space
    eri_trans_full on the soft-basis torus (both converged there); the
    RS form is the converged path for sharp bases (intor_eri_rs)."""
    km = (2, 2, 1)
    cs = _h2_crystal(km, True)
    ref = cs.eri_trans_full()
    got = cs.eri_trans_full_rs(omega=1.0)
    assert np.abs(got - ref).max() < 5e-7


def test_intor_eri_rs_sharp_converged():
    """intor_eri_rs is CONVERGED where the default G mesh is not: on a
    sharp-exponent pair the bare-mesh intor_eri is off by ~1.9e-2
    (pair-FT tail exp(-gmax^2/(2 p_max))), while the RS form matches a
    5x-gmax converged G sum to ~1e-10 at a fraction of the cost."""
    from libdmet_preview_tpu.ints.pbc import PbcCell
    bd = {("H", "sharp"): [(0, [(5.4, 1.0)]), (0, [(0.2, 1.0)])]}
    L = 12.0
    cell = PbcCell([("H", (0, 0, 0)), ("H", (1.5, 0, 0))],
                   np.eye(3) * L, basis="sharp", basis_data=bd,
                   unit="B", precision=1e-8)
    e_rs = cell.intor_eri_rs(omega=1.0)
    e_bare = cell.intor_eri()
    # the bare mesh really is underconverged on this fixture...
    assert np.abs(e_rs - e_bare).max() > 1e-3
    # ...and RS matches the expensive converged mesh
    cell_hi = PbcCell([("H", (0, 0, 0)), ("H", (1.5, 0, 0))],
                      np.eye(3) * L, basis="sharp", basis_data=bd,
                      unit="B", precision=1e-8, gmax=3 * cell.gmax)
    e_hi = cell_hi.intor_eri()
    assert np.abs(e_rs - e_hi).max() < 1e-7
