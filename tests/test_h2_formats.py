"""
Interacting-bath embedding transforms for the 'nearest' / 'full' /
'spin local' lattice-ERI formats (ops/embham.py) -- capability BEYOND the
reference, which raises NotImplementedError for these
(/root/reference/libdmet/routine/slater.py:405-427).

Oracle: brute-force expansion of the translation-invariant ERI to the
full supercell tensor and direct contraction with the embedding basis.
End-to-end: extended-Hubbard (U, V) chain DMET with interacting bath --
the V=0 nearest-format run must match the local-format run exactly, and
the V>0 energy must be close to exact diagonalization.
"""

import numpy as np
import pytest


def _rand_basis(spin, ncells, nlo, neo, seed=0):
    rng = np.random.RandomState(seed)
    B = rng.randn(spin, ncells, nlo, neo)
    return B


def _expand_nearest(eri_R):
    ncells, n = eri_R.shape[0], eri_R.shape[1]
    ns = ncells * n
    big = np.zeros((ns,) * 4)
    for C in range(ncells):
        for R in range(ncells):
            D = (C + R) % ncells
            big[C * n:(C + 1) * n, C * n:(C + 1) * n,
                D * n:(D + 1) * n, D * n:(D + 1) * n] += eri_R[R]
    return big


def _expand_full(eri_F):
    ncells, n = eri_F.shape[0], eri_F.shape[3]
    ns = ncells * n
    big = np.zeros((ns,) * 4)
    for C in range(ncells):
        for R1 in range(ncells):
            for R2 in range(ncells):
                for R3 in range(ncells):
                    C1, C2, C3 = [(C + R) % ncells for R in (R1, R2, R3)]
                    big[C * n:(C + 1) * n, C1 * n:(C1 + 1) * n,
                        C2 * n:(C2 + 1) * n, C3 * n:(C3 + 1) * n] \
                        += eri_F[R1, R2, R3]
    return big


def test_transform_eri_nearest_vs_bruteforce():
    from libdmet_preview_tpu.ops.embham import transform_eri_nearest
    rng = np.random.RandomState(3)
    ncells, nlo, neo = 4, 2, 3
    eri_R = rng.randn(ncells, nlo, nlo, nlo, nlo) * 0.3
    for spin in (1, 2):
        B = _rand_basis(spin, ncells, nlo, neo, seed=spin)
        out = transform_eri_nearest(B, eri_R)
        big = _expand_nearest(eri_R)
        Bf = B.reshape(spin, ncells * nlo, neo)
        pairs = [(0, 0)] if spin == 1 else [(0, 0), (1, 1), (0, 1)]
        for m, (s1, s2) in enumerate(pairs):
            ref = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", big,
                            Bf[s1], Bf[s1], Bf[s2], Bf[s2], optimize=True)
            assert np.abs(out[m] - ref).max() < 1e-11


def test_transform_eri_full_vs_bruteforce():
    from libdmet_preview_tpu.ops.embham import transform_eri_full
    rng = np.random.RandomState(5)
    ncells, nlo, neo = 3, 2, 3
    eri_F = rng.randn(ncells, ncells, ncells, nlo, nlo, nlo, nlo) * 0.2
    B = _rand_basis(1, ncells, nlo, neo, seed=9)
    out = transform_eri_full(B, eri_F)
    big = _expand_full(eri_F)
    Bf = B.reshape(1, ncells * nlo, neo)
    ref = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", big,
                    Bf[0], Bf[0], Bf[0], Bf[0], optimize=True)
    assert np.abs(out[0] - ref).max() < 1e-11


def test_transform_eri_spin_local_vs_bruteforce():
    from libdmet_preview_tpu.ops.embham import transform_eri_spin_local
    rng = np.random.RandomState(7)
    ncells, nlo, neo = 4, 2, 3
    eri_S = rng.randn(3, nlo, nlo, nlo, nlo) * 0.3
    B = _rand_basis(2, ncells, nlo, neo, seed=11)
    out = transform_eri_spin_local(B, eri_S)
    pairs = [(0, 0), (1, 1), (0, 1)]
    for m, (s1, s2) in enumerate(pairs):
        big = np.zeros((ncells * nlo,) * 4)
        for C in range(ncells):
            big[C * nlo:(C + 1) * nlo, C * nlo:(C + 1) * nlo,
                C * nlo:(C + 1) * nlo, C * nlo:(C + 1) * nlo] = eri_S[m]
        Bf = B.reshape(2, ncells * nlo, neo)
        ref = np.einsum("pqrs, pi, qj, rk, sl -> ijkl", big,
                        Bf[s1], Bf[s1], Bf[s2], Bf[s2], optimize=True)
        assert np.abs(out[m] - ref).max() < 1e-11


def _run_ib_dmet(Lat, Ham, U, max_iter=8):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.solvers import FCI
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess((Lat.nscsites,), U, 0.5)
    solver = FCI(restricted=True, tol=1e-11)
    mu_solver = dmet.MuSolver(adaptive=True)
    Mu, last_dmu, E = U * 0.5, 0.0, None
    for it in range(max_iter):
        rho, Mu, res = dmet.RHartreeFock(Lat, vcor, 0.5, Mu, ires=True)
        # charge self-consistency: rebuilds the lattice Fock (now
        # supported for the 'nearest' format) + stores the density for
        # the interacting-bath JK double counting
        Lat.update_Ham(np.asarray(rho) * 2.0)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=True)
        ImpHam = dmet.apply_dmu(Lat, ImpHam, basis, last_dmu)
        # capped at the total electron count (reference
        # test_self_consistency.py:186 solver_args)
        nel_tot = int(round(Lat.ncells * Lat.nscsites))
        solver_args = {"nelec": min((Lat.ncore + Lat.nval) * 2, nel_tot)}
        rhoEmb, EnergyEmb, ImpHam, dmu = mu_solver(
            Lat, 0.5, ImpHam, basis, solver, solver_args)
        last_dmu += dmu
        _, E, _ = dmet.transformResults(
            rhoEmb, EnergyEmb, basis, ImpHam, H1e, lattice=Lat,
            last_dmu=last_dmu, int_bath=True, solver=solver,
            solver_args=solver_args)
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     0.5, MaxIter1=200, MaxIter2=0)
        vcor.update(np.hstack(vcor_new.param))
    return float(E)


def test_extended_hubbard_ib_dmet():
    """(U, V) chain with interacting bath: V=0 nearest-format == the
    local-format result; V>0 lands near exact diagonalization."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.hamiltonian import (HubbardExtended,
                                                        HubbardHamiltonian)
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI
    U, V = 4.0, 1.0

    Lat1 = dmet.ChainLattice(6, 2)
    E_local = _run_ib_dmet(Lat1, HubbardHamiltonian(Lat1, U), U)
    Lat2 = dmet.ChainLattice(6, 2)
    E_near0 = _run_ib_dmet(Lat2, HubbardExtended(Lat2, U, 0.0), U)
    assert abs(E_local - E_near0) < 1e-9

    Lat3 = dmet.ChainLattice(6, 2)
    E_uv = _run_ib_dmet(Lat3, HubbardExtended(Lat3, U, V), U)

    # exact diagonalization of the 6-site (U, V) ring
    Lat4 = dmet.ChainLattice(6, 6)
    Ham4 = HubbardExtended(Lat4, U, V)
    from libdmet_preview_tpu.ops.embham import transform_eri_nearest
    eri_R = np.asarray(Ham4.getH2())
    ncells, n = eri_R.shape[0], eri_R.shape[1]
    Bid = np.eye(ncells * n).reshape(1, ncells, n, ncells * n)
    eri_full = transform_eri_nearest(Bid, eri_R)
    h_full = Lat4.expand(np.asarray(Ham4.getH1())[None])[0]
    HamI = Integral(6, True, False, 0.0, {"cd": h_full[None]},
                    {"ccdd": eri_full})
    fci = FCI(restricted=True, tol=1e-11)
    rdm, E_ed = fci.run(HamI, nelec=6)
    E_ed_site = E_ed / 6.0

    # whole-lattice impurity: DMET(IB) == ED exactly (sharp oracle for
    # the nearest-format embedding Hamiltonian + energy functional)
    Lat5 = dmet.ChainLattice(6, 6)
    E_whole = _run_ib_dmet(Lat5, HubbardExtended(Lat5, U, V), U,
                           max_iter=1)
    assert abs(E_whole - E_ed_site) < 1e-8

    # 2-site-impurity DMET lands near ED, and V moved the physics up
    assert abs(E_uv - E_ed_site) < 0.1
    assert E_uv > E_local + 0.05
