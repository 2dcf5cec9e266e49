"""
KS-DFT+U (reference KRKSpU/KUKSpU,
/root/reference/libdmet/routine/krkspu.py:30-216 and kukspu.py:27-230):
the Dudarev simplified rotationally invariant correction on
local-orbital projectors, stacked on the native KS-DFT drivers.

Oracles:
  * U = 0 (or empty U_idx) is EXACTLY the plain KS driver;
  * v_U == dE_U/d(dm) by finite differences (potential/energy pair
    consistency, the property the Dudarev form is defined by);
  * the Dudarev form's fractional-occupation penalty is maximal at half
    occupation and vanishes for idempotent blocks (at fixed tr P), and
    is invariant under unitary rotations of the local block;
  * +U on one site of an H ring pushes converged charge off that site;
  * UKSpU with an AFM guess polarizes a stretched H2 while plain UKS
    with U = 0 stays unpolarized at the same geometry.
"""

import numpy as np
import pytest


def _h_ring(n=6, r=2.0):
    from libdmet_preview_tpu.ints.gto import Mole
    ang = 2 * np.pi * np.arange(n) / n
    R = r / (2 * np.sin(np.pi / n))
    atoms = [("H", (R * np.cos(a), R * np.sin(a), 0.0)) for a in ang]
    return Mole(atoms, basis="sto-6g")


def _lowdin(mol):
    S = mol.intor_ovlp()
    w, v = np.linalg.eigh(S)
    return v @ np.diag(w ** -0.5) @ v.T


def test_u_zero_is_plain_ks():
    from libdmet_preview_tpu.solvers.ksdft import RKS, RKSpU, UKS, UKSpU
    mol = _h_ring(6)
    C = _lowdin(mol)
    e0, dm0 = RKS(mol, xc="lsda", n_rad=40).kernel()
    e1, dm1 = RKSpU(mol, C, [[0, 1]], [0.0], xc="lsda",
                    n_rad=40).kernel()
    assert abs(e1 - e0) < 1e-10
    assert np.abs(dm1 - dm0).max() < 1e-8
    eu0, dmu0 = UKS(mol, xc="lsda", n_rad=40).kernel()
    eu1, dmu1 = UKSpU(mol, C, [], [], xc="lsda", n_rad=40).kernel()
    assert abs(eu1 - eu0) < 1e-10


def test_vu_is_gradient_of_eu():
    """The (E_U, v_U) pair from _plus_u is a consistent energy/potential
    pair: v_U == dE_U/d(dm) by central finite differences."""
    from libdmet_preview_tpu.solvers.ksdft import RKSpU, UKSpU
    mol = _h_ring(4)   # no SCF here: _plus_u is a pure function of dm
    C = _lowdin(mol)
    rng = np.random.RandomState(0)
    n = mol.nao

    ks = RKSpU(mol, C, [[0, 1], [2]], [0.7, 0.3], xc=None, n_rad=20)
    A = rng.randn(n, n)
    dm = A @ A.T * 0.1 + 0.5 * np.eye(n)
    E0, vU = ks._plus_u(dm)
    eps = 1e-6
    fd = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            dp = dm.copy()
            dp[i, j] += eps
            dmn = dm.copy()
            dmn[i, j] -= eps
            fd[i, j] = (ks._plus_u(dp)[0] - ks._plus_u(dmn)[0]) / (2 * eps)
    fd = 0.5 * (fd + fd.T)
    assert np.abs(fd - vU).max() < 1e-7

    uks = UKSpU(mol, C, [[0, 3]], [0.9], xc=None, n_rad=20)
    dmu = np.stack([dm * 0.6, dm * 0.4])
    E0, vU = uks._plus_u(dmu)
    fdu = np.zeros((2, n, n))
    for s in range(2):
        for i in range(n):
            for j in range(n):
                dp = dmu.copy()
                dp[s, i, j] += eps
                dmn = dmu.copy()
                dmn[s, i, j] -= eps
                fdu[s, i, j] = (uks._plus_u(dp)[0]
                                - uks._plus_u(dmn)[0]) / (2 * eps)
        fdu[s] = 0.5 * (fdu[s] + fdu[s].T)
    assert np.abs(fdu - vU).max() < 1e-7


def test_eu_penalizes_fractional_occupation():
    """The reference's Dudarev form E = U/2 (tr P - tr P^2 / 2)
    (krkspu.py:95) = U/4 tr P + U/4 sum n(1-n): at FIXED local particle
    number the fractional-occupation penalty U/4 sum n(1-n) is what
    remains, maximal at half occupation, zero when idempotent."""
    from libdmet_preview_tpu.solvers.ksdft import _dudarev
    U = 4.0
    E_idem, _ = _dudarev(np.diag([1.0, 0.0]), U)     # tr P = 1
    E_half, _ = _dudarev(np.diag([0.5, 0.5]), U)     # tr P = 1
    assert abs(E_idem - U / 4.0) < 1e-14             # linear term only
    assert abs(E_half - (U / 4.0 + U / 4.0 * 0.5)) < 1e-14
    assert E_half > E_idem
    # rotational invariance: any unitary on the block leaves E unchanged
    rng = np.random.RandomState(0)
    A = rng.randn(3, 3)
    Q = np.linalg.qr(A)[0]
    P = np.diag([0.9, 0.4, 0.1])
    E1, _ = _dudarev(P, U)
    E2, _ = _dudarev(Q @ P @ Q.T, U)
    assert abs(E1 - E2) < 1e-12


def test_rkspu_pushes_charge_off_u_site():
    """+U on ONE site of an H ring: the converged charge migrates off
    the penalized site (the self-consistent response to v_U), and the
    total energy carries a positive E_U."""
    from libdmet_preview_tpu.solvers.ksdft import RKS, RKSpU
    mol = _h_ring(6, r=2.0)
    C = _lowdin(mol)
    S = mol.intor_ovlp()
    SC = S @ C

    ks0 = RKS(mol, xc="lsda", n_rad=40)
    e0, dm0 = ks0.kernel()
    ksu = RKSpU(mol, C, [[0]], [3.0], xc="lsda", n_rad=40)
    eu, dmu = ksu.kernel()
    assert ks0.converged and ksu.converged

    def occ0(dm):
        return float(SC[:, 0].T @ dm @ SC[:, 0])

    assert occ0(dmu) < occ0(dm0) - 1e-3
    assert ksu.E_U > 0.0
    assert eu > e0


def test_ukspu_polarizes_stretched_h2():
    """Stretched H2 + on-site U with an AFM guess: UKSpU localizes
    opposite spins (|m| > 0.3) while the restricted density stays
    unpolarized; the reference uses KUKSpU for exactly this AFM
    symmetry breaking (nio_afm workload)."""
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.solvers.ksdft import UKSpU
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 3.2))], basis="sto-6g")
    C = _lowdin(mol)
    uks = UKSpU(mol, C, [[0], [1]], [2.0, 2.0], xc="lsda", n_rad=40,
                nelec=(1, 1))
    # AFM initial guess: up on site 0, down on site 1
    dm0 = np.zeros((2, 2, 2))
    dm0[0, 0, 0] = 1.0
    dm0[1, 1, 1] = 1.0
    e, dm = uks.kernel(dm0=dm0)
    assert uks.converged
    S = mol.intor_ovlp()
    SC = S @ C
    m = [float((SC[:, i].T @ (dm[0] - dm[1]) @ SC[:, i])) for i in (0, 1)]
    assert m[0] > 0.3 and m[1] < -0.3
    assert abs(m[0] + m[1]) < 1e-6
