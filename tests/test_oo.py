"""
Orbital-optimized MP2 / CCD solvers (reference solver/scf_solver.py
oomp2/ooccd modes; mp.py:147-233 MP2AsFCISolver).

Oracles:
  * Thouless: OO-CCD == FCI exactly for any 2-electron system (the
    occ-virt rotation absorbs the missing singles).
  * variational descent: E_OO <= E at HF orbitals; exact analytic
    orbital gradient vs finite differences (validates the mp2-residual
    threading through the custom-vjp adjoint).
  * MP2-as-active-space-solver: CASCI composed with the MP2 solver
    (the reference's MP2AsFCISolver role).
"""

import numpy as np
import pytest

from libdmet_preview_tpu.models.integral import Integral
from libdmet_preview_tpu.solvers import (FCI, MP2, CCD, OOMP2, OOCCD,
                                         CASCI)


def _ham_restricted(n=4, U=2.0, H0=0.3):
    rng = np.random.RandomState(7)
    h = np.zeros((n, n))
    for i in range(n - 1):
        h[i, i + 1] = h[i + 1, i] = -1.0
    h += np.diag([0.0, 0.4, -0.3, 0.2][:n])
    g = np.zeros((n, n, n, n))
    for i in range(n):
        g[i, i, i, i] = U
    p = 0.1 * rng.rand(n, n, n, n)
    p = p + p.transpose(1, 0, 2, 3)
    p = p + p.transpose(0, 1, 3, 2)
    p = p + p.transpose(2, 3, 0, 1)
    g += 0.05 * p
    return Integral(n, True, False, H0, {"cd": h[None]}, {"ccdd": g[None]})


def test_ooccd_equals_fci_two_electrons():
    Ham = _ham_restricted()
    nelec = 2
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=nelec)
    _, E_ccd = CCD(restricted=True).run(Ham, nelec=nelec)

    oo = OOCCD(restricted=True, oo_gtol=1e-8)
    rdm, E_oo = oo.run(Ham, nelec=nelec)
    assert oo.oo_converged
    # plain CCD misses the singles channel; OO recovers FCI (Thouless)
    assert abs(E_oo - E_fci) < 1e-7
    assert E_oo < E_ccd - 1e-8
    assert abs(2.0 * np.trace(rdm[0]) - nelec) < 1e-8
    # DMET-energy re-evaluation reproduces the total energy
    assert abs(oo.run_dmet_ham(Ham) - E_oo) < 1e-7


def test_oomp2_descends_and_gradient_exact():
    import jax
    import jax.numpy as jnp
    Ham = _ham_restricted()
    nelec = 4
    _, E_mp2 = MP2(restricted=True).run(Ham, nelec=nelec)

    oo = OOMP2(restricted=True, oo_gtol=1e-7)
    rdm, E_oo = oo.run(Ham, nelec=nelec)
    assert oo.oo_converged
    assert E_oo < E_mp2 + 1e-12

    # analytic orbital gradient at kappa=0 (HF orbitals) vs finite diff:
    # exercises the mp2 residual through amplitude + adjoint solves
    from jax.scipy.linalg import expm as jexpm
    from libdmet_preview_tpu.solvers.cc import _e_tot_cc
    from libdmet_preview_tpu.solvers.scf import SCF
    n = Ham.norb
    na = nelec // 2
    scf = SCF()
    scf.set_system(nelec, 0, False, True)
    scf.set_integral(Ham)
    scf.HF(tol=1e-12, MaxIter=200, InitGuess=None)
    C = jnp.asarray(scf.mo_coeff[0])
    h1a, h1b, g_aa, g_bb, g_ab = OOMP2._unpack(Ham)
    jh = tuple(jnp.asarray(x) for x in (h1a, h1b, g_aa, g_bb, g_ab))
    opts = oo._opts()
    rows = np.repeat(np.arange(na), n - na)
    cols = np.tile(np.arange(na, n), na)

    def e_k(p):
        K = jnp.zeros((n, n)).at[rows, cols].set(p)
        K = K - K.T
        Cr = C @ jexpm(K)
        return _e_tot_cc(*jh, Cr, Cr, na, na, opts)

    npar = len(rows)
    g_ana = np.asarray(jax.grad(e_k)(jnp.zeros(npar)))
    eps = 1e-5
    for k in range(npar):
        d = np.zeros(npar)
        d[k] = eps
        g_num = (float(e_k(jnp.asarray(d))) - float(e_k(jnp.asarray(-d)))) \
            / (2 * eps)
        assert abs(g_ana[k] - g_num) < 1e-6, (k, g_ana[k], g_num)


def test_ooccd_unrestricted_two_electrons():
    rng = np.random.RandomState(3)
    n = 4
    h = np.zeros((n, n))
    for i in range(n - 1):
        h[i, i + 1] = h[i + 1, i] = -1.0
    stag = np.diag([0.3, -0.3, 0.3, -0.3])
    g = np.zeros((n, n, n, n))
    for i in range(n):
        g[i, i, i, i] = 2.0
    Ham = Integral(n, False, False, 0.0,
                   {"cd": np.array([h + stag, h - stag])},
                   {"ccdd": np.array([g, g, g])})
    nelec = 2
    _, E_fci = FCI(restricted=False, Sz=0, tol=1e-12).run(Ham, nelec=nelec)
    oo = OOCCD(restricted=False, Sz=0, oo_gtol=1e-8)
    rdm, E_oo = oo.run(Ham, nelec=nelec)
    assert oo.oo_converged
    assert abs(E_oo - E_fci) < 1e-6
    assert abs(np.trace(rdm[0]) + np.trace(rdm[1]) - nelec) < 1e-8


def test_mp2_as_casci_active_solver():
    """CASCI with the MP2 solver in the active window (reference
    MP2AsFCISolver, mp.py:147): full-window composition reproduces the
    standalone MP2 energy."""
    Ham = _ham_restricted()
    nelec = 4
    _, E_mp2 = MP2(restricted=True).run(Ham, nelec=nelec)
    cas = CASCI(Ham.norb, nelec, fcisolver=MP2(restricted=True))
    _, E_cas = cas.run(Ham, nelec=nelec)
    assert abs(E_cas - E_mp2) < 1e-8


def test_ooccd_ghf_frame_two_electrons():
    """GHF-frame OO-CCD (the reference's GHF-based ooccd mode,
    scf_solver.py with ghf=True): on the spin-orbital expansion of the
    restricted Hamiltonian, OO-CCD == FCI at 2 electrons."""
    Ham = _ham_restricted()
    n = Ham.norb
    nso = 2 * n
    h = Ham.H1["cd"][0]
    g = Ham.H2["ccdd"][0]
    H1_so = np.zeros((nso, nso))
    H1_so[:n, :n] = h
    H1_so[n:, n:] = h
    g_so = np.zeros((nso,) * 4)
    a, b = slice(0, n), slice(n, nso)
    for s1 in (a, b):
        for s2 in (a, b):
            g_so[s1, s1, s2, s2] = g
    GHam = Integral(nso, True, False, float(Ham.H0),
                    {"cd": H1_so[None]}, {"ccdd": g_so[None]})
    nelec = 2

    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=nelec)
    _, E_gfci = FCI(restricted=True, ghf=True, tol=1e-12).run(
        GHam, nelec=nelec)
    assert abs(E_gfci - E_fci) < 1e-9

    oo = OOCCD(ghf=True, oo_gtol=1e-8)
    rdm, E_oo = oo.run(GHam, nelec=nelec)
    assert oo.oo_converged
    assert abs(E_oo - E_fci) < 1e-6
    assert abs(np.trace(rdm[0]) - nelec) < 1e-8
