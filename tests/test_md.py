"""
General-angular-momentum integral engine (ints/md.py).

Oracles:
  * s-only shells reproduce the validated s engine (ints/gto.py) exactly;
  * p and d integrals match center-derivatives of lower-l integrals
    (a Cartesian x^k Gaussian is an exact derivative of x^{k-1}/x^{k-2}
    Gaussians w.r.t. the center) -- machine-precision, self-contained;
  * H2O/STO-3G RHF reproduces the PySCF-documented quickstart energy
    -74.9611711378677 (geometry O(0,0,0) H(0,0,1A) H(0,1A,0)).
"""

import numpy as np


def test_md_matches_s_engine():
    from libdmet_preview_tpu.ints.gto import Mole
    from libdmet_preview_tpu.ints.md import MoleGeneral
    atoms = [("H", (0.1, -0.2, 0)), ("H", (0.3, 0.2, 1.4))]
    m1 = Mole(atoms, basis="3-21g")
    m2 = MoleGeneral(atoms, basis="3-21g")
    assert np.abs(m1.intor_ovlp() - m2.intor_ovlp()).max() < 1e-14
    assert np.abs(m1.intor_kin() - m2.intor_kin()).max() < 1e-14
    assert np.abs(m1.intor_nuc() - m2.intor_nuc()).max() < 1e-13
    assert np.abs(m1.intor_eri() - m2.intor_eri()).max() < 1e-13


def _num_der(fn, A, d, h=1e-5):
    Ap, Am = A.copy(), A.copy()
    Ap[d] += h
    Am[d] -= h
    return (fn(Ap) - fn(Am)) / (2 * h)


def test_p_and_d_derivative_oracle():
    from libdmet_preview_tpu.ints.md import (Shell, ovlp_block, kin_block,
                                             nuc_block, eri_block,
                                             norm_cart)
    a_exp = 0.8
    A = np.array([0.1, -0.3, 0.2])
    B = np.array([1.0, 0.5, -0.4])
    C = np.array([-0.6, 0.8, 1.1])
    D = np.array([0.4, -0.9, 0.3])
    charges = [1.0, 2.0]
    coords = [np.array([0.5, 0.5, 0.5]), np.array([-1.0, 0.0, 0.0])]
    shB = Shell(B, 0, [(0.5, 1.0)])
    shC = Shell(C, 0, [(1.2, 1.0)])
    shD = Shell(D, 0, [(0.9, 1.0)])

    ops = {
        "S": lambda sh: ovlp_block(sh, shB),
        "T": lambda sh: kin_block(sh, shB),
        "V": lambda sh: nuc_block(sh, shB, charges, coords),
        "Verf": lambda sh: nuc_block(sh, shB, charges, coords, eta=0.7,
                                     screen="erf"),
        "ERI": lambda sh: eri_block(sh, shB, shC, shD),
    }
    Ns = norm_cart(a_exp, (0, 0, 0))
    Np = norm_cart(a_exp, (1, 0, 0))
    scale_p = Np / (Ns * 2 * a_exp)
    for name, fn in ops.items():
        ana = np.asarray(fn(Shell(A, 1, [(a_exp, 1.0)])))
        for d in range(3):
            num = _num_der(lambda Ax: np.asarray(
                fn(Shell(Ax, 0, [(a_exp, 1.0)])))[0], A, d) * scale_p
            assert np.abs(ana[d] - num).max() < 5e-9, (name, d)

    # d shells (shell components share the (l,0,0) coefficient, so every
    # d component carries N_d = norm_cart(a, (2,0,0))):
    #   d_xx = [dA_x(p_x)/N_p + s/N_s] * N_d / (2a)
    #   d_xy =  dA_x(p_y)/N_p         * N_d / (2a)
    Nd = norm_cart(a_exp, (2, 0, 0))
    for name in ("S", "V", "ERI"):
        fn = ops[name]
        ana = np.asarray(fn(Shell(A, 2, [(a_exp, 1.0)])))
        s_val = np.asarray(fn(Shell(A, 0, [(a_exp, 1.0)])))[0]
        der_px_x = _num_der(lambda Ax: np.asarray(
            fn(Shell(Ax, 1, [(a_exp, 1.0)])))[0], A, 0)
        num_xx = (der_px_x / Np + s_val / Ns) * Nd / (2 * a_exp)
        assert np.abs(ana[0] - num_xx).max() < 5e-8, name
        der_py_x = _num_der(lambda Ax: np.asarray(
            fn(Shell(Ax, 1, [(a_exp, 1.0)])))[1], A, 0)
        num_xy = der_py_x / Np * Nd / (2 * a_exp)
        assert np.abs(ana[1] - num_xy).max() < 5e-8, name


def test_h2o_sto3g_rhf_anchor():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ints.md import MoleGeneral
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF
    A = 1.0 / 0.52917720859
    mol = MoleGeneral([("O", (0, 0, 0)), ("H", (0, 0, A)),
                       ("H", (0, A, 0))], basis="sto-3g")
    Ham = Integral(mol.nao, True, False, mol.energy_nuc(),
                   {"cd": mol.intor_hcore()[None]},
                   {"ccdd": mol.intor_eri()[None]}, ovlp=mol.intor_ovlp())
    m = SCF()
    m.set_system(10, 0, False, True)
    m.set_integral(Ham)
    E, _ = m.HF(tol=1e-12, MaxIter=200)
    assert abs(E - (-74.9611711378677)) < 1e-8
