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
