"""
Fused single-program DMET lattice iteration (ops/fastpath.py) vs the
step-by-step facade path (mfd.HF -> embBasis -> transform_h1 ->
FitVcorEmb) on the 1D Hubbard workload.
"""

import numpy as np
import jax.numpy as jnp


def _setup(beta=1000.0):
    import libdmet_preview_tpu.dmet.hubbard as dmet
    Lat = dmet.ChainLattice(18, 2)
    Ham = dmet.Ham(Lat, 4.0)
    Lat.set_Ham(Ham, use_hcore_as_emb_ham=True)
    vcor = dmet.PMInitGuess((2,), 4.0, 0.5)
    # a non-trivial starting point
    rng = np.random.RandomState(3)
    vcor.update(vcor.param + rng.randn(len(vcor.param)) * 0.05)
    return Lat, vcor, beta


def test_fastpath_matches_facade_path():
    from libdmet_preview_tpu.ops import mfd, embham
    from libdmet_preview_tpu.ops.fastpath import make_dmet_iteration
    from libdmet_preview_tpu.ops.fit import FitVcorEmb
    from libdmet_preview_tpu.ops.zlinalg import zrho_fermi
    import copy

    Lat, vcor, beta = _setup()
    step, p0 = make_dmet_iteration(Lat, vcor, 0.5, beta=beta,
                                   fit_max_iter=50)
    neo = 2 * (Lat.nval + Lat.ncore) // 1
    dummy = jnp.zeros((1, 4, 4))
    p_new, err, embH1, rho_R, basis = step(jnp.asarray(p0), dummy)

    # 1. mean field == mfd.HF at the same beta
    rho_ref, mu_ref, E_ref = mfd.HF(Lat, vcor, 0.5, True, beta=beta)
    assert np.max(np.abs(np.asarray(rho_R) - np.asarray(rho_ref))) < 1e-8

    # 2. bath SPAN == library embBasis span (gauge-invariant projector)
    basis_lib = embham.embBasis(Lat, np.asarray(rho_ref))
    B1 = np.asarray(basis).reshape(1, -1, 4)[:, :, 2:]
    B2 = basis_lib.reshape(1, -1, 4)[:, :, 2:]
    P1 = np.einsum("spi, sqi -> spq", B1, B1)
    P2 = np.einsum("spi, sqi -> spq", B2, B2)
    assert np.max(np.abs(P1 - P2)) < 1e-8

    # 3. embH1 spectrum == facade transform (bath-gauge invariant)
    basis_k = Lat.R2k_basis(basis_lib)
    embH1_lib = np.asarray(embham.transform_h1(Lat.getH1(kspace=True),
                                               basis_k))
    w_fast = np.linalg.eigvalsh(np.asarray(embH1))
    w_lib = np.linalg.eigvalsh(embH1_lib)
    assert np.max(np.abs(w_fast - w_lib)) < 1e-8

    # 4. the fused fit == FitVcorEmb on the same basis/target
    #    target: embedding density at a perturbed parameter point
    rng = np.random.RandomState(11)
    dp = rng.randn(len(p0)) * 0.1
    _, _, embH1_p, _, _ = step(jnp.asarray(p0 + dp), dummy)
    r1, _, _ = zrho_fermi(jnp.asarray(embH1_p)[0],
                          jnp.zeros_like(jnp.asarray(embH1_p)[0]),
                          2 * (Lat.ncore + Lat.nval), beta)
    target = np.asarray(r1)[None]

    p_fast, err_fast, embH1_0, _, basis_fast = step(jnp.asarray(p0),
                                                    jnp.asarray(target))
    # exact engine equivalence: ops.fit._fit_cg_finite_t on the same
    # embH1/dV must reproduce the fused fit bit-for-bit (same math)
    from libdmet_preview_tpu.ops.fit import (_fit_cg_finite_t,
                                             get_dV_dparam)
    basis_fast_R = np.asarray(basis_fast).reshape(1, Lat.ncells, 2, 4)
    dV = get_dV_dparam(vcor, basis_fast_R)
    eye = np.broadcast_to(np.eye(4), (1, 4, 4))
    mask = np.ones((1, 4, 4))
    p_eng, err_eng, _ = _fit_cg_finite_t(
        jnp.asarray(p0), jnp.asarray(embH1_0), jnp.asarray(dV),
        jnp.asarray(eye), jnp.asarray(mask), jnp.asarray(target),
        1e-7, 1e-3, (2 * (Lat.ncore + Lat.nval),), beta, 50, 1)
    assert abs(float(err_fast) - float(err_eng)) < 1e-9
    assert np.max(np.abs(np.asarray(p_fast) - np.asarray(p_eng))) < 1e-7

    # the facade FitVcorEmb (device CG + scipy polish) lands in the same
    # basin on the same inputs
    vcor2 = copy.deepcopy(vcor)
    vcor3, err_b, err_lib = FitVcorEmb(target, Lat, basis_fast_R, vcor2,
                                       beta, MaxIter=50)
    assert abs(float(err_fast) - float(err_lib)) < 1e-2
    assert float(err_fast) < err_b  # the fit made progress
