"""
The declared north-star workload (BASELINE.json configs[3]): diamond,
GTH-SZV basis, GTH-PADE pseudopotentials, FULL 3x3x3 k-mesh, with
self-consistent vcor and a CCSD solver -- end to end through the
native integral engine and the AFT-streamed embedding ERIs
(reference pattern: /root/reference/libdmet/test/test_self_consistency.py:240-251
at the nio/hchain scale; the reference runs this class of workload via
PySCF kmf + GDF).

RUN_SLOW-gated: the one-time integral generation is disk-cached under
.cache/ afterwards; its cost is strongly hardware-dependent (~17 min on
the round-3 build host, ~2 h cold on a single-core box) + ~4 min per
DMET iteration.  Internal anchors from
the first completed runs (commit history):
  supercell RHF E/cell    = -10.0930031640
  one-shot DMET(CCSD)     = -10.2082668828
  CONVERGED vcor + CCSD   = -10.2122587074  (E_corr/cell = -0.119256,
                            3 iterations, dVcor 3.2e-5, dE 5.0e-6)
"""

import os

import numpy as np
import pytest


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="~25+ min; set RUN_SLOW=1")
def test_diamond_333_self_consistent():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import libdmet_preview_tpu.dmet.hubbard as dmet
    from libdmet_preview_tpu.models.abinitio import make_diamond_lattice3
    from libdmet_preview_tpu.ops import embham
    from libdmet_preview_tpu.ops.vcor import VcorLocal
    from libdmet_preview_tpu.ops.diis import DIIS
    from libdmet_preview_tpu.solvers import CCSD, SCFSolver

    Lat, meta = make_diamond_lattice3(
        kmesh=(3, 3, 3), precision=1e-12,
        cache_file=os.path.join(os.path.dirname(__file__), os.pardir,
                                ".cache"))
    nsc = Lat.nscsites
    N = Lat.ncells
    E_hf_cell = meta["E_hf"] / N
    assert abs(E_hf_cell - (-10.0930031640)) < 1e-6
    vcor = VcorLocal(True, False, nsc)
    vcor.assign(np.zeros((2, nsc, nsc)))

    # lattice MF == k-space SCF identity
    rho, Mu, res = dmet.RHartreeFock(Lat, vcor, 0.5, None, ires=True)
    assert abs(res["E"] - E_hf_cell) < 1e-7

    # IB HF identity at the 3x3x3 mesh
    ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                              matching=False,
                                              int_bath=True)
    basis_k = Lat.R2k_basis(basis)
    rho_mf = np.asarray(embham.foldRho_k(Lat.rdm1_lo_k, basis_k))
    nel = int(round(np.trace(rho_mf[0])))
    nel += nel % 2
    hf = SCFSolver(restricted=True)
    rhoEmb, EEmb = hf.run(ImpHam, nelec=nel)
    _, E_hfdmet, _ = dmet.transformResults(
        rhoEmb, EEmb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
        int_bath=True, solver=hf, solver_args={"nelec": nel})
    assert abs(E_hfdmet * nsc - E_hf_cell) < 1e-6

    # self-consistent vcor with CCSD
    cc = CCSD(restricted=True, tol=1e-8)
    adiis = DIIS(space=8)
    E_old, conv = None, False
    E = None
    for it in range(8):
        rho, Mu, res = dmet.RHartreeFock(Lat, vcor, 0.5, None, ires=True)
        ImpHam, H1e, basis = dmet.ConstructImpHam(Lat, rho, vcor,
                                                  matching=False,
                                                  int_bath=True)
        rhoEmb, EEmb = cc.run(ImpHam, nelec=nel)
        _, E, n = dmet.transformResults(
            rhoEmb, EEmb, basis, ImpHam, H1e, lattice=Lat, last_dmu=0.0,
            int_bath=True, solver=cc, solver_args={"nelec": nel})
        vcor_new, err = dmet.FitVcor(rhoEmb, Lat, basis, vcor, np.inf,
                                     0.5, MaxIter1=300, MaxIter2=0)
        p_new = np.hstack(vcor_new.param)
        dV = np.max(np.abs(p_new - np.hstack(vcor.param)))
        dE = abs(E * nsc - E_old) if E_old is not None else np.inf
        vcor.update(np.asarray(adiis.update(p_new) if it >= 2 else p_new))
        E_old = E * nsc
        if dE < 1e-5 and dV < 5e-4:
            conv = True
            break
    assert conv, "vcor self-consistency did not converge in 8 iterations"
    # converged internal anchor (first completed run, 3 iterations,
    # dVcor = 3.2e-5, clean CC adjoint): E_cc/cell = -10.2122587074
    assert abs(E * nsc - (-10.2122587074)) < 5e-4
    E_corr = E * nsc - E_hf_cell
    assert -0.3 < E_corr < -0.05
    assert abs(n - 1.0) < 0.05
