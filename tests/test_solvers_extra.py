"""
CASCI, external-solver bridge, profiling, config
(reference analogs: solver/dmrgci.py CASCI, solver/block.py bridge,
SURVEY 5 aux subsystems).
"""

import os
import numpy as np
import pytest


def test_casci_full_space_equals_fci():
    """CASCI with the full space as active == FCI."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.solvers.casci import CASCI
    Ham = hubbard_integral(4, U=4.0, restricted=True)
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    cas = CASCI(ncas=4, nelecas=4)
    rdm1, E_cas = cas.run(Ham, nelec=4)
    assert abs(E_cas - E_fci) < 1e-9
    assert abs(np.trace(rdm1[0]) * 2 - 4) < 1e-8


def test_casci_frozen_core_sane():
    """CASCI(2,2) on a gapped 4-orbital system: between HF and FCI."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import random_integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    from libdmet_preview_tpu.solvers.casci import CASCI
    Ham = random_integral(4, restricted=True, seed=7)
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    _, E_hf = SCFSolver(restricted=True).run(Ham, nelec=4)
    cas = CASCI(ncas=2, nelecas=2)
    _, E_cas = cas.run(Ham, nelec=4)
    assert E_fci - 1e-9 <= E_cas <= E_hf + 1e-9


def test_external_bridge_roundtrip(tmp_path):
    """Bridge mechanics with a stub 'solver' script: FCIDUMP is written,
    the subprocess runs, energy is parsed, rdm1 is read back."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    from libdmet_preview_tpu.solvers.external import ExternalFCIDUMPSolver
    script = tmp_path / "fake_solver.py"
    script.write_text(
        "import sys, numpy as np\n"
        "assert open(sys.argv[1]).readline().startswith(' &FCI')\n"
        "np.savetxt(sys.argv[2] + '/rdm1.txt', np.eye(4) * 0.5)\n"
        "print('converged E = -2.718281828')\n")
    solver = ExternalFCIDUMPSolver(
        ["python", str(script), "{fcidump}", "{workdir}"],
        energy_pattern=r"E\s*=\s*([-\d.eE+]+)",
        rdm1_file="rdm1.txt", workdir=str(tmp_path / "run"))
    Ham = hubbard_integral(4, U=1.0, restricted=True)
    rdm1, E = solver.run(Ham, nelec=4)
    assert abs(E - (-2.718281828)) < 1e-12
    assert rdm1.shape == (1, 4, 4)
    assert abs(rdm1[0, 0, 0] - 0.25) < 1e-12


def test_profile_and_config():
    from libdmet_preview_tpu.utils import profile
    from libdmet_preview_tpu.utils.config import DmetConfig
    import jax.numpy as jnp
    with profile.phase("test_phase"):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        x.block_until_ready()
    stats = profile.report(reset=True)
    assert stats["test_phase"]["calls"] == 1
    cfg = DmetConfig(filling=0.5, solver="CCSD").validate()
    assert cfg.int_bath
    with pytest.raises(AssertionError):
        DmetConfig(solver="NOPE").validate()


def test_project_active_space():
    """Active-space projection (reference slater.py:2121 projectors):
    full-window projection reproduces FCI exactly; partial window matches
    the CASCI solver."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.solvers.casci import (CASCI,
                                                   project_active_space)
    Ham = hubbard_integral(4, U=3.0, restricted=True)
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    # full window == exact
    Ham_full, info = project_active_space(Ham, nelec=4, ncas=4, nelecas=4)
    _, E_proj = FCI(restricted=True, tol=1e-12).run(Ham_full, nelec=4)
    assert abs(E_proj - E_fci) < 1e-9
    # partial window: FCI on the projected Integral uses the SAME canonical
    # orbitals as CASCI's internal projection -> energies agree when
    # CASCI's natural-orbital step is bypassed by using canonical orbitals
    Ham_cas, info = project_active_space(Ham, nelec=4, ncas=2, nelecas=2)
    _, E_small = FCI(restricted=True, tol=1e-12).run(Ham_cas, nelec=2)
    # sanity: between HF and FCI
    from libdmet_preview_tpu.solvers.scf import SCFSolver
    _, E_hf = SCFSolver(restricted=True).run(Ham, nelec=4)
    assert E_fci - 1e-9 <= E_small <= E_hf + 1e-9


def test_afqmc_dqmc_dumps(tmp_path):
    """Solver-specific Hamiltonian dumps (reference afqmc.py dumpH1/H2,
    dqmc.py Cholesky h5): roundtrip and factorization exactness."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import hubbard_integral
    from libdmet_preview_tpu.solvers.external import (
        dump_afqmc_ham, read_afqmc_ham, dump_dqmc_cholesky,
        read_dqmc_cholesky)
    Ham = hubbard_integral(4, U=4.0, restricted=True)
    p = tmp_path / "afqmc.txt"
    U = dump_afqmc_ham(str(p), Ham)
    H1, U2, H0 = read_afqmc_ham(str(p))
    assert np.allclose(U2, 4.0) and np.allclose(U, U2)
    assert np.allclose(H1[0], np.asarray(Ham.H1["cd"][0]))
    assert H0 == float(Ham.H0)
    ph5 = tmp_path / "dqmc.h5"
    rank = dump_dqmc_cholesky(str(ph5), Ham, tol=1e-12)
    h1, L, e0 = read_dqmc_cholesky(str(ph5))
    from libdmet_preview_tpu.models.integral import restore_eri
    g = restore_eri(np.asarray(Ham.H2["ccdd"][0]), 4, 1)
    g_rec = np.einsum("xpq, xrs -> pqrs", L, L)
    assert np.abs(g_rec - g).max() < 1e-10
    assert rank == L.shape[0]


def test_casscf():
    """CASSCF (orbital-optimized CASCI): full active space == FCI from
    ANY starting orbitals; a (2,2) active space improves on CASCI(2,2)
    and stays variational (>= FCI)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import random_integral
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.solvers.casci import CASCI, CASSCF
    Ham = random_integral(4, restricted=True, seed=11)
    _, E_fci = FCI(restricted=True, tol=1e-12).run(Ham, nelec=4)
    # full window: exact regardless of rotations
    mc_full = CASSCF(ncas=4, nelecas=4, max_cycle=60)
    _, E_full = mc_full.run(Ham, nelec=4)
    assert abs(E_full - E_fci) < 1e-8
    # (2,2): at least as good as CASCI(2,2), never below FCI
    _, E_casci = CASCI(ncas=2, nelecas=2).run(Ham, nelec=4)
    mc = CASSCF(ncas=2, nelecas=2, max_cycle=25, tol=1e-6)
    rdm1, E_mc = mc.run(Ham, nelec=4)
    assert E_mc <= E_casci + 1e-10
    assert E_mc >= E_fci - 1e-9
    assert abs(np.trace(rdm1[0]) * 2 - 4) < 1e-8


def test_casci_make_rdm2_energy_consistency():
    """CASCI.make_rdm2: (rdm1, rdm2) contracted with (h1, g, H0)
    reproduce e_tot exactly (validates the analytic core-core and
    core-active rdm2 contributions), and the full-active-space rdm2
    matches FCI's."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cc import random_integral
    from libdmet_preview_tpu.models.integral import restore_eri
    from libdmet_preview_tpu.solvers import FCI
    from libdmet_preview_tpu.solvers.casci import CASCI
    Ham = random_integral(4, restricted=True, seed=7)
    h1 = np.asarray(Ham.H1["cd"][0])
    g = restore_eri(np.asarray(Ham.H2["ccdd"][0]), 4, 1)

    # frozen-core CASCI: energy from the RDMs == e_tot
    cas = CASCI(ncas=2, nelecas=2)
    rdm1, E_cas = cas.run(Ham, nelec=4)
    G = cas.make_rdm2()[0]
    E_from_rdm = (2.0 * np.einsum("pq, qp", h1, rdm1[0])
                  + 0.5 * np.einsum("pqrs, pqrs", g, G)
                  + float(Ham.H0))
    assert abs(E_from_rdm - E_cas) < 1e-9
    # symmetries of the spin-summed 2-RDM
    assert np.abs(G - G.transpose(1, 0, 3, 2)).max() < 1e-9
    assert np.abs(G - G.transpose(2, 3, 0, 1)).max() < 1e-9
    # run_dmet_ham reproduces the energy on the same Hamiltonian
    assert abs(cas.run_dmet_ham(Ham) - E_cas) < 1e-9

    # full-active-space CASCI rdm2 == FCI rdm2
    fci = FCI(restricted=True, tol=1e-12)
    rdm1_f, E_fci = fci.run(Ham, nelec=4)
    G_fci = fci.make_rdm2(Ham)[0]
    cas_full = CASCI(ncas=4, nelecas=4)
    cas_full.run(Ham, nelec=4)
    G_full = cas_full.make_rdm2()[0]
    assert abs(cas_full.e_tot - E_fci) < 1e-9
    E_full = (2.0 * np.einsum("pq, qp", h1, cas_full.onepdm[0])
              + 0.5 * np.einsum("pqrs, pqrs", g, G_full) + float(Ham.H0))
    assert abs(E_full - E_fci) < 1e-9


def test_ucasci_full_space_equals_uhf_fci():
    """UCASCI (unrestricted CASCI, reference UHF-orbital CAS stack
    dmrgci.py/umc1step.py roles) on a staggered-field Hubbard chain:
    full active space == spin-dependent FCI; partial window bracketed
    by UHF and FCI; the spin-resolved CAS 2-RDM decomposition
    reproduces the total energy through run_dmet_ham exactly."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, SCFSolver, UCASCI

    n, nelec, t, U, h = 6, 6, 1.0, 4.0, 0.4
    h0 = np.zeros((n, n))
    for i in range(n - 1):
        h0[i, i + 1] = h0[i + 1, i] = -t
    stag = np.diag([h * (-1) ** i for i in range(n)])
    g = np.zeros((n, n, n, n))
    for i in range(n):
        g[i, i, i, i] = U
    Ham = Integral(n, False, False, 0.3,
                   {"cd": np.array([h0 + stag, h0 - stag])},
                   {"ccdd": np.array([g, g, g])})

    _, E_fci = FCI(restricted=False, Sz=0, tol=1e-12).run(Ham, nelec=nelec)
    _, E_hf = SCFSolver(restricted=False).run(Ham, nelec=nelec)

    cas_full = UCASCI(n, nelec)
    _, E_full = cas_full.run(Ham, nelec=nelec)
    assert abs(E_full - E_fci) < 1e-8
    assert abs(cas_full.run_dmet_ham(Ham) - E_fci) < 1e-8

    cas = UCASCI(4, 4)
    rdm, E = cas.run(Ham, nelec=nelec)
    assert E_fci - 1e-9 <= E <= E_hf + 1e-9
    assert abs(np.trace(rdm[0]) + np.trace(rdm[1]) - nelec) < 1e-9
    assert abs(cas.run_dmet_ham(Ham) - E) < 1e-8


def test_gcasci_gso_frame():
    """GSO-frame CASCI (reference gcasci.py / gso_dmrgci.py roles): on
    the ph-transformed 4-site Hubbard ring, (i) a full active space
    reproduces the spinless FCI energy and rdm1 exactly, (ii) the
    frozen-core variant is variational and internally RDM-consistent
    (run_dmet_ham == e_tot), (iii) the natural-orbital selection path
    (cas_from_1pdm role) reproduces the full-CAS identity."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, GCASCI
    from libdmet_preview_tpu.ops import spinless

    nao, U = 4, 3.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    mu = U / 2.0

    GH1_c, GH0 = spinless.transform_H1_k(((h[None]),
                                          (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(mu, nao)
    eye_basis = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye_basis[:, :nao, :],
                                            eye_basis[:, nao:, :], GV2)
    H0 = GH0 + GV0 - mu * nao
    GHam = Integral(nso, True, False, H0, {"cd": H1_so[None]},
                    {"ccdd": g_so[None]})

    fci = FCI(restricted=True, ghf=True, tol=1e-12)
    rdm_fci, E_fci = fci.run(GHam, nelec=nao)

    # (i) full CAS == FCI
    cas_full = GCASCI(ncas=nso, nelecas=nao, tol=1e-12)
    rdm_cas, E_cas = cas_full.run(GHam, nelec=nao)
    assert abs(E_cas - E_fci) < 1e-9
    assert np.abs(np.asarray(rdm_cas) - np.asarray(rdm_fci)).max() < 1e-7
    assert abs(cas_full.run_dmet_ham(GHam) - E_fci) < 1e-8

    # (ii) frozen core: variational + RDM-consistent
    cas_fc = GCASCI(ncas=nso - 2, nelecas=nao - 2, tol=1e-12)
    _, E_fc = cas_fc.run(GHam, nelec=nao)
    assert E_fc >= E_fci - 1e-10
    assert E_fc < E_fci + 0.5
    assert abs(cas_fc.run_dmet_ham(GHam) - E_fc) < 1e-8
    assert abs(np.trace(cas_fc.onepdm[0]) - nao) < 1e-8

    # (iii) natural-orbital window from the FCI rdm1 (dm0 route)
    cas_no = GCASCI(ncas=nso, nelecas=nao, tol=1e-12, nat_orb=True)
    _, E_no = cas_no.run(GHam, nelec=nao, dm0=np.asarray(rdm_fci[0]))
    assert abs(E_no - E_fci) < 1e-9


def test_gcasscf_gso_frame():
    """GSO-frame CASSCF (reference gmc1step.py/gmc2step.py, and
    bcs_dmrgscf.py subsumed by the ph-transform design): on the
    ph-transformed 4-site Hubbard ring, (i) a full active window makes
    every orbital rotation redundant and reproduces the spinless FCI
    energy exactly, (ii) the frozen-core window's second-order orbital
    optimization converges, stays variational, strictly improves on the
    fixed-orbital GCASCI, and is internally RDM-consistent.  Internal
    anchors from the first completed run:
      E_fci          = -8.42442890089805
      E_gcasci(fc)   = -8.1859794445296
      E_gcasscf(fc)  = -8.188240873805"""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, GCASCI, GCASSCF
    from libdmet_preview_tpu.ops import spinless

    nao, U = 4, 3.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    mu = U / 2.0
    GH1_c, GH0 = spinless.transform_H1_k(((h[None]),
                                          (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    H1_so += spinless.mu_matrix(mu, nao)
    eye_basis = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye_basis[:, :nao, :],
                                            eye_basis[:, nao:, :], GV2)
    H0 = GH0 + GV0 - mu * nao
    GHam = Integral(nso, True, False, H0, {"cd": H1_so[None]},
                    {"ccdd": g_so[None]})

    fci = FCI(restricted=True, ghf=True, tol=1e-12)
    _, E_fci = fci.run(GHam, nelec=nao)
    assert abs(E_fci - (-8.42442890089805)) < 1e-8

    # (ii) frozen-core: converged, variational, improves on GCASCI,
    # RDM-consistent, conserves the transformed particle number
    cas_fc = GCASCI(ncas=nso - 2, nelecas=nao - 2, tol=1e-12)
    _, E_fc = cas_fc.run(GHam, nelec=nao)
    scf_fc = GCASSCF(ncas=nso - 2, nelecas=nao - 2, tol=1e-7,
                     max_cycle=15)
    _, E_scf = scf_fc.run(GHam, nelec=nao)
    assert scf_fc.converged
    assert E_scf <= E_fc - 1e-4            # strict orbital gain
    assert E_scf >= E_fci - 1e-9           # variational
    assert abs(E_scf - (-8.188240873805)) < 1e-6
    assert abs(scf_fc.run_dmet_ham(GHam) - E_scf) < 1e-8
    assert abs(np.trace(scf_fc.onepdm[0]) - nao) < 1e-8

    # (i) full window: rotations redundant -> FCI exactly
    scf_full = GCASSCF(ncas=nso, nelecas=nao, tol=1e-7)
    _, E_full = scf_full.run(GHam, nelec=nao)
    assert abs(E_full - E_fci) < 1e-9


def test_ucasscf_orbital_optimization():
    """UNRESTRICTED CASSCF (reference umc1step.py/umc2step.py -- the
    reference's main CASSCF for UHF-frame embeddings): on a
    site-symmetry-broken 4-site Hubbard ring at U=4, (i) a full active
    window makes every per-spin rotation redundant and reproduces the
    UHF-FCI energy exactly, (ii) the (3,2) window's second-order
    orbital optimization converges, strictly improves on the
    fixed-UHF-orbital UCASCI, stays variational, and is internally
    RDM-consistent.  Internal anchors from the first completed run:
      E_fci           = -2.1477353252387
      E_ucasci(3,2)   = -1.8179222376292
      E_ucasscf(3,2)  = -1.8841957321182  (orbital gain 0.0663)"""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers import FCI, UCASCI, UCASSCF

    nao, U = 4, 4.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    h += np.diag([-0.8, 0.3, -0.1, 0.6])
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U
    Ham = Integral(nao, True, False, 0.0, {"cd": h[None]},
                   {"ccdd": g[None]})

    fci = FCI(restricted=False, Sz=0, tol=1e-12)
    _, E_fci = fci.run(Ham, nelec=nao)
    assert abs(E_fci - (-2.1477353252387)) < 1e-8

    cas = UCASCI(ncas=3, nelecas=2, Sz=0, tol=1e-12)
    _, E_ci = cas.run(Ham, nelec=nao)
    scf = UCASSCF(ncas=3, nelecas=2, Sz=0, tol=1e-7, max_cycle=20)
    _, E_scf = scf.run(Ham, nelec=nao)
    assert scf.converged
    assert E_scf <= E_ci - 1e-2             # strict orbital gain
    assert E_scf >= E_fci - 1e-9            # variational
    assert abs(E_scf - (-1.8841957321182)) < 1e-6
    assert abs(scf.run_dmet_ham(Ham) - E_scf) < 1e-8
    assert abs(np.trace(scf.onepdm[0]) - 2.0) < 1e-8
    assert abs(np.trace(scf.onepdm[1]) - 2.0) < 1e-8

    # (i) full window: per-spin rotations redundant -> FCI exactly
    scf_full = UCASSCF(ncas=nao, nelecas=nao, Sz=0, tol=1e-7)
    _, E_full = scf_full.run(Ham, nelec=nao)
    assert abs(E_full - E_fci) < 1e-9


def test_gghf_mu_scf():
    """GSO HF with in-loop chemical-potential fitting (reference
    solver/scf_mu.py role): on the ph-transformed 4-site Hubbard ring
    (mu NOT folded into H1), the fit drives the physical electron count
    to half filling while the determinant keeps the fixed transformed
    particle number, and the converged energy equals the physical UHF
    energy plus the exact transform constant (repulsive U: the HFB
    minimum has zero pairing and reduces to UHF)."""
    from libdmet_preview_tpu.models.integral import Integral
    from libdmet_preview_tpu.solvers.scf import SCF, GGHF_mu
    from libdmet_preview_tpu.ops import spinless

    nao, U = 4, 3.0
    h = np.zeros((nao, nao))
    for i in range(nao):
        h[i, (i + 1) % nao] = h[(i + 1) % nao, i] = -1.0
    g = np.zeros((nao,) * 4)
    for i in range(nao):
        g[i, i, i, i] = U

    # physical UHF at half filling with an AFM guess
    Ham = Integral(nao, True, False, 0.0, {"cd": h[None]},
                   {"ccdd": g[None]})
    myscf = SCF()
    myscf.set_system(nao, 0, False, False)
    myscf.set_integral(Ham)
    m = 0.5
    dm0 = np.zeros((2, nao, nao))
    for i in range(nao):
        dm0[0, i, i] = 0.5 + m * (-1) ** i
        dm0[1, i, i] = 0.5 - m * (-1) ** i
    e_uhf, dm_uhf = myscf.HF(tol=1e-12, InitGuess=dm0)

    # GSO Hamiltonian WITHOUT the physical mu (the solver must find it)
    GH1_c, GH0 = spinless.transform_H1_k(((h[None]),
                                          (np.zeros_like(h)[None])))
    GH1 = spinless.combine_H1_k(GH1_c)
    GV2, GV1, GV0 = spinless.transform_H2_local(g)
    nso = 2 * nao
    H1_so = GH1[0][0].copy()
    H1_so[:nao, :nao] += GV1[0]
    H1_so[nao:, nao:] += GV1[1]
    eye_basis = np.eye(nso).reshape(1, nso, nso)
    g_so = spinless.transform_eri_local_gso(eye_basis[:, :nao, :],
                                            eye_basis[:, nao:, :], GV2)
    GHam = Integral(nso, True, False, GH0 + GV0, {"cd": H1_so[None]},
                    {"ccdd": g_so[None]})

    # matched GSO initial density from the UHF AFM solution
    GRho0 = np.zeros((nso, nso))
    GRho0[:nao, :nao] = dm_uhf[0]
    GRho0[nao:, nao:] = np.eye(nao) - dm_uhf[1].T

    E_T, rho, C, mo_e, mu = GGHF_mu(GHam, nelec=nao, nelec_target=nao,
                                    mu0=U / 2.0, dm0=GRho0, tol=1e-12)
    # fixed transformed particle count
    assert abs(np.trace(rho) - nao) < 1e-8
    # physical electron count on target
    n_phys = (np.trace(rho[:nao, :nao]) - np.trace(rho[nao:, nao:])
              + nao)
    assert abs(n_phys - nao) < 1e-6
    # energy identity vs physical UHF (transform constant in GHam.H0)
    assert abs(E_T - e_uhf) < 1e-7

    # the explicit-basis route with the identity basis is the same fit
    E_T2, rho2, _, _, mu2 = GGHF_mu(GHam, nelec=nao, nelec_target=nao,
                                    mu0=U / 2.0, dm0=GRho0,
                                    basis=eye_basis, tol=1e-12)
    assert abs(E_T2 - E_T) < 1e-9
    assert np.abs(rho2 - rho).max() < 1e-7
