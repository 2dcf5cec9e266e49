"""
Static GW (COHSEX) self-energy for QSGW-in-DMET double counting
(reference qsgw_dc.py:18-180; native implementation in solvers/gw.py).

Oracles:
  * screening off -> vsig == exact HF exchange == fock - hcore - J;
  * chi0 is negative semidefinite -> W has spectrum in (0, 1];
  * screening weakens exchange on a gapped system.
"""

import numpy as np
import pytest


def _h2_integrals():
    from libdmet_preview_tpu.ints.gto import Mole
    mol = Mole([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-6g")
    return mol


def test_bare_limit_is_hf_exchange_restricted():
    from libdmet_preview_tpu.solvers.gw import get_vsig_emb
    mol = _h2_integrals()
    h = mol.intor_hcore()
    S = mol.intor_ovlp()
    eri = mol.intor_eri()
    # converged RHF pieces
    from libdmet_preview_tpu.solvers.ksdft import RKS
    hf = RKS(mol, xc=None, hyb=1.0)
    hf.kernel()
    vj, vk = hf._jk(hf.dm)
    fock = h + vj - 0.5 * vk
    vsig = get_vsig_emb(fock, eri, mol.nelectron, ovlp=S,
                        screened=False)
    assert np.abs(vsig[0] - (-0.5 * vk)).max() < 1e-9


def test_bare_limit_is_hf_exchange_unrestricted():
    from libdmet_preview_tpu.solvers.gw import get_vsig_emb
    rng = np.random.RandomState(2)
    n = 4
    A = rng.randn(6, n, n)
    A = A + A.transpose(0, 2, 1)
    eri = np.einsum("xpq, xrs -> pqrs", A, A)
    h = rng.randn(n, n)
    h = h + h.T
    dm = []
    focks = []
    for no in (2, 1):
        e, c = np.linalg.eigh(h)
        d = c[:, :no] @ c[:, :no].T
        dm.append(d)
    vj = np.einsum("pqrs, rs -> pq", eri, dm[0] + dm[1])
    for s in range(2):
        vk = np.einsum("prqs, rs -> pq", eri, dm[s])
        focks.append(h + vj - vk)
    vsig = get_vsig_emb(np.asarray(focks), eri, (2, 1), screened=False)
    # per-spin exchange of the fock's own eigen-orbitals
    for s, no in enumerate((2, 1)):
        e, c = np.linalg.eigh(focks[s])
        K = np.einsum("prqs, rs -> pq", eri, c[:, :no] @ c[:, :no].T)
        assert np.abs(vsig[s] - (-K)).max() < 1e-8


def test_screening_weakens_exchange():
    from libdmet_preview_tpu.solvers.gw import get_vsig_emb
    from libdmet_preview_tpu.solvers.ksdft import RKS
    mol = _h2_integrals()
    hf = RKS(mol, xc=None, hyb=1.0)
    hf.kernel()
    fock = hf.fock
    eri = mol.intor_eri()
    S = mol.intor_ovlp()
    v0 = get_vsig_emb(fock, eri, 2, ovlp=S, screened=False)
    v1 = get_vsig_emb(fock, eri, 2, ovlp=S, screened=True)
    assert np.abs(v1 - v1.transpose(0, 2, 1)).max() < 1e-12
    # static screening + Coulomb hole shifts the potential: both stay
    # attractive for the occupied orbital, the correction is nonzero and
    # bounded (W has spectrum in (0, 1] since chi0 is negative
    # semidefinite, so the screened-exchange part cannot exceed twice the
    # bare magnitude once the Coulomb hole is added)
    C = hf.mo_coeff[:, :1]
    e0 = float((C.T @ v0[0] @ C)[0, 0])
    e1 = float((C.T @ v1[0] @ C)[0, 0])
    assert e0 < 0 and e1 < 0
    assert abs(e1 - e0) > 1e-4
    assert abs(e1) < 2.0 * abs(e0)
