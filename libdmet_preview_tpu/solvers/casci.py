"""
CASCI impurity solver: FCI in an active space selected by MP2 natural
occupations, HF-frozen core (TPU-native analog of the reference CASCI
wrapper, /root/reference/libdmet/solver/dmrgci.py:809-1194, with the
MP2-natural-orbital selection of get_orbs).

Also the in-process stand-in for DmrgCI: any FCI-contract solver (e.g. the
external DMRG bridge in solvers/external.py) can be dropped in as the
active-space solver.
"""

import numpy as np
import jax.numpy as jnp

from libdmet_preview_tpu.utils import logger as log
from libdmet_preview_tpu.models.integral import Integral, restore_eri
from libdmet_preview_tpu.solvers.scf import SCF
from libdmet_preview_tpu.solvers.fci import FCI


def mp2_natural_orbitals(h_mo, g_mo, nocc):
    """Spin-restricted MP2 natural-orbital occupations and rotation.

    h_mo/g_mo in the canonical MO basis (chemist).  Returns (occ, U)
    with U the MO->NO rotation, occupations descending."""
    n = h_mo.shape[0]
    f = h_mo + 2.0 * np.einsum("pqii -> pq", g_mo[:, :, :nocc, :nocc]) \
        - np.einsum("piiq -> pq", g_mo[:, :nocc, :nocc, :])
    eps = np.diag(f)
    eo, ev = eps[:nocc], eps[nocc:]
    # t2[i,j,a,b] = (ia|jb) / (ei + ej - ea - eb)
    g_ovov = g_mo[:nocc, nocc:, :nocc, nocc:]
    denom = (eo[:, None, None, None] + eo[None, None, :, None]
             - ev[None, :, None, None] - ev[None, None, None, :])
    t2 = g_ovov / denom                      # (i, a, j, b)
    # MP2 1-RDM correction (unrelaxed)
    doo = -(2.0 * np.einsum("iajb, kajb -> ik", t2, t2)
            - np.einsum("iajb, kbja -> ik", t2, t2))
    dvv = (2.0 * np.einsum("iajb, icjb -> ac", t2, t2)
           - np.einsum("iajb, ibjc -> ac", t2, t2))
    dm = np.zeros((n, n))
    dm[:nocc, :nocc] = 2.0 * np.eye(nocc) + doo + doo.T
    dm[nocc:, nocc:] = dvv + dvv.T
    w, v = np.linalg.eigh(dm)
    order = np.argsort(w)[::-1]
    return w[order], v[:, order]


class CASCI(object):
    """run(ImpHam, nelec) -> (rdm1, E) with an (ncas, nelecas) active
    space; orbitals = RHF canonical -> MP2 natural orbitals."""

    def __init__(self, ncas, nelecas, restricted=True, Sz=0,
                 fcisolver=None, tol=1e-10, **kwargs):
        assert restricted, "CASCI implemented for restricted references"
        self.ncas = ncas
        self.nelecas = nelecas
        self.Sz = Sz
        self.tol = tol
        self.fcisolver = fcisolver or FCI(restricted=True, Sz=Sz, tol=tol)
        self.onepdm = None
        self.twopdm = None
        self.e_tot = None

    def run(self, Ham, nelec=None, **kwargs):
        if nelec is None:
            raise ValueError("CASCI.run requires nelec")
        n = Ham.norb
        nocc = nelec // 2
        ncore = (nelec - self.nelecas) // 2
        ncas = self.ncas
        assert ncore >= 0 and ncore + ncas <= n

        myscf = SCF()
        myscf.set_system(nelec, 0, False, True)
        myscf.set_integral(Ham)
        e_hf, dm_hf = myscf.HF(tol=1e-11)
        C = myscf.mo_coeff[0]

        h1 = np.asarray(Ham.H1["cd"][0])
        g = restore_eri(np.asarray(Ham.H2["ccdd"][0]), n, 1)
        h_mo = C.T @ h1 @ C
        g_mo = np.asarray(jnp.einsum("pqrs, pi, qj, rk, sl -> ijkl",
                                     jnp.asarray(g), *([jnp.asarray(C)] * 4),
                                     optimize=True))
        # MP2 natural orbitals; keep core/active split by occupation
        occ_no, U = mp2_natural_orbitals(h_mo, g_mo, nocc)
        C_no = C @ U
        C_core = C_no[:, :ncore]
        C_cas = C_no[:, ncore:ncore + ncas]

        dm_core = 2.0 * C_core @ C_core.T
        from libdmet_preview_tpu.solvers.scf import _veff_uhf
        v_core = np.asarray(_veff_uhf(
            jnp.asarray(dm_core * 0.5), jnp.asarray(dm_core * 0.5),
            jnp.asarray(g), jnp.asarray(g), jnp.asarray(g))[0])
        e_core = float(np.sum((h1 + 0.5 * v_core) * dm_core)) + float(Ham.H0)

        h_cas = C_cas.T @ (h1 + v_core) @ C_cas
        g_cas = np.asarray(jnp.einsum(
            "pqrs, pi, qj, rk, sl -> ijkl", jnp.asarray(g),
            *([jnp.asarray(C_cas)] * 4), optimize=True))
        Ham_cas = Integral(ncas, True, False, e_core, {"cd": h_cas[None]},
                           {"ccdd": g_cas[None]})
        rdm_cas, E = self.fcisolver.run(Ham_cas, nelec=self.nelecas)
        # back-transform rdm1 to the site basis (per-spin convention)
        rdm1 = C_cas @ (np.asarray(rdm_cas[0])) @ C_cas.T + 0.5 * dm_core
        self.onepdm = rdm1[None]
        self.e_tot = E
        self._cas = (C_core, C_cas, Ham_cas)
        return self.onepdm, E

    def make_rdm2(self, Ham=None):
        raise NotImplementedError("CASCI rdm2 back-transform: use the "
                                  "active-space solver's twopdm")

    def cleanup(self):
        pass


def project_active_space(Ham, nelec, ncas, nelecas, mo_coeff=None):
    """Active-space projection of an embedding Integral (reference
    slater.py:2121-2277 active-space projectors): fold the HF core into
    an effective (ncas, nelecas) Integral.

    Returns (Ham_cas, info) with info = {C_core, C_cas, e_core} for
    back-transforming solver RDMs:
        rdm1_full = C_cas rdm1_cas C_cas^T + 0.5 * dm_core   (per spin)
    """
    import jax.numpy as jnp
    from libdmet_preview_tpu.solvers.scf import _veff_uhf
    n = Ham.norb
    nocc = nelec // 2
    ncore = (nelec - nelecas) // 2
    assert ncore >= 0 and ncore + ncas <= n
    if mo_coeff is None:
        myscf = SCF()
        myscf.set_system(nelec, 0, False, True)
        myscf.set_integral(Ham)
        myscf.HF(tol=1e-11)
        mo_coeff = myscf.mo_coeff[0]
    C = np.asarray(mo_coeff)
    h1 = np.asarray(Ham.H1["cd"][0])
    g = restore_eri(np.asarray(Ham.H2["ccdd"][0]), n, 1)
    C_core = C[:, :ncore]
    C_cas = C[:, ncore:ncore + ncas]
    dm_core = 2.0 * C_core @ C_core.T
    v_core = np.asarray(_veff_uhf(
        jnp.asarray(dm_core * 0.5), jnp.asarray(dm_core * 0.5),
        jnp.asarray(g), jnp.asarray(g), jnp.asarray(g))[0])
    e_core = float(np.sum((h1 + 0.5 * v_core) * dm_core)) + float(Ham.H0)
    h_cas = C_cas.T @ (h1 + v_core) @ C_cas
    g_cas = np.asarray(jnp.einsum(
        "pqrs, pi, qj, rk, sl -> ijkl", jnp.asarray(g),
        *([jnp.asarray(C_cas)] * 4), optimize=True))
    Ham_cas = Integral(ncas, True, False, e_core, {"cd": h_cas[None]},
                       {"ccdd": g_cas[None]})
    info = {"C_core": C_core, "C_cas": C_cas, "e_core": e_core,
            "dm_core": dm_core}
    return Ham_cas, info
