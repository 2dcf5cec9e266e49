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
        """Full-space spin-summed 2-RDM (chemist (pq|rs), the FCI
        convention E2 = 0.5 sum G_pqrs (pq|rs)): active-space twopdm
        back-transformed with C_cas plus the analytic closed-shell core
        contributions (reference dmrgci.py CASCI make_rdm2 role;
        standard CAS decomposition
          G = G_act + Dc Dc - Dc Dc /2 (exch) + Dc Da cross terms
        with Dc/Da the spin-summed core/active 1-RDMs)."""
        if self.onepdm is None:
            raise RuntimeError("run CASCI before make_rdm2")
        C_core, C_cas, Ham_cas = self._cas
        G_act_cas = np.asarray(self.fcisolver.make_rdm2(Ham_cas))[0]
        G = np.array(jnp.einsum(
            "pqrs, ip, jq, kr, ls -> ijkl", jnp.asarray(G_act_cas),
            *([jnp.asarray(C_cas)] * 4), optimize=True))
        Dc = 2.0 * C_core @ C_core.T
        Da = 2.0 * C_cas @ np.asarray(
            self.fcisolver.onepdm[0]) @ C_cas.T
        G += (np.einsum("pq, rs -> pqrs", Dc, Dc)
              - 0.5 * np.einsum("ps, rq -> pqrs", Dc, Dc))
        G += (np.einsum("pq, rs -> pqrs", Dc, Da)
              + np.einsum("pq, rs -> pqrs", Da, Dc)
              - 0.5 * np.einsum("ps, rq -> pqrs", Dc, Da)
              - 0.5 * np.einsum("ps, rq -> pqrs", Da, Dc))
        self.twopdm = G[None]
        return self.twopdm

    def run_dmet_ham(self, Ham, **kwargs):
        """Evaluate the scaled DMET Hamiltonian's energy with the stored
        rdm1/rdm2 (reference solver contract)."""
        self.make_rdm2()
        h1 = np.asarray(Ham.H1["cd"][0])
        h2 = np.asarray(Ham.H2["ccdd"][0])
        if h2.ndim == 2:
            h2 = restore_eri(h2, Ham.norb, 1)
        E1 = np.einsum("pq, qp", h1, self.onepdm[0]) * 2.0
        E2 = np.einsum("pqrs, pqrs", h2, self.twopdm[0]) * 0.5
        return E1 + E2 + float(Ham.H0)

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


class CASSCF(object):
    """Orbital-optimized CASCI with SECOND-ORDER orbital steps
    (reference solver/umc1step.py:1210 / casscf.py:137 capability):
    macro-iterate CAS solve -> analytic orbital optimization.  The
    inner problem is the exact fixed-CI energy functional

        E(kappa) = Tr[h(kappa) D] + 1/2 sum G g(kappa),  C -> C e^kappa

    with the CASCI full-space RDMs (D, G) held fixed; its gradient and
    Hessian-vector products come from jax autodiff through expm + the
    integral rotations, minimized by the trust-region-Newton engine
    (ops.fit.minimize(method='NEWTON'), Steihaug CG) over the
    nonredundant rotations (core-active, core-virtual, active-virtual).
    Any solver with the run/make_rdm2 contract works as the CAS solver
    -- pass the Block-DMRG bridge for DMRG-SCF (reference casscf.py:137;
    tests/test_solvers_extra.py composition test)."""

    def __init__(self, ncas, nelecas, restricted=True, tol=1e-8,
                 max_cycle=30, fcisolver=None):
        assert restricted
        self.ncas = ncas
        self.nelecas = nelecas
        self.tol = tol
        self.max_cycle = max_cycle
        self.fcisolver = fcisolver
        self.onepdm = None
        self.e_tot = None
        self.mo_coeff = None
        self.converged = False

    def run(self, Ham, nelec=None, **kwargs):
        import jax
        import jax.numpy as jnp
        from jax.scipy.linalg import expm as jexpm
        import scipy.linalg as sla
        from libdmet_preview_tpu.ops.fit import minimize as fit_minimize
        if nelec is None:
            raise ValueError("CASSCF.run requires nelec")
        n = Ham.norb
        ncore = (nelec - self.nelecas) // 2
        ncas = self.ncas
        nvirt = n - ncore - ncas
        assert ncore >= 0 and nvirt >= 0

        # start from the CASCI solution's orbitals (HF -> MP2 NOs)
        cas = CASCI(self.ncas, self.nelecas, fcisolver=self.fcisolver)
        _, E = cas.run(Ham, nelec=nelec)
        C_core, C_cas, _ = cas._cas
        C0 = np.hstack([C_core, C_cas])
        resid = np.eye(n) - C0 @ C0.T
        w, v = np.linalg.eigh(resid)
        C_virt = v[:, -nvirt:] if nvirt > 0 else np.zeros((n, 0))
        C_full = np.hstack([C0, C_virt])

        pairs = [(i, j) for i in range(ncore) for j in
                 range(ncore, ncore + ncas)]
        pairs += [(i, j) for i in range(ncore) for j in
                  range(ncore + ncas, n)]
        pairs += [(i, j) for i in range(ncore, ncore + ncas) for j in
                  range(ncore + ncas, n)]
        npar = len(pairs)
        rows = np.array([p[0] for p in pairs], dtype=int)
        cols = np.array([p[1] for p in pairs], dtype=int)

        h1 = jnp.asarray(np.asarray(Ham.H1["cd"][0]))
        g = jnp.asarray(restore_eri(np.asarray(Ham.H2["ccdd"][0]), n, 1))
        H0 = float(Ham.H0)

        def mo_rdms():
            """Full-space (D spin-summed rdm1, G spin-summed rdm2) in
            the CURRENT MO basis (core | act | virt)."""
            G_act = np.asarray(cas.fcisolver.make_rdm2(cas._cas[2]))[0]
            d_act = 2.0 * np.asarray(cas.fcisolver.onepdm[0])
            D = np.zeros((n, n))
            D[:ncore, :ncore] = 2.0 * np.eye(ncore)
            a = slice(ncore, ncore + ncas)
            D[a, a] = d_act
            G = np.zeros((n, n, n, n))
            G[a, a, a, a] = G_act
            Dc = np.zeros((n, n))
            Dc[:ncore, :ncore] = 2.0 * np.eye(ncore)
            Da = np.zeros((n, n))
            Da[a, a] = d_act
            G += (np.einsum("pq, rs -> pqrs", Dc, Dc)
                  - 0.5 * np.einsum("ps, rq -> pqrs", Dc, Dc))
            G += (np.einsum("pq, rs -> pqrs", Dc, Da)
                  + np.einsum("pq, rs -> pqrs", Da, Dc)
                  - 0.5 * np.einsum("ps, rq -> pqrs", Dc, Da)
                  - 0.5 * np.einsum("ps, rq -> pqrs", Da, Dc))
            return jnp.asarray(D), jnp.asarray(G)

        @jax.jit
        def e_kappa(p, Cj, D, G):
            K = jnp.zeros((n, n)).at[rows, cols].set(p)
            K = K - K.T
            C = Cj @ jexpm(K)
            h_mo = C.T @ h1 @ C
            g_mo = jnp.einsum("pqrs, pi, qj, rk, sl -> ijkl", g, C, C,
                              C, C, optimize=True)
            return (jnp.einsum("pq, qp ->", h_mo, D)
                    + 0.5 * jnp.einsum("pqrs, pqrs ->", g_mo, G) + H0)

        grad_fn = jax.jit(jax.grad(e_kappa))

        self.converged = False
        for macro in range(self.max_cycle):
            D, G = mo_rdms()
            Cj = jnp.asarray(C_full)
            g0 = np.asarray(grad_fn(jnp.zeros(npar), Cj, D, G))
            if npar == 0 or np.max(np.abs(g0)) < self.tol * 10:
                self.converged = True
                break

            def fun_grad(p):
                pj = jnp.asarray(p)
                return (float(e_kappa(pj, Cj, D, G)),
                        np.asarray(grad_fn(pj, Cj, D, G)))

            def hvp(x, pvec):
                return np.asarray(jax.jvp(
                    lambda q: grad_fn(q, Cj, D, G),
                    (jnp.asarray(x),), (jnp.asarray(pvec),))[1])

            p_opt, _ = fit_minimize(fun_grad, np.zeros(npar),
                                    method="NEWTON", max_iter=30,
                                    hvp=hvp, gtol=self.tol,
                                    trust_radius=0.4)
            K = np.zeros((n, n))
            K[rows, cols] = p_opt
            K = K - K.T
            C_full = C_full @ sla.expm(K)
            # re-solve the CAS problem in the rotated orbitals
            Ham_cas, info = project_active_space(
                Ham, nelec, ncas, self.nelecas, mo_coeff=C_full)
            rdm_cas, E = cas.fcisolver.run(Ham_cas,
                                           nelec=self.nelecas)
            cas._cas = (info["C_core"], info["C_cas"], Ham_cas)
            cas.onepdm = (info["C_cas"] @ np.asarray(rdm_cas[0])
                          @ info["C_cas"].T
                          + 0.5 * info["dm_core"])[None]

        C_cor = C_full[:, :ncore]
        C_act = C_full[:, ncore:ncore + ncas]
        rdm1 = cas.onepdm
        self.onepdm = np.asarray(rdm1)
        self.e_tot = float(E)
        self.mo_coeff = C_full
        self._cas = (C_cor, C_act, cas._cas[2])
        self.fcisolver = cas.fcisolver
        return self.onepdm, self.e_tot

    def cleanup(self):
        pass
