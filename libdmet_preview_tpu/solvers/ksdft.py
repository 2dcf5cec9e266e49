"""
Molecular KS-DFT (LDA/LSDA) on the native s-Gaussian engine
(capability analog of the PySCF RKS/UKS the reference's DFT+DMET path
drives, /root/reference/libdmet/routine/pdft_helper.py:43-500 and the
KRKSpU family's KS core; grid + functionals from ints/grid, ints/xc).

Used to prepare a KS lattice (fock = hcore + J + vxc) for DFT-in-DMET
with the xc double counting handled in ops/embham._emb_H1.
"""

import numpy as np
import jax.numpy as jnp

from libdmet_preview_tpu.utils import logger as log
from libdmet_preview_tpu.ints.grid import becke_grid, eval_ao, \
    eval_ao_grad
from libdmet_preview_tpu.ints.xc import eval_exc_vxc, is_gga
from libdmet_preview_tpu.ops.diis import DIIS


class RKS(object):
    """Restricted KS: run() -> converged (E_tot, dm_total).

    xc: 'lsda' (Slater X + VWN5 C), 'slater' (X only), or None (-> pure
    Hartree: J only, exchange-free; mainly for debugging)."""

    def __init__(self, mol, xc="lsda", hyb=0.0, n_rad=60, n_theta=12,
                 n_phi=24, max_cycle=60, conv_tol=1e-9):
        self.mol = mol
        self.xc = xc
        self.hyb = float(hyb)
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.grid = becke_grid(mol, n_rad=n_rad, n_theta=n_theta,
                               n_phi=n_phi)
        self.ao_g = eval_ao(mol, self.grid[0])
        self.ao_grad_g = eval_ao_grad(mol, self.grid[0]) \
            if is_gga(xc) else None
        self.e_tot = None
        self.mo_coeff = None
        self.mo_energy = None
        self.dm = None
        self.converged = False

    def _jk(self, dm):
        eri = self._eri
        vj = np.einsum("pqrs, rs -> pq", eri, dm)
        vk = np.einsum("prqs, rs -> pq", eri, dm)
        return vj, vk

    def _xc(self, dm):
        if self.xc is None:
            return 0.0, np.zeros_like(dm)
        return eval_exc_vxc(dm, self.ao_g, self.grid[1], restricted=True,
                            xc=self.xc, ao_grad=self.ao_grad_g)

    def _plus_u(self, dm):
        """Hubbard-U hook (overridden by RKSpU); (E_U, v_U)."""
        return 0.0, 0.0

    def kernel(self, dm0=None):
        mol = self.mol
        h = mol.intor_hcore()
        S = mol.intor_ovlp()
        self._eri = mol.intor_eri()
        nocc = mol.nelectron // 2
        assert mol.nelectron % 2 == 0, "RKS needs a closed shell"
        w, v = np.linalg.eigh(S)
        A = v @ np.diag(w ** -0.5) @ v.T       # symmetric orthogonalizer

        if dm0 is None:
            e, c = np.linalg.eigh(A @ h @ A)
            C = A @ c
            dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        else:
            dm = np.asarray(dm0)

        diis = DIIS(space=8)
        e_old = 0.0
        for it in range(self.max_cycle):
            vj, vk = self._jk(dm)
            exc, vxc = self._xc(dm)
            eU, vU = self._plus_u(dm)
            f = h + vj + vxc + vU
            if self.hyb != 0.0:
                f = f - 0.5 * self.hyb * vk
                exc = exc - 0.25 * self.hyb * float(np.sum(vk * dm))
            # DIIS on the commutator residual
            err = f @ dm @ S - S @ dm @ f
            f = diis.update(f, err).reshape(f.shape)
            e, c = np.linalg.eigh(A @ f @ A)
            C = A @ c
            dm = 2.0 * C[:, :nocc] @ C[:, :nocc].T
            e_tot = float(np.sum(h * dm) + 0.5 * np.sum(vj * dm)) \
                + exc + eU + mol.energy_nuc()
            if abs(e_tot - e_old) < self.conv_tol and it > 1:
                self.converged = True
                break
            e_old = e_tot
        self.e_tot = e_tot
        self.mo_coeff = C
        self.mo_energy = e
        self.dm = dm
        # final potentials for downstream consumers (fock pieces)
        vj, vk = self._jk(dm)
        exc, vxc = self._xc(dm)
        eU, vU = self._plus_u(dm)
        self.vj, self.vk, self.exc, self.vxc = vj, vk, exc, vxc
        self.E_U = eU
        self.fock = h + vj + vxc + vU - (0.5 * self.hyb) * vk
        return self.e_tot, dm

    run = kernel


class UKS(object):
    """Unrestricted KS: run() -> (E_tot, (dm_a, dm_b))."""

    def __init__(self, mol, xc="lsda", nelec=None, n_rad=60, n_theta=12,
                 n_phi=24, max_cycle=80, conv_tol=1e-9):
        self.mol = mol
        self.xc = xc
        self.nelec = nelec     # (na, nb)
        self.max_cycle = max_cycle
        self.conv_tol = conv_tol
        self.grid = becke_grid(mol, n_rad=n_rad, n_theta=n_theta,
                               n_phi=n_phi)
        self.ao_g = eval_ao(mol, self.grid[0])
        self.ao_grad_g = eval_ao_grad(mol, self.grid[0]) \
            if is_gga(xc) else None
        self.e_tot = None
        self.converged = False

    def _plus_u(self, dm):
        """Hubbard-U hook (overridden by UKSpU); (E_U, v_U)."""
        return 0.0, 0.0

    def kernel(self, dm0=None):
        mol = self.mol
        h = mol.intor_hcore()
        S = mol.intor_ovlp()
        eri = mol.intor_eri()
        if self.nelec is None:
            na = (mol.nelectron + 1) // 2
            nb = mol.nelectron - na
        else:
            na, nb = self.nelec
        w, v = np.linalg.eigh(S)
        A = v @ np.diag(w ** -0.5) @ v.T

        if dm0 is None:
            e, c = np.linalg.eigh(A @ h @ A)
            C = A @ c
            dm = np.asarray([C[:, :na] @ C[:, :na].T,
                             C[:, :nb] @ C[:, :nb].T])
        else:
            dm = np.asarray(dm0)

        diis = DIIS(space=8)
        e_old = 0.0
        for it in range(self.max_cycle):
            vj = np.einsum("pqrs, rs -> pq", eri, dm.sum(0))
            exc, vxc = eval_exc_vxc(dm, self.ao_g, self.grid[1],
                                    restricted=False, xc=self.xc,
                                    ao_grad=self.ao_grad_g)
            eU, vU = self._plus_u(dm)
            vU = np.broadcast_to(np.asarray(vU), (2,) + h.shape) \
                if np.ndim(vU) else np.zeros((2,) + h.shape)
            f = np.asarray([h + vj + vxc[0] + vU[0],
                            h + vj + vxc[1] + vU[1]])
            err = np.concatenate([(f[s] @ dm[s] @ S - S @ dm[s] @ f[s])
                                  for s in range(2)], axis=0)
            f = diis.update(f, err).reshape(f.shape)
            dm_new = []
            mo_e, mo_c = [], []
            for s, n in ((0, na), (1, nb)):
                e, c = np.linalg.eigh(A @ f[s] @ A)
                C = A @ c
                dm_new.append(C[:, :n] @ C[:, :n].T)
                mo_e.append(e)
                mo_c.append(C)
            dm = np.asarray(dm_new)
            e_tot = float(np.sum(h * dm.sum(0))
                          + 0.5 * np.sum(vj * dm.sum(0))) \
                + exc + eU + mol.energy_nuc()
            if abs(e_tot - e_old) < self.conv_tol and it > 1:
                self.converged = True
                break
            e_old = e_tot
        self.e_tot = e_tot
        self.mo_coeff = np.asarray(mo_c)
        self.mo_energy = np.asarray(mo_e)
        self.dm = dm
        self.exc = exc
        return self.e_tot, dm

    run = kernel


def _dudarev(P, U):
    """Dudarev rotationally invariant +U on ONE per-spin local block P:
    (E, dE/dP) = (U/2 (tr P - tr P^2 / 2), U/2 (1 - P))."""
    eye = np.eye(len(P))
    E = (U * 0.5) * (np.trace(P) - 0.5 * float(np.sum(P * P.T)))
    return E, (U * 0.5) * (eye - 0.5 * (P + P.T))


class RKSpU(RKS):
    """Restricted KS-DFT+U: the Dudarev simplified rotationally
    invariant correction on local-orbital projectors (reference
    KRKSpU, /root/reference/libdmet/routine/krkspu.py:30-216:
    v_U = SC [(U/2)(1 - P)] (SC)^H per spin,
    E_U = sum (U/2)(tr P - tr P^2 / 2) per spin,
    P the per-spin local-orbital occupation block).

    C_ao_lo: (nao, nlo) local orbitals (Lowdin/IAO; the reference's
    'minao' role).  U_idx: list of LO-index lists; U_val: matching U
    (hartree)."""

    def __init__(self, mol, C_ao_lo, U_idx, U_val, **kwargs):
        super().__init__(mol, **kwargs)
        S = mol.intor_ovlp()
        self.SC = S @ np.asarray(C_ao_lo)
        self.U_idx = [np.asarray(ix, dtype=int) for ix in U_idx]
        self.U_val = [float(u) for u in U_val]

    def _plus_u(self, dm):
        vU = np.zeros_like(dm)
        E_U = 0.0
        for idx, U in zip(self.U_idx, self.U_val):
            SCi = self.SC[:, idx]
            P = 0.5 * (SCi.T @ dm @ SCi)          # per-spin block
            E, dE = _dudarev(P, U)
            E_U += 2.0 * E                         # two equal spins
            vU += SCi @ dE @ SCi.T                 # dP/d(dm) carries 1/2
        return E_U, vU


class UKSpU(UKS):
    """Unrestricted KS-DFT+U (reference KUKSpU,
    /root/reference/libdmet/routine/kukspu.py:27-230): per-spin Dudarev
    blocks on the same local projectors."""

    def __init__(self, mol, C_ao_lo, U_idx, U_val, **kwargs):
        super().__init__(mol, **kwargs)
        S = mol.intor_ovlp()
        self.SC = S @ np.asarray(C_ao_lo)
        self.U_idx = [np.asarray(ix, dtype=int) for ix in U_idx]
        self.U_val = [float(u) for u in U_val]

    def _plus_u(self, dm):
        vU = np.zeros_like(dm)
        E_U = 0.0
        for idx, U in zip(self.U_idx, self.U_val):
            SCi = self.SC[:, idx]
            for s in range(2):
                P = SCi.T @ dm[s] @ SCi
                E, dE = _dudarev(P, U)
                E_U += E
                vU[s] += SCi @ dE @ SCi.T
        return E_U, vU
