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
from libdmet_preview_tpu.ints.grid import becke_grid, eval_ao
from libdmet_preview_tpu.ints.xc import eval_exc_vxc
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
                            xc=self.xc)

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
            f = h + vj + vxc
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
                + exc + mol.energy_nuc()
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
        self.vj, self.vk, self.exc, self.vxc = vj, vk, exc, vxc
        self.fock = h + vj + vxc - (0.5 * self.hyb) * vk
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
        self.e_tot = None
        self.converged = False

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
                                    restricted=False, xc=self.xc)
            f = np.asarray([h + vj + vxc[0], h + vj + vxc[1]])
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
                + exc + mol.energy_nuc()
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
