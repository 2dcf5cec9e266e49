"""
Native periodic Gaussian integrals (s shells) on the Born-von-Karman torus.

The reference delegates all of this to PySCF's C core + GDF (SURVEY 2.8
item 1; used from /root/reference/libdmet/system/lattice.py:416-515 and
every ab initio test).  This module owns the capability natively for
s-function bases: a k-mesh calculation is formulated on the BvK SUPERCELL
torus -- periodized orbitals, the Ewald-periodized Coulomb kernel
v(r) = (4 pi / Omega) sum_{G != 0} e^{iGr} / G^2 (uniform-background
compensated; identical to PySCF's exxdiv=None + G=0-dropped convention for
neutral systems), and analytic Fourier transforms of Gaussian pair
densities (the AFT density-fitting scheme,
/root/reference/libdmet/basis_transform/eri_transform.py:566-779 uses the
same representation via ft_aopair).

Quantities (all real, supercell AO basis):
  ovlp, kin       -- real-space lattice sums of molecular formulas
  nuc             -- AFT: -(1/Omega) sum_G w(G) Re[SF(G) f_IJ(G)^*]
  eri             -- AFT: (1/Omega) sum_G w(G) f_IJ(G)^* f_KL(G)
  e_nuc           -- point-charge Ewald energy with background

with w(G) = 4 pi / G^2 (w=0 at G=0) and f_IJ(G) the torus pair FT
(a short-ranged image sum of the analytic Gaussian pair FT).

Everything is generated ONCE per geometry on the host (AO integrals are
inputs to the TPU compute path); the G-contractions are O(nG nao^4) GEMMs
done in blocks.
"""

import itertools as it

import numpy as np
from scipy.special import erfc

from libdmet_preview_tpu.ints.gto import Mole, BASIS, CHARGES


# ----------------------------------------------------------------------
# cell construction
# ----------------------------------------------------------------------

BOHR_PER_ANGSTROM = 1.0 / 0.52917720859  # PySCF's BOHR constant


class PbcCell(object):
    """BvK supercell torus with s-shell Gaussian AOs.

    atoms: [(symbol, xyz)], a: (3, 3) lattice vectors (rows), both in
    bohr unless unit='A'."""

    def __init__(self, atoms, a, basis="3-21g", unit="B", gmax=None,
                 precision=1e-12):
        scale = BOHR_PER_ANGSTROM if unit.upper().startswith("A") else 1.0
        atoms = [(sym, np.asarray(xyz, float) * scale) for sym, xyz in atoms]
        self.mole = Mole(atoms, basis=basis)
        self.atoms = atoms
        self.a = np.asarray(a, float) * scale
        self.b = 2.0 * np.pi * np.linalg.inv(self.a).T   # reciprocal rows
        self.vol = abs(np.linalg.det(self.a))
        self.shells = self.mole.shells
        self.nao = self.mole.nao
        self.charges = self.mole.charges
        self.coords = self.mole.coords
        self.nelectron = self.mole.nelectron
        self.precision = float(precision)
        # exponent floors set the real-space image cutoff (Gaussian
        # product decay exp(-mu |A-B|^2), mu >= a_min/2) and the
        # reciprocal cutoff (pair FT decay exp(-G^2/(4p)), p >= 2 a_min)
        exps = np.concatenate([[p[0] for p in sh[1]] for sh in self.shells])
        self.min_exp = float(exps.min())
        logt = -np.log(self.precision)
        mu_min = 0.5 * self.min_exp
        self.rcut = np.sqrt(logt / mu_min) * 1.5
        p_pair_min = 2.0 * self.min_exp
        self.gmax = gmax if gmax is not None else \
            1.2 * np.sqrt(4.0 * p_pair_min * logt)
        self.mesh = self._mesh_from_gmax(self.gmax)

    def _mesh_from_gmax(self, gmax):
        mesh = []
        for i in range(3):
            # grid spacing along b_i covers |G| up to gmax
            db = np.linalg.norm(self.b[i])
            n = int(np.ceil(gmax / db)) * 2 + 1
            mesh.append(n)
        return tuple(mesh)

    # ------------------------------------------------------------------
    def lattice_images(self, rcut=None):
        """Translation vectors T with |T| <= rcut + cell diameter."""
        rcut = self.rcut if rcut is None else rcut
        # bound the integer ranges via the inverse metric
        ainv = np.linalg.inv(self.a)
        nmax = [int(np.ceil(rcut * np.linalg.norm(ainv[:, i]))) + 1
                for i in range(3)]
        ns = np.array(list(it.product(*[range(-n, n + 1) for n in nmax])))
        Ts = ns @ self.a
        return Ts

    def Gv(self):
        """All reciprocal vectors of the mesh (nG, 3), fftfreq ordering,
        G=0 first."""
        fracs = [np.fft.fftfreq(n, 1.0 / n) for n in self.mesh]
        ns = np.array(list(it.product(*fracs)))
        return ns @ self.b

    def coulG(self):
        """4 pi / G^2, zero at G=0 (background-compensated kernel)."""
        Gv = self.Gv()
        G2 = np.einsum("gi, gi -> g", Gv, Gv)
        w = np.zeros_like(G2)
        nz = G2 > 1e-12
        w[nz] = 4.0 * np.pi / G2[nz]
        return Gv, w

    # ------------------------------------------------------------------
    # real-space lattice-summed 1-body integrals
    # ------------------------------------------------------------------

    def _pair_images(self):
        Ts = self.lattice_images()
        return Ts

    def intor_ovlp(self):
        return self._ovlp_kin()[0]

    def intor_kin(self):
        return self._ovlp_kin()[1]

    def _ovlp_kin(self):
        Ts = self._pair_images()
        nao = self.nao
        S = np.zeros((nao, nao))
        T = np.zeros((nao, nao))
        for i, (ci, prim_i) in enumerate(self.shells):
            ai = np.asarray([p[0] for p in prim_i])
            di = np.asarray([p[1] for p in prim_i])
            for j in range(i + 1):
                cj, prim_j = self.shells[j]
                aj = np.asarray([p[0] for p in prim_j])
                dj = np.asarray([p[1] for p in prim_j])
                a = ai[:, None]
                b = aj[None, :]
                p = a + b
                mu = a * b / p
                dd = di[:, None] * dj[None, :]
                sv = tv = 0.0
                for Tvec in Ts:
                    AB2 = np.sum((ci - cj - Tvec) ** 2)
                    if AB2 * mu.min() > -np.log(self.precision) * 1.5:
                        continue
                    E = np.exp(-mu * AB2)
                    s = (np.pi / p) ** 1.5 * E
                    sv = sv + np.sum(dd * s)
                    tv = tv + np.sum(dd * mu * (3.0 - 2.0 * mu * AB2) * s)
                S[i, j] = S[j, i] = sv
                T[i, j] = T[j, i] = tv
        return S, T

    # ------------------------------------------------------------------
    # torus pair Fourier transforms
    # ------------------------------------------------------------------

    def ft_aopair(self, Gv):
        """f_IJ(G) = sum_T FT[chi_I chi_J(. - T)](G), (nG, nao, nao)
        complex (the periodized pair density's Fourier coefficients).
        Cached for the cell's own mesh (reused by intor_nuc/intor_eri)."""
        cached = getattr(self, "_ft_cache", None)
        if cached is not None and cached[0].shape == Gv.shape \
                and np.array_equal(cached[0][:8], Gv[:8]):
            return cached[1]
        f = self._ft_aopair_impl(Gv)
        self._ft_cache = (Gv, f)
        return f

    def _ft_aopair_impl(self, Gv):
        Ts = self._pair_images()
        nao = self.nao
        nG = Gv.shape[0]
        G2 = np.einsum("gi, gi -> g", Gv, Gv)
        f = np.zeros((nG, nao, nao), dtype=np.complex128)
        logt = -np.log(self.precision) * 1.5
        for i, (ci, prim_i) in enumerate(self.shells):
            ai = np.asarray([p[0] for p in prim_i])
            di = np.asarray([p[1] for p in prim_i])
            for j in range(i + 1):
                cj, prim_j = self.shells[j]
                aj = np.asarray([p[0] for p in prim_j])
                dj = np.asarray([p[1] for p in prim_j])
                a = ai[:, None]
                b = aj[None, :]
                p = a + b
                mu = a * b / p
                dd = di[:, None] * dj[None, :]
                decay = np.exp(-G2[:, None] / (4.0 * p.ravel()[None, :]))
                pref = (dd * (np.pi / p) ** 1.5).ravel()
                acc = np.zeros(nG, dtype=np.complex128)
                for Tvec in Ts:
                    Bj = cj + Tvec
                    AB2 = np.sum((ci - Bj) ** 2)
                    if AB2 * mu.min() > logt:
                        continue
                    E = np.exp(-mu * AB2).ravel()
                    P = ((a[..., None] * ci + b[..., None] * Bj)
                         / p[..., None]).reshape(-1, 3)
                    phase = np.exp(-1j * (Gv @ P.T))       # (nG, nprim2)
                    acc = acc + (phase * decay) @ (pref * E)
                f[:, i, j] = acc
                if i != j:
                    # swap roles: P symmetric in (i, j); f_JI = f_IJ
                    f[:, j, i] = acc
        return f

    # ------------------------------------------------------------------
    # AFT 1- and 2-body matrices
    # ------------------------------------------------------------------

    def intor_nuc(self, eta=None):
        """Electron-nucleus attraction with the G=0 term of the FULL
        kernel dropped (background-compensated; PySCF exxdiv=None /
        AFT get_nuc convention), evaluated by Ewald splitting:

          V = V_LR(G != 0, damped kernel 4 pi e^{-G^2/4 eta}/G^2)
            + V_SR(real-space erfc attraction over images)
            + (pi / (eta Omega)) Z_tot S_IJ        [G=0 of the SR split]

        The bare AFT form converges only like exp(-G^2/(4 p_max)) with
        the TIGHTEST pair exponent (the point-charge structure factor
        never decays); the split restores fast convergence on the
        standard mesh."""
        logt = -np.log(self.precision)
        if eta is None:
            # LR branch must be converged on the existing mesh
            eta = (self.gmax ** 2) / (4.0 * logt)
        Gv, w = self.coulG()
        G2 = np.einsum("gi, gi -> g", Gv, Gv)
        wlr = w * np.exp(-G2 / (4.0 * eta))
        f = self.ft_aopair(Gv)
        SF = np.einsum("a, ga -> g", self.charges,
                       np.exp(-1j * (Gv @ self.coords.T)))
        V = -np.einsum("g, g, gij -> ij", wlr, SF, f.conj()).real / self.vol

        # SR: real-space erfc attraction, images of both the pair and
        # the nuclei.  For an s product Gaussian (exponent p, center P):
        # int e^{-p(r-P)^2} erfc(sqrt(eta)|r-C|)/|r-C|
        #   = (2 pi / p) [F0(p|PC|^2) - sqrt(eta/(p+eta))
        #                 F0(p eta/(p+eta) |PC|^2)]
        from libdmet_preview_tpu.ints.gto import boys0
        rcut_eta = np.sqrt(logt / eta) + 2.0
        ainv = np.linalg.inv(self.a)
        nmax = [int(np.ceil((rcut_eta + self.rcut)
                            * np.linalg.norm(ainv[:, i]))) + 1
                for i in range(3)]
        Tn = np.array(list(it.product(*[range(-n, n + 1) for n in nmax])))
        Tall = Tn @ self.a
        Ts_pair = self._pair_images()
        nao = self.nao
        Vsr = np.zeros((nao, nao))
        nuc_imgs = (self.coords[:, None, :] + Tall[None, :, :]).reshape(-1, 3)
        Zs = np.repeat(self.charges, Tall.shape[0])
        for i, (ci, prim_i) in enumerate(self.shells):
            ai = np.asarray([p[0] for p in prim_i])
            di = np.asarray([p[1] for p in prim_i])
            for j in range(i + 1):
                cj, prim_j = self.shells[j]
                aj = np.asarray([p[0] for p in prim_j])
                dj = np.asarray([p[1] for p in prim_j])
                a = ai[:, None]
                b = aj[None, :]
                p = (a + b).ravel()
                mu = (a * b).ravel() / p
                dd = (di[:, None] * dj[None, :]).ravel()
                acc = 0.0
                for Tvec in Ts_pair:
                    Bj = cj + Tvec
                    AB2 = np.sum((ci - Bj) ** 2)
                    if AB2 * mu.min() > logt * 1.5:
                        continue
                    E = np.exp(-mu * AB2)
                    P = (ai[:, None, None] * ci
                         + aj[None, :, None] * Bj).reshape(-1, 3) \
                        / p[:, None]
                    PC2 = np.sum((P[:, None, :]
                                  - nuc_imgs[None, :, :]) ** 2, axis=-1)
                    # keep only nuclear images within the erfc range
                    keep = PC2.min(axis=0) < (rcut_eta + 2.0) ** 2
                    PC2 = PC2[:, keep]
                    th = p * eta / (p + eta)
                    val = boys0(p[:, None] * PC2) \
                        - np.sqrt(eta / (p + eta))[:, None] \
                        * boys0(th[:, None] * PC2)
                    acc = acc + np.einsum(
                        "x, x, a, xa ->", dd * E, 2.0 * np.pi / p,
                        Zs[keep], val, optimize=True) * -1.0
                Vsr[i, j] = Vsr[j, i] = acc
        V = V + Vsr
        # G=0 term of the SR reciprocal branch (pyscf's charged-background
        # correction): +(pi/(eta Omega)) Z_tot S_IJ
        S = self.intor_ovlp()
        V = V + (np.pi / (eta * self.vol)) * self.charges.sum() * S
        return 0.5 * (V + V.T)

    def intor_hcore(self):
        return self.intor_kin() + self.intor_nuc()

    def intor_eri(self, blksize=4096):
        """(IJ|KL) = (1/Omega) sum_G w(G) f_IJ(G)^* f_KL(G), chemist
        notation, real."""
        Gv, w = self.coulG()
        f = self.ft_aopair(Gv)
        nao = self.nao
        F = f.reshape(f.shape[0], nao * nao)
        eri = np.zeros((nao * nao, nao * nao))
        for g0 in range(0, F.shape[0], blksize):
            blk = F[g0:g0 + blksize]
            wb = w[g0:g0 + blksize]
            eri += (blk.conj() * wb[:, None]).T.real @ blk.real \
                + (blk.conj() * wb[:, None]).T.imag @ (-blk.imag)
        eri /= self.vol
        eri = eri.reshape(nao, nao, nao, nao)
        # enforce 8-fold symmetry against roundoff
        eri = 0.5 * (eri + eri.transpose(1, 0, 2, 3))
        eri = 0.5 * (eri + eri.transpose(0, 1, 3, 2))
        eri = 0.5 * (eri + eri.transpose(2, 3, 0, 1))
        return eri

    # ------------------------------------------------------------------
    # Ewald nuclear energy (with neutralizing background)
    # ------------------------------------------------------------------

    def energy_nuc(self, eta=None):
        Z = self.charges
        R = self.coords
        vol = self.vol
        if eta is None:
            eta = (np.pi / vol ** (2.0 / 3.0))  # decent default split
        # real-space sum
        rcut = np.sqrt(-np.log(1e-16)) / np.sqrt(eta) + 1.0
        ainv = np.linalg.inv(self.a)
        nmax = [int(np.ceil(rcut * np.linalg.norm(ainv[:, i]))) + 1
                for i in range(3)]
        ns = np.array(list(it.product(*[range(-n, n + 1) for n in nmax])))
        Ts = ns @ self.a
        ewovrl = 0.0
        for A in range(len(Z)):
            for B in range(len(Z)):
                d = R[A] - R[B] + Ts                     # (nT, 3)
                r = np.linalg.norm(d, axis=1)
                mask = r > 1e-10
                ewovrl += 0.5 * Z[A] * Z[B] * np.sum(
                    erfc(np.sqrt(eta) * r[mask]) / r[mask])
        # self + background
        Qtot = Z.sum()
        ewself = -np.sum(Z ** 2) * np.sqrt(eta / np.pi) \
            - np.pi * Qtot ** 2 / (2.0 * eta * vol)
        # reciprocal sum
        gmax = np.sqrt(4.0 * eta * -np.log(1e-16))
        mesh = []
        for i in range(3):
            db = np.linalg.norm(self.b[i])
            mesh.append(int(np.ceil(gmax / db)) * 2 + 1)
        fracs = [np.fft.fftfreq(n, 1.0 / n) for n in mesh]
        Gv = np.array(list(it.product(*fracs))) @ self.b
        G2 = np.einsum("gi, gi -> g", Gv, Gv)
        nz = G2 > 1e-12
        SF = np.einsum("a, ga -> g", Z, np.exp(1j * (Gv[nz] @ R.T)))
        ewg = (2.0 * np.pi / vol) * np.sum(
            np.exp(-G2[nz] / (4.0 * eta)) / G2[nz] * np.abs(SF) ** 2)
        return float(ewovrl + ewself + ewg)


def cross_ovlp_pbc(cell1, cell2):
    """Periodized cross overlap between the AOs of two PbcCell objects on
    the same torus: S12[i, j] = <chi~_i^{(1)} | chi~_j^{(2)}> (s shells,
    image-summed)."""
    assert np.allclose(cell1.a, cell2.a)
    Ts = cell1.lattice_images(max(cell1.rcut, cell2.rcut))
    prec = min(cell1.precision, cell2.precision)
    logt = -np.log(prec) * 1.5
    S = np.zeros((cell1.nao, cell2.nao))
    for i, (ci, prim_i) in enumerate(cell1.shells):
        ai = np.asarray([p[0] for p in prim_i])
        di = np.asarray([p[1] for p in prim_i])
        for j, (cj, prim_j) in enumerate(cell2.shells):
            aj = np.asarray([p[0] for p in prim_j])
            dj = np.asarray([p[1] for p in prim_j])
            a = ai[:, None]
            b = aj[None, :]
            p = a + b
            mu = a * b / p
            dd = di[:, None] * dj[None, :]
            acc = 0.0
            for Tvec in Ts:
                AB2 = np.sum((ci - cj - Tvec) ** 2)
                if AB2 * mu.min() > logt:
                    continue
                acc += np.sum(dd * (np.pi / p) ** 1.5 * np.exp(-mu * AB2))
            S[i, j] = acc
    return S


def make_hchain_supercell(nk=3, nH=2, R=1.5, vac=10.0, basis="3-21g",
                          **kwargs):
    """BvK supercell of the reference HChain cell
    (/root/reference/libdmet/system/lattice.py:1262: nH H atoms spaced R
    along z, cell length nH*R, vacuum `vac` on x/y; all in Angstrom),
    replicated nk times along z (the [1, 1, nk] k-mesh torus)."""
    length = nH * R
    atoms = []
    for c in range(nk):
        for i in range(nH):
            atoms.append(("H", (0.0, 0.0, c * length + i * R)))
    a = np.diag([vac, vac, nk * length])
    return PbcCell(atoms, a, basis=basis, unit="A", **kwargs)
