"""
Native generation of minimal valence (SZV-type) Gaussian bases for GTH
pseudopotentials.

The reference inherits its periodic bases (gth-szv / gth-dzvp) from
PySCF's bundled CP2K tables (e.g. the NiO workload
/root/reference/examples/dmet/03-dmet-nio-afm/nio_afm.py:38).  No such
data files exist in this environment, so this module OWNS the
construction instead of transcribing it: a wide even-tempered primitive
set per angular channel is contracted with the orbital coefficients of
a spherically-averaged fractional-occupation atomic Hartree-Fock
calculation run against the GTH pseudopotential -- which is exactly how
SZV-class sets are built.  The result is a reproducible, self-contained
minimal valence basis ("tpu-szv") for any element with a GTH_PADE entry.

Atomic SCF details: restricted fractional occupations spread the
valence electrons evenly over the 2(2l+1) spin-orbitals of each open
shell (spherical + spin averaging), Fock damping for robustness, and
Cartesian AOs (the s-content of Cartesian d shells is projected out of
the contraction by construction: only same-l primitive coefficients are
kept, which is the standard shared-exponent contraction).
"""

import json
import os

import numpy as np

from libdmet_preview_tpu.ints.md import MoleGeneral
from libdmet_preview_tpu.ints.gth import GTH_PADE, gth_pp_molecular

# valence configuration per element: electrons in successive atomic
# orbitals per l channel (with the GTH valence count)
VALENCE_CONF = {
    "H": {0: [1]},
    "Li": {0: [2, 1]},
    "C": {0: [2], 1: [2]},
    "N": {0: [2], 1: [3]},
    "O": {0: [2], 1: [4]},
    "Si": {0: [2], 1: [2]},
    "Ni": {0: [2, 2], 1: [6], 2: [8]},
    "Cu": {0: [1], 2: [10]},      # q11: 4s1 3d10 (semicore in the core)
}

# even-tempered ladders (alpha0, beta, n) per element and l; ranges are
# set by the GTH radii (diffuse end ~ valence size, tight end covers the
# semicore s/p of transition metals)
_ET_DEFAULT = {0: (0.08, 2.8, 7), 1: (0.08, 2.8, 7), 2: (0.20, 2.8, 6)}
_ET = {
    "H": {0: (0.07, 2.6, 6)},
    "Li": {0: (0.06, 3.0, 8)},
    "C": {0: (0.10, 2.8, 7), 1: (0.10, 2.8, 7)},
    "N": {0: (0.12, 2.8, 7), 1: (0.12, 2.8, 7)},
    "O": {0: (0.14, 2.8, 7), 1: (0.14, 2.8, 7)},
    "Si": {0: (0.07, 2.8, 7), 1: (0.07, 2.8, 7)},
    "Ni": {0: (0.10, 3.0, 8), 1: (0.12, 3.0, 8), 2: (0.18, 2.9, 7)},
    "Cu": {0: (0.06, 3.0, 8), 2: (0.15, 2.9, 7)},   # diffuse 4s, 3d
}


def _even_tempered(sym, floor=None):
    """Even-tempered ladders; `floor` drops primitives more diffuse
    than the given exponent (the 'solid' variant: functions with
    extents beyond the nearest-neighbour distance are redundant in a
    crystal and dominate the lattice-sum cost)."""
    conf = VALENCE_CONF[sym]
    out = {}
    for l in conf:
        a0, beta, n = _ET.get(sym, {}).get(l, _ET_DEFAULT[l])
        es = a0 * beta ** np.arange(n)
        if floor is not None:
            es = es[es >= floor * 0.999]
        out[l] = es
    return out


def atomic_rhf_frac(sym, exps_by_l, conv=1e-8, max_cycle=200):
    """Spherically/spin-averaged fractional-occupation atomic HF with the
    GTH_PADE pseudopotential on an uncontracted even-tempered basis.
    Returns (E, per-l list of (exponents, contraction columns))."""
    # one shell per primitive (uncontracted)
    shell_list = []
    for l, es in sorted(exps_by_l.items()):
        for e in es:
            shell_list.append((l, [(float(e), 1.0)]))
    basis_data = {(sym, "et"): shell_list}
    mol = MoleGeneral([(sym, (0.0, 0.0, 0.0))], basis="et",
                      basis_data=basis_data)
    S = mol.intor_ovlp()
    T = mol.intor_kin()
    V, zions = gth_pp_molecular(mol)
    eri = mol.intor_eri()
    hcore = T + V
    nao = mol.nao
    conf = VALENCE_CONF[sym]

    # AO index bookkeeping per l: which AOs belong to l-shells, and the
    # "leading component" index pattern used for occupation averaging
    from libdmet_preview_tpu.ints.md import ncart
    ao_l = []           # l of each AO
    for l, es in sorted(exps_by_l.items()):
        for _ in es:
            ao_l += [l] * ncart(l)
    ao_l = np.asarray(ao_l)

    # symmetric orthogonalization
    s_val, s_vec = np.linalg.eigh(S)
    keep = s_val > 1e-9
    X = s_vec[:, keep] / np.sqrt(s_val[keep])

    def fock(dm):
        J = np.einsum("pqrs, rs -> pq", eri, dm)
        K = np.einsum("prqs, rs -> pq", eri, dm)
        return hcore + J - 0.5 * K

    def occupations(C):
        """Fractional occupation vector over MOs: per l channel, fill
        the lowest n_shell(l) MOs of that character with the configured
        electrons spread evenly over 2l+1 m-components x 2 spins."""
        # character of each MO = l with max weight (S-metric)
        w = np.zeros((3, C.shape[1]))
        SC = S @ C
        for l in range(3):
            sel = ao_l == l
            if np.any(sel):
                w[l] = np.einsum("pi, pi -> i", C[sel], SC[sel])
        char = np.argmax(w, axis=0)
        occ = np.zeros(C.shape[1])
        for l, fills in conf.items():
            idx = np.nonzero(char == l)[0]
            # MOs come sorted by energy; degenerate m-partners are
            # consecutive -- group them in blocks of (2l+1)
            deg = 2 * l + 1
            for ishell, nel in enumerate(fills):
                blk = idx[ishell * deg:(ishell + 1) * deg]
                occ[blk] = nel / deg
        return occ

    dm = np.zeros((nao, nao))
    e_old = 0.0
    E = 0.0
    C = None
    occ = None
    for it in range(max_cycle):
        F = fock(dm)
        Fo = X.T @ F @ X
        e_mo, C_o = np.linalg.eigh(Fo)
        C = X @ C_o
        occ = occupations(C)
        dm_new = (C * occ) @ C.T
        dm = dm_new if it < 2 else 0.6 * dm_new + 0.4 * dm
        E = 0.5 * np.einsum("pq, pq ->", hcore + F, dm)
        if abs(E - e_old) < conv and it > 4:
            break
        e_old = E

    # contraction columns: for each l, the occupied atomic orbitals of
    # that character, restricted to the same-l primitive coefficients of
    # the LEADING Cartesian component ((l,0,0): shared-exponent radial
    # contraction)
    out = []
    SC = S @ C
    w = np.zeros((3, C.shape[1]))
    for l in range(3):
        sel = ao_l == l
        if np.any(sel):
            w[l] = np.einsum("pi, pi -> i", C[sel], SC[sel])
    char = np.argmax(w, axis=0)
    for l, es in sorted(exps_by_l.items()):
        # AO row indices of each Cartesian component of each l-primitive:
        # rows_by_comp[c][prim]
        nc = ncart(l)
        rows_by_comp = [[] for _ in range(nc)]
        r = 0
        for ll, ess in sorted(exps_by_l.items()):
            for _ in ess:
                if ll == l:
                    for c in range(nc):
                        rows_by_comp[c].append(r + c)
                r += ncart(ll)
        rows_by_comp = [np.asarray(x) for x in rows_by_comp]
        nshell = len(VALENCE_CONF[sym].get(l, []))
        idx = np.nonzero(char == l)[0]
        deg = 2 * l + 1
        cols = []
        for ishell in range(nshell):
            # among the degenerate m-partners, pick the (MO, Cartesian
            # component) pair carrying the largest radial weight (a
            # p_y-like partner has ~zero coefficients on the p_x rows)
            best, best_norm = None, -1.0
            for mo in idx[ishell * deg:(ishell + 1) * deg]:
                for rows in rows_by_comp:
                    v = C[rows, mo]
                    n = float(np.abs(v).max())
                    if n > best_norm:
                        best, best_norm = v, n
            cols.append(best)
        out.append((l, np.asarray(es), np.asarray(cols).T))
    return E, out


_CACHE_DIR = os.path.join(os.path.dirname(__file__), "_basis_cache")


def make_gth_valence_basis(sym, cache=True, variant="atom"):
    """Minimal valence contracted basis ('tpu-szv') for `sym`, generated
    from the atomic HF described in the module docstring.  Returns the
    GBASIS-style shell list [(l, [(exp, coef), ...]), ...] with one
    contracted function per occupied valence shell per l.

    variant='solid' floors the diffuse end at 0.15 bohr^-2 (periodic
    workloads: the dropped tails are spanned by neighbouring cells;
    lattice-sum image counts shrink as rcut^3)."""
    tag = "" if variant == "atom" else "_" + variant
    fname = os.path.join(_CACHE_DIR, "%s_tpu_szv%s.json" % (sym, tag))
    if cache and os.path.exists(fname):
        with open(fname) as f:
            data = json.load(f)
        return [(int(l), [(float(a), float(c)) for a, c in prims])
                for l, prims in data]
    exps = _even_tempered(sym,
                          floor=0.15 if variant == "solid" else None)
    _, contr = atomic_rhf_frac(sym, exps)
    shells = []
    for l, es, cols in contr:
        for j in range(cols.shape[1]):
            # drop numerically dead primitives to keep lattice sums lean
            col = cols[:, j]
            keep = np.abs(col) > 1e-4 * np.abs(col).max()
            shells.append((int(l), [(float(a), float(c))
                                    for a, c in zip(es[keep], col[keep])]))
    if cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(fname, "w") as f:
            json.dump([[l, prims] for l, prims in shells], f)
    return shells


# ----------------------------------------------------------------------
# double-zeta + polarization ("tpu-dzvp")
# ----------------------------------------------------------------------

def _pol_exponent(l_val, es, coefs, l_pol):
    """Polarization exponent by the displacement-response rule: a
    perturbed (displaced or field-polarized) Gaussian of exponent a_i
    generates, to first order, an (l+1)-type function with the SAME
    exponent and weight proportional to a_i
    (grad e^{-a r^2} = -2 a r e^{-a r^2}).  So the exact first-order
    response of the contracted valence shell is
    g(r) = sum_i c_i a_i r^{l_val+1} e^{-a_i r^2}; the polarization
    exponent is the single l_pol Gaussian maximizing its normalized
    overlap with g.  Closed-form radial integrals over a bounded
    log-alpha search; reproduces the literature ballpark (H p ~ 0.4-0.8,
    first-row d ~ 0.5-1.6) with no transcribed constants."""
    from math import gamma

    from scipy.optimize import minimize_scalar

    es = np.asarray(es, dtype=float)
    coefs = np.asarray(coefs, dtype=float)

    # radial integrals int_0^inf r^m exp(-a r^2) dr = 0.5 * a^-(m+1)/2
    # * Gamma((m+1)/2)
    def rint(m, a):
        return 0.5 * a ** (-(m + 1) / 2.0) * gamma((m + 1) / 2.0)

    # normalization of r^l e^{-a r^2} under int R^2 r^2 dr
    def norm(l, a):
        return 1.0 / np.sqrt(rint(2 * l + 2, 2.0 * a))

    # response weights: normalized primitive coefficient times exponent
    w = coefs * np.asarray([norm(l_val, a) for a in es]) * es
    gg = 0.0
    for wi, ai in zip(w, es):
        for wj, aj in zip(w, es):
            gg += wi * wj * rint(2 * l_val + 4, ai + aj)
    gg = np.sqrt(gg)

    def neg_overlap(loga):
        a = np.exp(loga)
        np_ = norm(l_pol, a)
        m = sum(wi * np_ * rint(l_val + l_pol + 3, ai + a)
                for wi, ai in zip(w, es))
        return -abs(m) / gg

    res = minimize_scalar(neg_overlap, bounds=(np.log(2e-2), np.log(50.0)),
                          method="bounded")
    return float(np.exp(res.x))


def make_gth_dzvp_basis(sym, cache=True, variant="atom", pol=True):
    """Split-valence double-zeta (+ polarization) basis ('tpu-dzvp')
    for `sym`, generated natively from the same GTH atomic HF as the
    SZV set (the reference inherits gth-dzvp(-molopt-sr) from CP2K
    tables via PySCF, e.g.
    /root/reference/examples/dmet/04-dmet-nio-fm/nio_fm.py:37; no such
    data ships here, so the set is CONSTRUCTED):

      * inner zeta: the atomic-HF contraction over all primitives
        EXCEPT the most diffuse significant one (the classic n-1
        split);
      * outer zeta: that most diffuse primitive, free;
      * polarization: one shell of (l_max+1) whose exponent maximizes
        the dipole transition moment against the outermost valence
        contraction (_pol_exponent).

    Returns the GBASIS-style shell list."""
    tag = ("" if variant == "atom" else "_" + variant) + \
        ("" if pol else "_nopol")
    fname = os.path.join(_CACHE_DIR, "%s_tpu_dzvp%s.json" % (sym, tag))
    if cache and os.path.exists(fname):
        with open(fname) as f:
            data = json.load(f)
        return [(int(l), [(float(a), float(c)) for a, c in prims])
                for l, prims in data]

    exps = _even_tempered(sym,
                          floor=0.15 if variant == "solid" else None)
    _, contr = atomic_rhf_frac(sym, exps)

    shells = []
    outermost = {}            # l -> (es, coefs) of the outer valence zeta
    l_max_occ = 0
    for l, es, cols in contr:
        l_max_occ = max(l_max_occ, l)
        for j in range(cols.shape[1]):
            col = cols[:, j]
            keep = np.abs(col) > 1e-4 * np.abs(col).max()
            es_k, col_k = es[keep], col[keep]
            order = np.argsort(es_k)       # most diffuse first
            es_k, col_k = es_k[order], col_k[order]
            last_shell = j == cols.shape[1] - 1
            if last_shell and len(es_k) >= 3:
                # split: free diffuse primitive + renormalized core
                shells.append((int(l), [(float(es_k[0]), 1.0)]))
                shells.append((int(l), [(float(a), float(c))
                                        for a, c in zip(es_k[1:],
                                                        col_k[1:])]))
            else:
                # semicore shells (e.g. Ni 3s under 4s) stay contracted
                shells.append((int(l), [(float(a), float(c))
                                        for a, c in zip(es_k, col_k)]))
            if last_shell:
                outermost[l] = (es_k, col_k)
    if pol:
        l_pol = l_max_occ + 1
        es_v, c_v = outermost[l_max_occ]
        a_pol = _pol_exponent(l_max_occ, es_v, c_v, l_pol)
        shells.append((int(l_pol), [(float(a_pol), 1.0)]))

    if cache:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(fname, "w") as f:
            json.dump([[l, prims] for l, prims in shells], f)
    return shells
