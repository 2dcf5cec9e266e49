"""
GTH (Goedecker-Teter-Hutter) pseudopotentials, native implementation.

The reference gets pseudopotential matrix elements from PySCF's pbc.gto
machinery (SURVEY 2.8 item 1; e.g. the GTH-PADE diamond/cuprate workloads
in /root/reference/examples). This module owns the capability for the
PADE (LDA) sets with up to two local C coefficients and s-channel
nonlocal projectors -- enough for H, C (diamond) and first-row elements.

The GTH form:
  V_loc(r)  = -Z_ion erf(r / (sqrt(2) r_loc)) / r
              + exp(-r^2/(2 r_loc^2)) [C1 + C2 (r/r_loc)^2 + ...]
  V_nl      = sum_A sum_i,j |p_i^0> h^0_ij <p_j^0|  (s channel here);
              the (l=0, i=1) 3D projector (radial HGH form times Y_00)
              is exactly the UNIT-NORMALIZED s Gaussian
              (pi r_0^2)^{-3/4} exp(-r^2/(2 r_0^2))
              (validated against brute-force quadrature, tests/test_gth)

Matrix-element strategy (works molecular AND periodic):
  * the erf/r long-range part equals a point charge -Z_ion beyond a few
    r_loc, so periodic assembly uses the existing point-charge Ewald
    machinery PLUS the SHORT-RANGED difference
    +Z_ion erfc(r/(sqrt(2) r_loc))/r (ints.md.nuc_block screen='erfc');
  * the Gaussian polynomial terms are Hermite-kernel integrals
    (R_table kernel='gauss'); the r^2 term is the exact -d/dbeta of the
    plain Gaussian term, evaluated by COMPLEX-STEP differentiation
    (machine precision, no extra recursions);
  * s projectors are unit-normalized single-primitive s shells, so
    <AO|p> is a plain overlap block.
"""

import numpy as np

from libdmet_preview_tpu.ints.md import (Shell, CART, E_table, R_table,
                                         _pair_E3, ovlp_block, nuc_block,
                                         _shifted)


# {symbol: dict(zion, rloc, cloc=[C1, C2, ...], nl=[(rl, h11), ...])}
# Standard public GTH-PADE (LDA) parameters.
GTH_PADE = {
    "H": {"zion": 1.0, "rloc": 0.20000000,
          "cloc": [-4.18023680, 0.72507482], "nl": []},
    "C": {"zion": 4.0, "rloc": 0.34883045,
          "cloc": [-8.51377110, 1.22843203],
          "nl": [(0.30455321, 9.52284179)]},
}


def gauss_block(sh1, sh2, beta, C, shift=None):
    """sum_A (a| e^{-beta |r - C_A|^2} |b) for one shell pair, BATCHED
    over the centers C (one or many); beta may be complex (complex-step
    derivatives w.r.t. beta)."""
    C = np.atleast_2d(np.asarray(C, dtype=float))       # (nC, 3)
    cplx = np.iscomplexobj(np.asarray(beta))
    out = np.zeros((sh1.nc, sh2.nc), dtype=complex if cplx else float)
    lsum = sh1.l + sh2.l
    for p, c12, P, (Ex, Ey, Ez) in _pair_E3(sh1, sh2, shift):
        gam = p * beta / (p + beta)
        pref = c12 * (np.pi / (p + beta)) ** 1.5
        R = R_table(lsum, lsum, lsum, gam, P[None, :] - C,
                    kernel="gauss")                     # [t,u,v,nC]
        for i, (l1, m1, n1) in enumerate(CART[sh1.l]):
            for j, (l2, m2, n2) in enumerate(CART[sh2.l]):
                val = 0.0
                for t in range(l1 + l2 + 1):
                    ex = Ex[l1, l2, t]
                    if ex == 0.0:
                        continue
                    for u in range(m1 + m2 + 1):
                        ey = Ey[m1, m2, u]
                        if ey == 0.0:
                            continue
                        for v in range(n1 + n2 + 1):
                            ez = Ez[n1, n2, v]
                            if ez == 0.0:
                                continue
                            val = val + ex * ey * ez * np.sum(R[t, u, v])
                out[i, j] += pref * val
    return out


def gth_loc_sr_block(sh1, sh2, pp, C, shift=None):
    """SHORT-RANGED local-PP remainder for one atom species at centers C
    (one or many, BATCHED -- e.g. all lattice images of one atom):
    +Z_ion erfc(r_C/(sqrt(2) r_loc))/r_C + Gaussian polynomial terms.
    (The long-range -Z_ion/r part is handled by the caller's point-charge
    machinery: molecular bare Coulomb or periodic Ewald.)"""
    C = np.atleast_2d(np.asarray(C, dtype=float))
    rloc = pp["rloc"]
    zion = pp["zion"]
    eta = 1.0 / (2.0 * rloc * rloc)
    # nuc_block returns the ATTRACTION -sum Z v(r); with charge -Z_ion it
    # gives +Z_ion * erfc-kernel
    out = nuc_block(sh1, sh2, [-zion] * len(C), C, shift=shift, eta=eta,
                    screen="erfc")
    cloc = pp["cloc"]
    if len(cloc) > 2:
        raise NotImplementedError("GTH cloc terms beyond C2")
    if cloc:
        h = 1e-200  # complex step (exact to machine precision)
        g = gauss_block(sh1, sh2, eta + 1j * h, C, shift=shift)
        C1 = cloc[0]
        out = out + C1 * g.real
        if len(cloc) > 1:
            # r^2 term: (r/rloc)^2 e^{-beta r^2} = -(1/rloc^2) d/dbeta
            C2 = cloc[1]
            dgdb = g.imag / h
            out = out + C2 * (-dgdb) / (rloc * rloc)
    return out


def gth_projectors(pp, center):
    """Unit-normalized s-channel projector shells + the h matrix."""
    shells = []
    hs = []
    for rl, h11 in pp.get("nl", []):
        shells.append(Shell(np.asarray(center, float), 0,
                            [(1.0 / (2.0 * rl * rl), 1.0)]))
        hs.append(h11)
    return shells, np.asarray(hs)


def gth_nl_block(sh1, sh2, pp, C, shift1=None, shift2=None):
    """Nonlocal s-projector contribution <a|p> h <p|b> for one atom."""
    projs, hs = gth_projectors(pp, C)
    out = np.zeros((sh1.nc, sh2.nc))
    for proj, h11 in zip(projs, hs):
        va = ovlp_block(_shifted(sh1, shift1), proj)      # (nc1, 1)
        vb = ovlp_block(proj, _shifted(sh2, shift2))      # (1, nc2)
        out += h11 * (va @ vb)
    return out


def gth_pp_molecular(mol, pseudo="gth-pade"):
    """Full molecular PP matrix: long-range point-charge attraction with
    Z_ion + short-ranged local remainder + nonlocal projectors.  Returns
    (V_pp, zions) -- use zions for the nuclear repulsion."""
    assert pseudo == "gth-pade"
    pps = [GTH_PADE[sym] for sym, _ in mol.atoms]
    zions = np.asarray([pp["zion"] for pp in pps])
    nao = mol.nao
    V = np.zeros((nao, nao))
    for i, shi in enumerate(mol.shells):
        i0, i1 = mol.shell_slices[i]
        for j, shj in enumerate(mol.shells):
            if j > i:
                continue
            j0, j1 = mol.shell_slices[j]
            blk = nuc_block(shi, shj, zions, mol.coords)
            for A, pp in enumerate(pps):
                blk = blk + gth_loc_sr_block(shi, shj, pp, mol.coords[A])
                blk = blk + gth_nl_block(shi, shj, pp, mol.coords[A])
            V[i0:i1, j0:j1] = blk
            if i != j:
                V[j0:j1, i0:i1] = blk.T
    return V, zions
