"""
GTH pseudopotential blocks (ints/gth.py) against brute-force quadrature
and exact kernel identities: s/p/d nonlocal channels with multi-radial
h matrices, C1..C4 local polynomial terms, rotational invariance, and
the periodic assembly vs explicit molecular image sums.
"""

import numpy as np


def _grid(n=90, L=7.0):
    x = (np.arange(n) + 0.5) / n * L - L / 2
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return np.stack([X, Y, Z], -1).reshape(-1, 3), (L / n) ** 3


def _chi(pts, ctr, e, comp):
    from libdmet_preview_tpu.ints.md import norm_cart
    d = pts - ctr
    r2 = (d ** 2).sum(-1)
    if comp == "s":
        return norm_cart(e, (0, 0, 0)) * np.exp(-e * r2)
    return norm_cart(e, (1, 0, 0)) * d[:, 0] * np.exp(-e * r2)


def _ylm_grid(l, m, d):
    """Real spherical harmonics on grid points (INDEPENDENT hand-coded
    formulas, not the SOLID_HARM table), d = r - C, shape (npts, 3).
    Returns r^l Y_lm (the solid harmonic, no 1/r^l singularity)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    r2 = x * x + y * y + z * z
    if l == 0:
        return np.full(len(d), 0.5 / np.sqrt(np.pi))
    if l == 1:
        c = np.sqrt(3.0 / (4 * np.pi))
        return c * {0: x, 1: y, 2: z}[m]
    if l == 2:
        if m == 0:
            return np.sqrt(15.0 / (4 * np.pi)) * x * y
        if m == 1:
            return np.sqrt(15.0 / (4 * np.pi)) * y * z
        if m == 2:
            return np.sqrt(5.0 / (16 * np.pi)) * (3 * z * z - r2)
        if m == 3:
            return np.sqrt(15.0 / (4 * np.pi)) * x * z
        if m == 4:
            return np.sqrt(15.0 / (16 * np.pi)) * (x * x - y * y)
    raise ValueError(l)


def _proj_grid(l, m, i, rl, pts, ctr):
    """p_i^lm on the grid from the HGH radial form (independent of the
    Cartesian-expansion code path)."""
    from scipy.special import gamma
    d = pts - ctr
    r2 = (d ** 2).sum(-1)
    nrm = np.sqrt(2.0) / (rl ** (l + 2 * i - 0.5)
                          * np.sqrt(gamma(l + 2 * i - 0.5)))
    return (nrm * r2 ** (i - 1) * _ylm_grid(l, m, d)
            * np.exp(-r2 / (2 * rl * rl)))


def test_gth_local_gaussian_terms_vs_quadrature():
    """C1 Gaussian and complex-step C2 r^2 terms vs real-space quadrature
    (smooth integrands -> the grid is exact to ~1e-10)."""
    from libdmet_preview_tpu.ints.md import Shell
    from libdmet_preview_tpu.ints.gth import GTH_PADE, gauss_block
    pp = GTH_PADE["C"]
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    pts, w = _grid()
    rC2 = ((pts - C0) ** 2).sum(-1)
    rloc = pp["rloc"]
    beta = 1 / (2 * rloc ** 2)
    gsm = np.exp(-beta * rC2)
    g2 = rC2 / rloc ** 2 * gsm
    for comp, l in (("s", 0), ("px", 1)):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 0, [(0.6, 1.0)])
        h = 1e-200
        g = gauss_block(sh1, sh2, beta + 1j * h, C0)
        chi12 = _chi(pts, A, 0.9, comp) * _chi(pts, B, 0.6, "s")
        assert abs(g.real[0, 0] - w * np.sum(chi12 * gsm)) < 1e-9
        ana_r2 = -(g.imag / h)[0, 0] / rloc ** 2
        assert abs(ana_r2 - w * np.sum(chi12 * g2)) < 1e-9


def test_gauss_pow_block_vs_quadrature():
    """Exact polynomial-kernel r^{2k} Gaussian integrals, k = 0..3
    (the C1..C4 machinery), s and p bra shells."""
    from libdmet_preview_tpu.ints.md import Shell, gauss_pow_block
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    beta = 1.7
    pts, w = _grid()
    rC2 = ((pts - C0) ** 2).sum(-1)
    gsm = np.exp(-beta * rC2)
    for comp, l in (("s", 0), ("px", 1)):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 0, [(0.6, 1.0)])
        chi12 = _chi(pts, A, 0.9, comp) * _chi(pts, B, 0.6, "s")
        for k in range(4):
            ana = gauss_pow_block(sh1, sh2, beta, C0, k=k)[0, 0]
            ref = w * np.sum(chi12 * rC2 ** k * gsm)
            assert abs(ana - ref) < 1e-9 * max(1.0, abs(ref)), (comp, k)


def test_gth_loc_c3c4_vs_quadrature():
    """Full local short-range remainder with four C coefficients (the
    Li-type sets) vs quadrature of the explicit GTH local form."""
    from libdmet_preview_tpu.ints.md import Shell
    from libdmet_preview_tpu.ints.gth import gth_loc_sr_block
    # zion = 0 isolates the smooth Gaussian-polynomial terms (the
    # singular erfc/r kernel is covered EXACTLY by
    # test_erfc_kernel_identity; a uniform grid cannot integrate 1/r)
    pp = {"zion": 0.0, "rloc": 0.4,
          "cloc": [-14.034868, 9.553476, -1.766488, 0.083946], "nl": []}
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    pts, w = _grid(n=110, L=8.0)
    rC = np.sqrt(((pts - C0) ** 2).sum(-1))
    rloc = pp["rloc"]
    x2 = (rC / rloc) ** 2
    vloc_sr = (np.exp(-0.5 * x2) * (pp["cloc"][0] + pp["cloc"][1] * x2
                                    + pp["cloc"][2] * x2 ** 2
                                    + pp["cloc"][3] * x2 ** 3))
    for comp, l in (("s", 0), ("px", 1)):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 0, [(0.6, 1.0)])
        chi12 = _chi(pts, A, 0.9, comp) * _chi(pts, B, 0.6, "s")
        ana = gth_loc_sr_block(sh1, sh2, pp, C0)[0, 0]
        ref = w * np.sum(chi12 * vloc_sr)
        assert abs(ana - ref) < 2e-7, comp


def test_gth_nonlocal_general_l_vs_quadrature():
    """s (2 radial projectors), p and d channels vs quadrature with the
    explicit HGH projector functions (independent Y_lm formulas), and
    projector unit norms."""
    from libdmet_preview_tpu.ints.md import Shell
    from libdmet_preview_tpu.ints.gth import gth_nl_block, _h_full
    pp = {"zion": 6.0, "rloc": 0.3, "cloc": [],
          "nl": [(0, 0.35, _h_full(0, [8.0, 2.5])),
                 (1, 0.42, _h_full(1, [3.0])),
                 (2, 0.38, _h_full(2, [-5.0]))]}
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    pts, w = _grid()
    # unit norms of every projector component
    for l, rl, h in pp["nl"]:
        for i in range(1, np.atleast_2d(h).shape[0] + 1):
            for m in range(2 * l + 1):
                p = _proj_grid(l, m, i, rl, pts, C0)
                assert abs(w * np.sum(p * p) - 1.0) < 1e-8, (l, i, m)
    for comp, l in (("s", 0), ("px", 1)):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 0, [(0.6, 1.0)])
        chi_a = _chi(pts, A, 0.9, comp)
        chi_b = _chi(pts, B, 0.6, "s")
        ref = 0.0
        for lch, rl, h in pp["nl"]:
            h = np.atleast_2d(h)
            for m in range(2 * lch + 1):
                pa = np.array([w * np.sum(chi_a * _proj_grid(
                    lch, m, i + 1, rl, pts, C0))
                    for i in range(h.shape[0])])
                pb = np.array([w * np.sum(chi_b * _proj_grid(
                    lch, m, j + 1, rl, pts, C0))
                    for j in range(h.shape[0])])
                ref += pa @ h @ pb
        ana = gth_nl_block(sh1, sh2, pp, C0)[0, 0]
        assert abs(ana - ref) < 1e-8, comp


def test_gth_nonlocal_rotational_invariance():
    """<s_A|V_nl|s_B> depends only on the geometry, not the global
    orientation: sum_m |p_lm><p_lm| is a rotational scalar."""
    from scipy.spatial.transform import Rotation
    from libdmet_preview_tpu.ints.md import Shell
    from libdmet_preview_tpu.ints.gth import gth_nl_block, _h_full
    pp = {"zion": 6.0, "rloc": 0.3, "cloc": [],
          "nl": [(0, 0.35, _h_full(0, [8.0, 2.5])),
                 (1, 0.42, _h_full(1, [3.0, 1.2])),
                 (2, 0.38, _h_full(2, [-5.0, 0.7]))]}
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    base = gth_nl_block(Shell(A, 0, [(0.9, 1.0)]),
                        Shell(B, 0, [(0.6, 1.0)]), pp, C0)[0, 0]
    rng = np.random.default_rng(7)
    for _ in range(3):
        R = Rotation.random(random_state=rng).as_matrix()
        rot = gth_nl_block(Shell(R @ A, 0, [(0.9, 1.0)]),
                           Shell(R @ B, 0, [(0.6, 1.0)]), pp,
                           R @ C0)[0, 0]
        assert abs(rot - base) < 1e-12


def test_erfc_kernel_identity():
    """nuc_block erfc == bare - erf exactly (all general-l paths)."""
    from libdmet_preview_tpu.ints.md import Shell, nuc_block
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    for l in (0, 1, 2):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 1, [(0.6, 1.0)])
        eta = 0.73
        v_erfc = nuc_block(sh1, sh2, [1.5], [C0], eta=eta, screen="erfc")
        v_bare = nuc_block(sh1, sh2, [1.5], [C0])
        v_erf = nuc_block(sh1, sh2, [1.5], [C0], eta=eta, screen="erf")
        assert np.abs(v_erfc - (v_bare - v_erf)).max() < 1e-14


_FAKE_PP = None


def _fake_species():
    global _FAKE_PP
    if _FAKE_PP is None:
        from libdmet_preview_tpu.ints.gth import _h_full
        _FAKE_PP = {"zion": 4.0, "rloc": 0.45,
                    "cloc": [-6.0, 1.1, -0.3, 0.05],
                    "nl": [(0, 0.42, _h_full(0, [5.9, 3.2])),
                           (1, 0.48, _h_full(1, [2.7])),
                           (2, 0.40, _h_full(2, [-4.0]))]}
    return _FAKE_PP


_XBASIS = {("C", "mini"): [(0, [(1.4, 1.0), (0.8, 0.6)]),
                           (1, [(0.9, 1.0)])]}


def test_pbc_pp_vacuum_limit_vs_molecular():
    """_pp_sr_matrix (general l + C3/C4) in a large-vacuum cell equals
    the molecular short-range operators (all terms are short-ranged, so
    the vacuum limit converges at Gaussian speed)."""
    from libdmet_preview_tpu.ints import pbc as pbcmod
    from libdmet_preview_tpu.ints.gth import (gth_loc_sr_block,
                                              gth_nl_block)
    fake = _fake_species()
    atoms = [("C", (0.1, -0.2, 0.15)), ("C", (1.3, 0.6, 1.1))]
    cell = pbcmod.PbcCell(atoms, np.diag([14.0, 14.0, 14.0]),
                          basis="mini", basis_data=_XBASIS,
                          precision=1e-10)
    cell.pps = [fake, fake]
    cell.charges = np.asarray([fake["zion"]] * 2)
    V = cell._pp_sr_matrix()
    nao = cell.nao
    Vref = np.zeros((nao, nao))
    for i, shi in enumerate(cell.shells):
        i0, i1 = cell.shell_slices[i]
        for j, shj in enumerate(cell.shells):
            j0, j1 = cell.shell_slices[j]
            blk = np.zeros((shi.nc, shj.nc))
            for A, pp in enumerate(cell.pps):
                blk += gth_loc_sr_block(shi, shj, pp, cell.coords[A])
                blk += gth_nl_block(shi, shj, pp, cell.coords[A])
            Vref[i0:i1, j0:j1] = blk
    assert np.abs(V - Vref).max() < 1e-7


def test_pbc_pp_stripe_equals_dense():
    """The stripe (translation-symmetric) assembly of the general-l
    nonlocal + C3/C4 local PP matrix equals the dense assembly."""
    from libdmet_preview_tpu.ints import pbc as pbcmod
    fake = _fake_species()
    L = 4.0
    atoms = [("C", (0.0, 0.0, 0.15)), ("C", (0.0, 0.0, L / 2 + 0.15))]
    kw = dict(basis="mini", basis_data=_XBASIS, precision=1e-10)
    cell_d = pbcmod.PbcCell(atoms, np.diag([10.0, 10.0, L]), **kw)
    cell_s = pbcmod.PbcCell(atoms, np.diag([10.0, 10.0, L]), **kw)
    for c in (cell_d, cell_s):
        c.pps = [fake, fake]
        c.charges = np.asarray([fake["zion"]] * 2)
    cell_s.set_translations(2, np.array([[0.0, 0.0, 0.0],
                                         [0.0, 0.0, L / 2]]))
    Vd = cell_d._pp_sr_matrix()
    Vs = cell_s._pp_sr_matrix()
    assert np.abs(Vd - Vs).max() < 1e-9
