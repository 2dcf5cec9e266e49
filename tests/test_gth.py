"""
GTH pseudopotential blocks (ints/gth.py) against brute-force quadrature
and exact kernel identities.
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


def test_gth_nonlocal_vs_quadrature():
    """s-channel projector contribution vs quadrature with the explicit
    unit-normalized projector function."""
    from libdmet_preview_tpu.ints.md import Shell
    from libdmet_preview_tpu.ints.gth import GTH_PADE, gth_nl_block
    pp = GTH_PADE["C"]
    A = np.array([0.2, -0.1, 0.3])
    B = np.array([-0.4, 0.5, 0.1])
    C0 = np.array([0.1, 0.2, -0.2])
    pts, w = _grid()
    rC2 = ((pts - C0) ** 2).sum(-1)
    r0, h11 = pp["nl"][0]
    pfun = (np.pi * r0 * r0) ** -0.75 * np.exp(-rC2 / (2 * r0 ** 2))
    assert abs(w * np.sum(pfun ** 2) - 1.0) < 1e-10   # unit norm
    for comp, l in (("s", 0), ("px", 1)):
        sh1 = Shell(A, l, [(0.9, 1.0)])
        sh2 = Shell(B, 0, [(0.6, 1.0)])
        pa = w * np.sum(_chi(pts, A, 0.9, comp) * pfun)
        pb = w * np.sum(_chi(pts, B, 0.6, "s") * pfun)
        ana = gth_nl_block(sh1, sh2, pp, C0)[0, 0]
        assert abs(ana - h11 * pa * pb) < 1e-9


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
