"""
SCDM localization (selected columns of the density matrix)
(reference analog: /root/reference/libdmet/lo/scdm.py:116-283).
"""

import numpy as np
import scipy.linalg as sla


def scdm(C, return_piv=False):
    """Localize orbitals C (nao, nmo) by QR with column pivoting on C^T
    (orthonormal metric assumed; apply to Lowdin-basis coefficients)."""
    Q, R, piv = sla.qr(C.T, pivoting=True)
    sel = piv[:C.shape[1]]
    X = C[sel, :]           # (nmo, nmo)
    # orthogonal Procrustes: rotate C onto the selected-column frame
    u, _, vt = np.linalg.svd(X.T, full_matrices=False)
    W = u @ vt
    C_loc = C @ W
    if return_piv:
        return C_loc, sel
    return C_loc


def scdm_smear(C, mo_energy, mu, sigma, kind="erfc", return_piv=False):
    """SCDM with smearing weights for entangled/metallic bands (reference
    scdm.py:116-283 weight functions): columns are weighted by an
    occupation-like window before the pivoted QR, so the selected
    columns favor the physically occupied manifold.

    kind: 'erfc' -> 0.5*erfc((e - mu)/sigma); 'gauss' ->
    exp(-((e - mu)/sigma)^2); 'fermi' -> Fermi function."""
    from scipy.special import erfc
    e = np.asarray(mo_energy)
    x = (e - mu) / sigma
    if kind == "erfc":
        w = 0.5 * erfc(x)
    elif kind == "gauss":
        w = np.exp(-x ** 2)
    elif kind == "fermi":
        w = 1.0 / (np.exp(np.clip(x, -100, 100)) + 1.0)
    else:
        raise ValueError("unknown smearing kind %s" % kind)
    Cw = np.asarray(C) * w[None, :]
    Q, R, piv = sla.qr(Cw.T, pivoting=True)
    sel = piv[:C.shape[1]]
    X = Cw[sel, :]
    u, _, vt = np.linalg.svd(X.T, full_matrices=False)
    W = u @ vt
    C_loc = np.asarray(C) @ W
    if return_piv:
        return C_loc, sel
    return C_loc


def scdm_k(C_k, return_piv=False):
    """k-point SCDM (reference scdm.py k-point path): one COMMON pivot
    set chosen from the k-summed orbital weight (so the localized gauge
    is translationally consistent), then a per-k orthogonal Procrustes
    onto the selected rows.

    C_k: complex (nk, nao, nmo) or a (re, im) pair.  Returns complex
    (nk, nao, nmo) localized coefficients."""
    if isinstance(C_k, (tuple, list)):
        C_k = np.asarray(C_k[0]) + 1j * np.asarray(C_k[1])
    C_k = np.asarray(C_k)
    nk, nao, nmo = C_k.shape
    dens = np.sum(np.abs(C_k) ** 2, axis=0)               # (nao, nmo)
    Q, R, piv = sla.qr(dens.T, pivoting=True)
    sel = piv[:nmo]
    out = np.empty_like(C_k)
    for k in range(nk):
        X = C_k[k][sel, :]
        u, _, vt = np.linalg.svd(X.conj().T, full_matrices=False)
        W = u @ vt
        out[k] = C_k[k] @ W
    if return_piv:
        return out, sel
    return out
