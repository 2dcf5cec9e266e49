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
