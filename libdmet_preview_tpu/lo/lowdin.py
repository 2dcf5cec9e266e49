"""
Lowdin orthogonalization utilities
(reference analog: /root/reference/libdmet/lo/lowdin.py:22-360).
"""

import numpy as np


def lowdin_orth(S, tol=1e-12):
    """S^{-1/2} (symmetric orthogonalization matrix)."""
    w, v = np.linalg.eigh(S)
    if np.min(w) < tol:
        raise ValueError("overlap matrix nearly singular: min eig %g"
                         % np.min(w))
    return (v / np.sqrt(w)) @ v.T


def vec_lowdin(C, S=None):
    """Lowdin-orthonormalize the columns of C in metric S
    (reference lo/lowdin.py:103)."""
    if S is None:
        M = C.T @ C
    else:
        M = C.T @ S @ C
    return C @ lowdin_orth(M)


def check_orthonormal(C, S=None, tol=1e-10):
    M = C.T @ C if S is None else C.T @ S @ C
    return np.max(np.abs(M - np.eye(M.shape[0]))) < tol
