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


def symmetrize_lo_kpair(C_re, C_im, neg_map):
    """Enforce time-reversal symmetry C(-k) = C(k)* on a k-resolved LO
    coefficient pair (reference system/analyze.py:18-151 LO
    symmetrization role): average each k with the conjugate of its -k
    partner.  neg_map[k] = index of -k.  Returns a new (re, im) pair."""
    import numpy as np
    C_re = np.asarray(C_re)
    C_im = np.asarray(C_im)
    out_re = 0.5 * (C_re + C_re[neg_map])
    out_im = 0.5 * (C_im - C_im[neg_map])
    return out_re, out_im


def check_lo_time_reversal(C_re, C_im, neg_map, tol=1e-9):
    """Max violation of C(-k) = C(k)* (0 for a symmetrized set)."""
    import numpy as np
    C_re = np.asarray(C_re)
    C_im = np.asarray(C_im)
    return max(float(np.abs(C_re - C_re[neg_map]).max()),
               float(np.abs(C_im + C_im[neg_map]).max()))


def make_real_columns(C_re, C_im, tol=1e-9):
    """Fix the column phase gauge so complex orbitals become real when a
    real gauge exists (reference make_basis.py:1096-1182
    detect_inv_sym/build_Martin_basis capability: at inversion-symmetric
    k points the Bloch orbitals admit a real representation).

    For c = e^{i theta} r with r real, sum_j c_j^2 = e^{2 i theta} |r|^2,
    so theta is half the phase of the column's plain (non-conjugated)
    self-product.  Returns (C_re', C_im', ok) with ok a per-column bool
    marking columns that became real to tol."""
    import numpy as np
    C_re = np.asarray(C_re, dtype=float)
    C_im = np.asarray(C_im, dtype=float)
    z2 = np.sum((C_re + 1j * C_im) ** 2, axis=-2)      # (..., ncols)
    theta = 0.5 * np.angle(z2)
    ph = np.exp(-1j * theta)
    C = (C_re + 1j * C_im) * ph[..., None, :]
    ok = np.abs(C.imag).max(axis=-2) < tol
    return (np.ascontiguousarray(C.real), np.ascontiguousarray(C.imag),
            ok)
