"""
k <-> R transforms for stripe lattice operators (TPU-native, complex-free).

Replaces reference system/fourier.py:129-256.  TPU XLA has no complex128, so
k-space arrays are (re, im) real-pair tuples and the DFT over the (small)
cell mesh is a cos/sin matmul on the MXU (see ops/zlinalg.py).

Conventions (match reference fourier.py:160-178):
  FFTtoK: A(k) = sum_R e^{-i k.R} A(R)
  FFTtoT: A(R) = (1/Nk) sum_k e^{+i k.R} A(k)
"""

from libdmet_preview_tpu.ops import zlinalg

IMAG_DISCARD_TOL = 1e-5


def FFTtoK(A, kmesh):
    """Stripe R -> k; returns (re, im) pair."""
    return zlinalg.R2k(A, kmesh)


def FFTtoT(B, kmesh, tol=IMAG_DISCARD_TOL):
    """k pair -> stripe R (real part)."""
    return zlinalg.k2R(B, kmesh, real=True)


def R2k(A, kmesh, keep_complex=True):
    return zlinalg.R2k(A, kmesh)


def k2R(B, kmesh, tol=IMAG_DISCARD_TOL, real=True):
    return zlinalg.k2R(B, kmesh, real=real)


def get_phase(kmesh):
    """Complex phase matrix e^{+i k.R} (host-side, numpy; for tests)."""
    cos_t, sin_t = zlinalg.dft_tables(tuple(int(x) for x in kmesh))
    return cos_t + 1j * sin_t
