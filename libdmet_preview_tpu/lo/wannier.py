"""
Wannier-style localized orbitals
(reference /root/reference/libdmet/lo/pywannier90.py:73-700 W90 driver and
lo/proj_wannier.py:288-400 projection guesses).

The reference drives the external wannier90 library through ctypes.  The
TPU-native build keeps the same *capability* -- a k-resolved set of
localized orbitals spanning selected bands from initial guesses -- via the
analytic projection method (the proj_wannier path, which is also what
wannier90 uses as its starting point):

    A(k) = C_mo(k)^H S(k) g        (project guesses onto the bands)
    U(k) = A(k) (A^H A)^{-1/2}     (per-k Lowdin orthonormalization)
    C_lo(k) = C_mo(k) U(k)

For isolated bands this is the global minimum of the gauge-invariant
spread part; SCDM (lo/scdm.py) covers the disentangled/smeared case.
All arithmetic is host-side numpy (complex allowed off-device).
"""

import numpy as np

from libdmet_preview_tpu.utils import logger as log


def _as_complex(A):
    A = A if not isinstance(A, (tuple, list)) else \
        np.asarray(A[0]) + 1j * np.asarray(A[1])
    return np.asarray(A)


def proj_wannier(C_mo_k, guess, ovlp_k=None, band_idx=None):
    """Projected Wannier gauge (reference proj_wannier.py:288-400).

    C_mo_k: (nk, nao, nmo) complex or (re, im) pair; guess: (nao, nlo)
    real initial-guess orbitals (e.g. unit vectors on target AOs);
    ovlp_k: optional (nk, nao, nao); band_idx: bands to span (default
    the first nlo).  Returns complex (nk, nao, nlo)."""
    C = _as_complex(C_mo_k)
    nk = C.shape[0]
    guess = np.asarray(guess)
    nlo = guess.shape[-1]
    if band_idx is None:
        band_idx = np.arange(nlo)
    out = np.empty((nk, C.shape[1], nlo), dtype=complex)
    for k in range(nk):
        Cb = C[k][:, band_idx]
        S = np.eye(C.shape[1]) if ovlp_k is None else _as_complex(ovlp_k)[k]
        A = Cb.conj().T @ S @ guess
        u, s, vt = np.linalg.svd(A, full_matrices=False)
        if s.min() < 1e-8:
            log.warn("proj_wannier: near-singular projection at k=%d "
                     "(min sv %.2e) -- guesses poorly overlap the bands",
                     k, s.min())
        out[k] = Cb @ (u @ vt)
    return out


def get_C_ao_lo_wannier(lattice, C_mo_k, guess, ovlp_k=None, band_idx=None):
    """Lattice-facing wrapper (reference make_basis.py:26-133
    get_C_ao_lo_wannier role): projected-Wannier C_ao_lo as a (re, im)
    pair shaped (1, nk, nao, nlo), directly usable as the lattice LO
    basis."""
    C = proj_wannier(C_mo_k, guess, ovlp_k=ovlp_k, band_idx=band_idx)
    return (np.ascontiguousarray(C.real)[None],
            np.ascontiguousarray(C.imag)[None])


class W90(object):
    """Interface stub for the external wannier90 library (reference
    pywannier90.py:73-640).  The library is not part of this image; the
    class validates inputs and raises with a pointer to the in-repo
    alternatives (proj_wannier / SCDM) unless libwannier.so is found."""

    def __init__(self, *args, **kwargs):
        import ctypes.util
        path = ctypes.util.find_library("wannier")
        if path is None:
            raise ImportError(
                "libwannier.so not available in this environment; use "
                "lo.wannier.proj_wannier / get_C_ao_lo_wannier or "
                "lo.scdm for localized orbitals")
        self._lib_path = path
        self.args = args
        self.kwargs = kwargs
