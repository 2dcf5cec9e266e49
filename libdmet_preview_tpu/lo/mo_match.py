"""
MO matching and rotation for solver restart
(reference /root/reference/libdmet/basis_transform/make_basis.py:990-1079
find_closest_mo / get_mo_ovlp / trans_mo capability).

Given two MO sets, find the orthogonal rotation of the second that best
matches the first (orthogonal Procrustes via SVD of the overlap) so that
amplitude/CI restart files stay usable across DMET iterations.
"""

import numpy as np


def get_mo_ovlp(mo1, mo2, ovlp=None):
    """<mo1 | mo2> overlap matrix; per-spin if a leading spin dim exists."""
    mo1, mo2 = np.asarray(mo1), np.asarray(mo2)
    if mo1.ndim == 3:
        return np.asarray([get_mo_ovlp(a, b, ovlp)
                           for a, b in zip(mo1, mo2)])
    if ovlp is None:
        return mo1.conj().T @ mo2
    return mo1.conj().T @ np.asarray(ovlp) @ mo2


def trans_mo(mo, u):
    """Rotate MOs by u (per spin if batched)."""
    mo, u = np.asarray(mo), np.asarray(u)
    if mo.ndim == 3:
        return np.asarray([m @ w for m, w in zip(mo, u)])
    return mo @ u


def find_closest_mo(mo_new, mo_ref, ovlp=None, return_rotmat=False):
    """Rotate mo_new to maximize overlap with mo_ref (orthogonal
    Procrustes): u = V W^T from SVD of <mo_new | mo_ref>.  Returns the
    rotated MOs (and the rotation if requested)."""
    mo_new = np.asarray(mo_new)
    if mo_new.ndim == 3:
        outs = [find_closest_mo(m, r, ovlp, return_rotmat=True)
                for m, r in zip(mo_new, np.asarray(mo_ref))]
        mos = np.asarray([o[0] for o in outs])
        if return_rotmat:
            return mos, np.asarray([o[1] for o in outs])
        return mos
    S = get_mo_ovlp(mo_new, mo_ref, ovlp)
    v, _, wt = np.linalg.svd(S)
    u = v @ wt
    mo_rot = mo_new @ u
    if return_rotmat:
        return mo_rot, u
    return mo_rot
