"""
Intrinsic atomic orbitals (Knizia, JCTC 9, 4834 (2013))
(reference analog: /root/reference/libdmet/lo/iao.py:58-211 and the
complementary virtual PAOs, iao.py:212-346).

Given occupied MOs in a large basis B1 and a minimal reference basis B2:

    P12 = S1^-1 S12,   C~ = orth( S1^-1 S12 S2^-1 S21 C )
    A   = (CC'S1) (C~C~'S1) P12 + (1 - CC'S1)(1 - C~C~'S1) P12

Lowdin-orthonormalized in the S1 metric.  The virtual complement (PAOs)
spans the remainder of B1 after projecting out the IAOs.
"""

import numpy as np

from libdmet_preview_tpu.lo.lowdin import lowdin_orth, vec_lowdin


def get_iao(S1, S12, S2, C_occ):
    """IAO coefficients (nao1, n_minimal) in basis B1, S1-orthonormal."""
    S1_inv = np.linalg.inv(S1)
    S2_inv = np.linalg.inv(S2)
    P12 = S1_inv @ S12
    # project occupied MOs into the minimal space and back, re-orthonormal
    Ct = P12 @ (S2_inv @ (S12.T @ C_occ))
    Ct = vec_lowdin(Ct, S1)
    C = C_occ
    PC = C @ (C.T @ S1)
    PCt = Ct @ (Ct.T @ S1)
    A = PC @ PCt @ P12 + (np.eye(S1.shape[0]) - PC) @ \
        (np.eye(S1.shape[0]) - PCt) @ P12
    return vec_lowdin(A, S1)


def get_iao_virt(S1, C_iao, virt_ao_idx=None, tol=1e-8):
    """Complementary virtual orbitals (PAOs): project the IAOs out of
    selected AOs and Lowdin-orthonormalize (reference iao.py:212).

    virt_ao_idx: AOs to project (the shells absent from the minimal
    reference basis) -- keeps the PAOs atom-attached and, on a ring,
    translationally equivariant.  Defaults to an eigenbasis of the full
    complement."""
    nao = S1.shape[0]
    niao = C_iao.shape[1]
    P = np.eye(nao) - C_iao @ (C_iao.T @ S1)
    if virt_ao_idx is not None:
        cand = P[:, list(virt_ao_idx)]
        return vec_lowdin(cand, S1)
    w, v = np.linalg.eigh(P.T @ S1 @ P)
    keep = w > tol
    C_virt = P @ v[:, keep] / np.sqrt(w[keep])
    assert C_virt.shape[1] == nao - niao
    return C_virt
