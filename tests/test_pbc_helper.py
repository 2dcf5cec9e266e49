"""
k-resolved JK builders (ops/pbc_helper.py: 7d k-ERI JK, GDF-factor JK,
GHF JK, eri -> GDF) against the supercell brute force -- the reference
pbc_helper.py:276-565 capabilities re-owned natively.
"""

import numpy as np
import pytest


def _trans_inv_eri(ncells, nlo, seed=0):
    """Random translation-invariant 8-fold-symmetric supercell ERI."""
    rng = np.random.RandomState(seed)
    ns = ncells * nlo
    # build from random symmetric DF factors with banded structure
    naux = 3 * nlo
    L = np.zeros((naux * ncells, ns, ns))
    x = 0
    for c in range(ncells):
        for a in range(naux):
            m = np.zeros((ns, ns))
            blk = rng.randn(nlo, nlo) * 0.4
            blk = blk + blk.T
            cpl = rng.randn(nlo, nlo) * 0.15
            for C in range(ncells):
                i = ((C + c) % ncells) * nlo
                m[i:i + nlo, i:i + nlo] += blk
                j = ((C + c + 1) % ncells) * nlo
                m[i:i + nlo, j:j + nlo] += cpl
                m[j:j + nlo, i:i + nlo] += cpl.T
            L[x] = m
            x += 1
    eri = np.einsum("xpq, xrs -> pqrs", L, L, optimize=True)
    return eri


def _dm_k_from_stripe(ncells, nlo, spin=1, seed=3):
    rng = np.random.RandomState(seed)
    st = rng.randn(spin, ncells, nlo, nlo) * 0.3
    # hermitian stripes: st[-R] = st[R]^T
    for R in range(ncells):
        mR = (-R) % ncells
        st[:, mR] = np.swapaxes(st[:, R], -1, -2) if mR != R else \
            0.5 * (st[:, R] + np.swapaxes(st[:, R], -1, -2))
    f = np.fft.fftfreq(ncells)
    P = np.exp(-2j * np.pi * np.outer(f, np.arange(ncells)))
    dm_k = np.einsum("kR, tRpq -> tkpq", P, st)
    dm_full = np.zeros((spin, ncells * nlo, ncells * nlo))
    for ci in range(ncells):
        for cj in range(ncells):
            R = (ci - cj) % ncells
            dm_full[:, ci * nlo:(ci + 1) * nlo,
                    cj * nlo:(cj + 1) * nlo] = st[:, R]
    return st, dm_k, dm_full


def _jk_supercell(eri, dm_full):
    vj = np.einsum("pqrs, trs -> tpq", eri, dm_full, optimize=True)
    vk = np.einsum("pqrs, trq -> tps", eri, dm_full, optimize=True)
    return vj, vk


def _full_to_k(m_full, ncells, nlo):
    spin = m_full.shape[0]
    f = np.fft.fftfreq(ncells)
    P = np.exp(-2j * np.pi * np.outer(f, np.arange(ncells)))
    out = np.zeros((spin, ncells, nlo, nlo), dtype=complex)
    for k in range(ncells):
        for ci in range(ncells):
            for cj in range(ncells):
                out[:, k] += (P[k, ci] * P[k, cj].conj()
                              * m_full[:, ci * nlo:(ci + 1) * nlo,
                                       cj * nlo:(cj + 1) * nlo])
    return out / ncells


def test_jk_from_eri_7d_vs_supercell():
    """7d k-ERI JK == supercell JK transformed to k (both J and K)."""
    from libdmet_preview_tpu.ops import pbc_helper as ph
    ncells, nlo = 4, 2
    eri = _trans_inv_eri(ncells, nlo)
    eri_k = ph.eri_R_to_eri_7d(eri, ncells, nlo)
    st, dm_k, dm_full = _dm_k_from_stripe(ncells, nlo)
    vj, vk = ph.get_jk_from_eri_7d(eri_k, dm_k)
    vj_ref, vk_ref = _jk_supercell(eri, dm_full)
    vj_ref_k = _full_to_k(vj_ref, ncells, nlo)
    vk_ref_k = _full_to_k(vk_ref, ncells, nlo)
    assert np.abs(vj - vj_ref_k).max() < 1e-9
    assert np.abs(vk - vk_ref_k).max() < 1e-9


def test_jk_from_gdf_vs_eri_7d():
    """GDF-factor JK (scalable path, no 7d tensor) == 7d k-ERI JK."""
    from libdmet_preview_tpu.ops import pbc_helper as ph
    ncells, nlo = 4, 2
    eri = _trans_inv_eri(ncells, nlo)
    eri_k = ph.eri_R_to_eri_7d(eri, ncells, nlo)
    factors = ph.eri_to_gdf(eri, ncells, nlo, tol=1e-12)
    st, dm_k, dm_full = _dm_k_from_stripe(ncells, nlo, spin=2, seed=9)
    vj1, vk1 = ph.get_jk_from_eri_7d(eri_k, dm_k)
    vj2, vk2 = ph.get_jk_from_gdf(factors, dm_k)
    assert np.abs(vj1 - vj2).max() < 1e-8
    assert np.abs(vk1 - vk2).max() < 1e-8


def test_jk_ghf_vs_spin_blocks():
    """GHF JK with a block-diagonal generalized density reduces to the
    UHF JK per spin; with off-diagonal blocks K_ab is Hermitian-
    consistent and matches the brute-force spin-orbital contraction."""
    from libdmet_preview_tpu.ops import pbc_helper as ph
    rng = np.random.RandomState(2)
    n = 3
    L = rng.randn(8, n, n) * 0.5
    L = L + np.swapaxes(L, -1, -2)
    g = np.einsum("xpq, xrs -> pqrs", L, L, optimize=True)
    M = rng.randn(8, n, n) * 0.4
    M = M + np.swapaxes(M, -1, -2)
    g2 = np.einsum("xpq, xrs -> pqrs", M, M, optimize=True)
    gab = np.einsum("xpq, xrs -> pqrs", L, M, optimize=True)
    dm = rng.randn(2 * n, 2 * n) * 0.3
    dm = dm + dm.T
    vj, vk = ph.get_jk_ghf((g, g2, gab), dm)
    # brute-force spin-orbital ERI
    G = np.zeros((2 * n,) * 4)
    G[:n, :n, :n, :n] = g
    G[n:, n:, n:, n:] = g2
    G[:n, :n, n:, n:] = gab
    G[n:, n:, :n, :n] = gab.transpose(2, 3, 0, 1)
    vj_ref = np.einsum("pqrs, rs -> pq", G, dm)
    vk_ref = np.einsum("pqrs, rq -> ps", G, dm)
    assert np.abs(vj - vj_ref).max() < 1e-10
    assert np.abs(vk - vk_ref).max() < 1e-10
