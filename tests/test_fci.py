"""
FCI solver validated against a brute-force determinant Hamiltonian.

The oracle builds the full many-body H over (alpha, beta) determinant pairs
directly from Slater-Condon rules applied through explicit second-quantized
operator algebra on bitstrings -- completely independent of the link-table
sigma algorithm under test.
"""

import numpy as np
import pytest

from libdmet_preview_tpu.solvers import fci


# ----------------------------------------------------------------------
# brute-force oracle
# ----------------------------------------------------------------------

def apply_ops_brute(norb, strings, p, q):
    """Matrix of E_pq = a_p^+ a_q on the given string basis (one spin)."""
    addr = {int(s): i for i, s in enumerate(strings)}
    n = len(strings)
    M = np.zeros((n, n))
    for I, s in enumerate(strings):
        s = int(s)
        if not (s >> q) & 1:
            continue
        s1 = s & ~(1 << q)
        sign_q = (-1) ** bin(s & ((1 << q) - 1)).count("1")
        if (s1 >> p) & 1:
            continue
        s2 = s1 | (1 << p)
        sign_p = (-1) ** bin(s1 & ((1 << p) - 1)).count("1")
        M[addr[s2], I] += sign_p * sign_q
    return M


def build_H_brute(h1e, eri, norb, nelec):
    """Full H in the determinant-pair basis from E_pq operator matrices.

    h1e = (h1a, h1b); eri = (g_aa, g_ab, g_bb) chemist notation."""
    nea, neb = nelec
    sa = fci.make_strings(norb, nea)
    sb = fci.make_strings(norb, neb)
    na, nb = len(sa), len(sb)
    Ia, Ib = np.eye(na), np.eye(nb)
    Ea = np.zeros((norb, norb, na, na))
    Eb = np.zeros((norb, norb, nb, nb))
    for p in range(norb):
        for q in range(norb):
            Ea[p, q] = apply_ops_brute(norb, sa, p, q)
            Eb[p, q] = apply_ops_brute(norb, sb, p, q)
    h1a, h1b = h1e
    g_aa, g_ab, g_bb = eri
    dim = na * nb
    H = np.zeros((dim, dim))

    def kron(A, B):
        return np.kron(A, B)

    for p in range(norb):
        for q in range(norb):
            H += h1a[p, q] * kron(Ea[p, q], Ib)
            H += h1b[p, q] * kron(Ia, Eb[p, q])
    # two-body: 1/2 sum (pq|rs) [E_pq E_rs - delta_qr E_ps] per spin pair
    for p in range(norb):
        for q in range(norb):
            for r in range(norb):
                for s in range(norb):
                    # aa
                    term = Ea[p, q] @ Ea[r, s]
                    if q == r:
                        term = term - Ea[p, s]
                    H += 0.5 * g_aa[p, q, r, s] * kron(term, Ib)
                    # bb
                    term = Eb[p, q] @ Eb[r, s]
                    if q == r:
                        term = term - Eb[p, s]
                    H += 0.5 * g_bb[p, q, r, s] * kron(Ia, term)
                    # ab + ba (E_pq^a E_rs^b commute)
                    H += g_ab[p, q, r, s] * kron(Ea[p, q], Eb[r, s])
    return H


def random_ints(norb, seed, spin_dep=False):
    rng = np.random.RandomState(seed)
    h1 = rng.rand(norb, norb) - 0.5
    h1 = h1 + h1.T
    # build an s8-symmetric ERI
    npair = norb * (norb + 1) // 2
    tmp = rng.rand(npair, npair) - 0.5
    tmp = tmp + tmp.T
    eri = np.zeros((norb,) * 4)
    tril = np.tril_indices(norb)
    buf = np.zeros((norb, norb))
    for ij in range(npair):
        buf[:] = 0
        buf[tril[0], tril[1]] = tmp[ij]
        buf = buf + buf.T - np.diag(np.diag(buf))
        eri[tril[0][ij], tril[1][ij]] = buf
        eri[tril[1][ij], tril[0][ij]] = buf
    if not spin_dep:
        return h1, eri
    h1b = rng.rand(norb, norb) - 0.5
    h1b = h1b + h1b.T
    g_ab = rng.rand(npair, npair) - 0.5
    eri_ab = np.zeros((norb,) * 4)
    for ij in range(npair):
        buf[:] = 0
        buf[tril[0], tril[1]] = g_ab[ij]
        buf = buf + buf.T - np.diag(np.diag(buf))
        eri_ab[tril[0][ij], tril[1][ij]] = buf
        eri_ab[tril[1][ij], tril[0][ij]] = buf
    return (h1, h1b), (eri, eri_ab, eri)


@pytest.mark.parametrize("norb,nelec", [(4, (2, 2)), (5, (2, 1)), (4, (3, 2))])
def test_fci_vs_brute_force_rhf_ints(norb, nelec):
    h1, eri = random_ints(norb, seed=norb * 10 + sum(nelec))
    H = build_H_brute((h1, h1), (eri, eri, eri), norb, nelec)
    w, v = np.linalg.eigh(H)
    e_ref = w[0]

    e, ci = fci.fci_kernel(h1, eri, norb, nelec, tol=1e-12)
    assert abs(e - e_ref) < 1e-9

    # hdiag must equal diag of brute-force H
    hd = fci.make_hdiag((h1, h1), (eri, eri, eri), norb, nelec)
    assert np.abs(hd.ravel() - np.diag(H)).max() < 1e-9


@pytest.mark.parametrize("norb,nelec", [(4, (2, 2)), (4, (2, 1))])
def test_fci_vs_brute_force_uhf_ints(norb, nelec):
    h1, eri = random_ints(norb, seed=77 + norb, spin_dep=True)
    H = build_H_brute(h1, eri, norb, nelec)
    w, v = np.linalg.eigh(H)
    e_ref = w[0]
    e, ci = fci.fci_kernel(h1, eri, norb, nelec, tol=1e-12)
    assert abs(e - e_ref) < 1e-9
    hd = fci.make_hdiag(h1, eri, norb, nelec)
    assert np.abs(hd.ravel() - np.diag(H)).max() < 1e-9


def test_fci_rdm():
    norb, nelec = 4, (2, 2)
    h1, eri = random_ints(norb, seed=3)
    H = build_H_brute((h1, h1), (eri, eri, eri), norb, nelec)
    w, v = np.linalg.eigh(H)
    e, ci = fci.fci_kernel(h1, eri, norb, nelec, tol=1e-12)

    ga, gb = fci.make_rdm1s(ci, norb, nelec)
    # oracle rdm1 via operator matrices
    sa = fci.make_strings(norb, nelec[0])
    sb = fci.make_strings(norb, nelec[1])
    na, nb = len(sa), len(sb)
    c = v[:, 0].reshape(na, nb)
    # fix gauge: compare with our ci up to sign
    if np.dot(c.ravel(), ci.ravel()) < 0:
        c = -c
    assert np.abs(np.abs(c) - np.abs(ci)).max() < 1e-6

    ga_ref = np.zeros((norb, norb))
    for p in range(norb):
        for q in range(norb):
            Ep = apply_ops_brute(norb, sa, p, q)
            ga_ref[p, q] = np.einsum("ab, ab", c, Ep @ c)
    assert np.abs(ga - 0.5 * (ga_ref + ga_ref.T)).max() < 1e-8

    # energy from rdms must reproduce E
    Gaa, Gbb, Gab = fci.make_rdm2s(ci, norb, nelec)
    E1 = np.einsum("pq, qp", h1, ga + gb)
    # note rdm1 symmetric here so pq/qp irrelevant
    E2 = (0.5 * np.einsum("pqrs, pqrs", eri, Gaa)
          + 0.5 * np.einsum("pqrs, pqrs", eri, Gbb)
          + np.einsum("pqrs, pqrs", eri, Gab))
    assert abs((E1 + E2) - e) < 1e-8
