"""
Embedding-ERI transforms from factorized two-electron integrals
(TPU-native rewrite of the reference's hot core,
/root/reference/libdmet/basis_transform/eri_transform.py:44-1500).

The reference streams CDERI chunks from HDF5 per (ki, kj) momentum pair
and accumulates eri += w * L^dagger L on the CPU.  Here the density-fitted
(Cholesky) factors live on device and the whole transform is two batched
GEMMs that XLA tiles onto the MXU:

    L_emb[x, i, j] = C[p, i] L[x, p, q] C[q, j]          (AO->EO rotation)
    eri[s]         = einsum('xij, xkl -> ijkl', La, Lb)  (syrk-like)

For the molecular/ring path the factors come from a pivoted Cholesky of
the exact ERI (utils analog of reference utils/cholesky.py); for a
periodic GDF path the same kernel consumes per-k CDERI pairs.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def cholesky_eri(eri, tol=1e-9, max_rank=None):
    """Pivoted (modified) Cholesky factorization of a (n, n, n, n) chemist
    ERI: eri ~= sum_x L[x] (x) L[x], L (naux, n, n)
    (reference utils/cholesky.py:21-117 capability)."""
    eri = np.asarray(eri)
    n = eri.shape[0]
    M = eri.reshape(n * n, n * n).copy()
    diag = np.diag(M).copy()
    if max_rank is None:
        max_rank = n * n
    Ls = []
    for _ in range(max_rank):
        p = int(np.argmax(diag))
        dmax = diag[p]
        if dmax < tol:
            break
        l = M[:, p] / np.sqrt(dmax)
        Ls.append(l)
        M -= np.outer(l, l)
        diag = np.maximum(np.diag(M), 0.0)
    L = np.asarray(Ls).reshape(len(Ls), n, n)
    # symmetrize (pq) since eri has (pq|rs) = (qp|rs) for real orbitals
    return 0.5 * (L + L.transpose(0, 2, 1))


@jax.jit
def _rotate_chol(L, C):
    """(naux, n, n) x (n, neo) -> (naux, neo, neo)."""
    return jnp.einsum("xpq, pi, qj -> xij", L, C, C, optimize=True)


@jax.jit
def _syrk_eri(La, Lb):
    return jnp.einsum("xij, xkl -> ijkl", La, Lb, optimize=True)


def get_emb_eri_chol(L, basis):
    """Embedding ERI from Cholesky/DF factors.

    L: (naux, nsite, nsite) factors in the (LO, full-lattice) site basis;
    basis: (spin, ncells, nlo, neo) embedding basis (R stripe).
    Returns (spin_pair, neo, neo, neo, neo) with blocks [aa] or
    [aa, bb, ab] (chemist), matching embham._emb_H2's contract."""
    basis = np.asarray(basis)
    spin, ncells, nlo, neo = basis.shape
    C = basis.reshape(spin, ncells * nlo, neo)
    Lj = jnp.asarray(L)
    Ls = [_rotate_chol(Lj, jnp.asarray(C[s])) for s in range(spin)]
    if spin == 1:
        return np.asarray(_syrk_eri(Ls[0], Ls[0]))[None]
    out = [
        _syrk_eri(Ls[0], Ls[0]),
        _syrk_eri(Ls[1], Ls[1]),
        _syrk_eri(Ls[0], Ls[1]),
    ]
    return np.asarray([np.asarray(x) for x in out])


def get_emb_eri_gso_chol(L, basis):
    """GSO (particle-hole transformed) embedding ERI from Cholesky/DF
    factors (reference eri_transform.py:1104-1311 get_emb_eri_gso role).

    The transformed two-body [aa: +g, bb: +g, ab: -g] of one spatial ERI
    g = sum_x L_x (x) L_x factorizes exactly:

        g_gso = sum_x (La_x - Lb_x) (x) (La_x - Lb_x)

    with La/Lb the factors rotated by the a/b species blocks of the GSO
    embedding basis -- one subtraction plus the same rotate+syrk kernel.

    L: (naux, nsite, nsite) in the (LO, full-lattice) site basis per
    SPECIES sub-block index; basis: (1, ncells, nso, neo) GSO basis with
    rows [:nao] = a-species, [nao:] = b-species per cell.
    Returns (neo,)*4 chemist."""
    basis = np.asarray(basis)
    if basis.ndim == 4:
        basis = basis[0]
    ncells, nso, neo = basis.shape
    nao = nso // 2
    Ca = basis[:, :nao, :].reshape(ncells * nao, neo)
    Cb = basis[:, nao:, :].reshape(ncells * nao, neo)
    Lj = jnp.asarray(L)
    La = _rotate_chol(Lj, jnp.asarray(Ca))
    Lb = _rotate_chol(Lj, jnp.asarray(Cb))
    Ld = La - Lb
    return np.asarray(_syrk_eri(Ld, Ld))


def get_emb_eri_mol(eri_full, basis):
    """Direct (un-factorized) embedding transform; brute-force oracle for
    get_emb_eri_chol (reference eri_transform.py:1429 get_emb_eri_mol)."""
    basis = np.asarray(basis)
    spin, ncells, nlo, neo = basis.shape
    C = basis.reshape(spin, ncells * nlo, neo)
    g = jnp.asarray(eri_full)

    def t4(Cp, Cq):
        return np.asarray(jnp.einsum(
            "pqrs, pi, qj, rk, sl -> ijkl", g, Cp, Cp, Cq, Cq,
            optimize=True))

    Cs = [jnp.asarray(C[s]) for s in range(spin)]
    if spin == 1:
        return t4(Cs[0], Cs[0])[None]
    return np.asarray([t4(Cs[0], Cs[0]), t4(Cs[1], Cs[1]),
                       t4(Cs[0], Cs[1])])
