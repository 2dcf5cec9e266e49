"""
JK builders for lattice Hamiltonians (TPU-native rewrite of the pieces of
reference routine/pbc_helper.py used by the model path).
"""

import numpy as np
import jax
import jax.numpy as jnp


@jax.jit
def _jk_local(eri, dm):
    vj = jnp.einsum("ijkl, skl -> sij", eri, dm)
    vk = jnp.einsum("ilkj, skl -> sij", eri, dm)
    return vj, vk


def get_jk_local(eri, dm0):
    """J/K from a local (single-cell) ERI and the cell-averaged density
    rho(R=0) (reference pbc_helper.py:375-423).  Both are k-independent.

    dm0: (spin, nao, nao) real.  Returns (vj, vk) with shape
    (spin, nao, nao)."""
    dm0 = np.asarray(dm0)
    if dm0.ndim == 2:
        dm0 = dm0[None]
    vj, vk = _jk_local(jnp.asarray(eri), jnp.asarray(dm0))
    return np.asarray(vj), np.asarray(vk)


@jax.jit
def _jk_nearest(eri_R, dm_stripe, neg_map):
    """eri_R: (ncells, n, n, n, n) blocks (0 p 0 q | R r R s);
    dm_stripe: (spin, ncells, n, n) with block (ci, cj) = dm[(ci-cj) % N].

    vj is local (density in every cell identical); vk is a stripe:
      vj[p, q]    = sum_R eri_R[R, p, q, r, s] dm0[s, r]
      vk[R][p, s] = sum   eri_R[R, p, q, r, s] dm[R][r, q]
    (Coulomb/exchange of a translation-invariant state,
    reference pbc_helper.py:424-507)."""
    dm0 = dm_stripe[:, 0]
    vj = jnp.einsum("Rpqrs, tsr -> tpq", eri_R, dm0)
    # exchange needs the dm block (0, R) = stripe[R]^T (Hermitian dm)
    vk = jnp.einsum("Rpqrs, tRrq -> tRps", eri_R, dm_stripe)
    return vj, vk


def get_jk_nearest(eri_R, dm_stripe, neg_map=None):
    """J/K for the 'nearest' H2 format.  Returns (vj (spin, n, n),
    vk_stripe (spin, ncells, n, n))."""
    dm_stripe = np.asarray(dm_stripe)
    if dm_stripe.ndim == 3:
        dm_stripe = dm_stripe[None]
    vj, vk = _jk_nearest(jnp.asarray(eri_R), jnp.asarray(dm_stripe), None)
    return np.asarray(vj), np.asarray(vk)


def get_jk_full_bruteforce(lattice, eri_R, dm_stripe):
    """Oracle JK from the fully expanded supercell ERI ('nearest' blocks
    expanded to (nsites,)*4) -- test reference for get_jk_nearest."""
    ncells, n = eri_R.shape[0], eri_R.shape[1]
    ns = ncells * n
    big = np.zeros((ns,) * 4)
    for cI in range(ncells):
        for cR in range(ncells):
            cJ = lattice.add(cI, cR) if hasattr(lattice, "add") else \
                (cI + cR) % ncells
            big[cI * n:(cI + 1) * n, cI * n:(cI + 1) * n,
                cJ * n:(cJ + 1) * n, cJ * n:(cJ + 1) * n] = eri_R[
                    lattice.subtract(cJ, cI) if hasattr(lattice, "subtract")
                    else (cJ - cI) % ncells]
    dm_full = lattice.expand(np.asarray(dm_stripe))
    vj = np.einsum("pqrs, tsr -> tpq", big, dm_full)
    vk = np.einsum("pqrs, trq -> tps", big, dm_full)
    return vj, vk
