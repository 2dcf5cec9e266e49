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
