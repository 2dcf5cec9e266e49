"""
LDA/LSDA exchange-correlation functionals with autodiff potentials
(TPU-native replacement for the capability the reference borrows from
PySCF's libxc bindings; consumers: KS-DFT mean field and the DFT-in-DMET
double counting, /root/reference/libdmet/routine/pdft_helper.py:43-500).

Key design choice: v_xc is never hand-coded.  E_xc[rho] is a jitted
function of the density matrix (through rho(r) on a quadrature grid), and
the potential matrix is exactly dE_xc/dD by `jax.grad` -- the
Daleckii-Krein analog of what makes the rest of this framework
differentiable.  Functional and potential can therefore never disagree.

Functionals: Slater exchange + VWN5 correlation (standard public
parametrizations).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

_TINY = 1e-30

# Slater exchange constant: ex = -Cx * rho^{4/3} (per spin: spin-scaling)
_CX = (3.0 / 4.0) * (3.0 / np.pi) ** (1.0 / 3.0)

# VWN5 parameters: (A, x0, b, c) for paramagnetic / ferromagnetic /
# spin-stiffness fits (standard published constants)
_VWN = {
    "P": (0.0310907, -0.10498, 3.72744, 12.9352),
    "F": (0.01554535, -0.325, 7.06042, 18.0578),
    "A": (-1.0 / (6.0 * np.pi ** 2), -0.00475840, 1.13107, 13.0045),
}


def _vwn_eps(rs, key):
    A, x0, b, c = _VWN[key]
    x = jnp.sqrt(rs)
    X = x * x + b * x + c
    X0 = x0 * x0 + b * x0 + c
    Q = np.sqrt(4.0 * c - b * b)
    atn = jnp.arctan(Q / (2.0 * x + b))
    return A * (jnp.log(x * x / X) + 2.0 * b / Q * atn
                - b * x0 / X0 * (jnp.log((x - x0) ** 2 / X)
                                 + 2.0 * (b + 2.0 * x0) / Q * atn))


def _f_zeta(zeta):
    return (jnp.power(1.0 + zeta, 4.0 / 3.0)
            + jnp.power(1.0 - zeta, 4.0 / 3.0) - 2.0) \
        / (2.0 ** (4.0 / 3.0) - 2.0)


_FPP0 = 4.0 / (9.0 * (2.0 ** (1.0 / 3.0) - 1.0))   # f''(0)


def lsda_exc_density(rho_a, rho_b):
    """e_xc(r) * rho(r) for the LSDA (Slater X + VWN5 C); elementwise."""
    rho_a = jnp.maximum(rho_a, _TINY)
    rho_b = jnp.maximum(rho_b, _TINY)
    rho = rho_a + rho_b
    # exchange (exact spin scaling)
    ex = -_CX * (2.0 ** (1.0 / 3.0)) * (rho_a ** (4.0 / 3.0)
                                        + rho_b ** (4.0 / 3.0))
    # correlation (VWN5 interpolation)
    rs = (3.0 / (4.0 * np.pi * rho)) ** (1.0 / 3.0)
    zeta = (rho_a - rho_b) / rho
    eP = _vwn_eps(rs, "P")
    eF = _vwn_eps(rs, "F")
    eA = _vwn_eps(rs, "A")
    f = _f_zeta(zeta)
    z4 = zeta ** 4
    ec = eP + eA * f / _FPP0 * (1.0 - z4) + (eF - eP) * f * z4
    return ex + ec * rho


def slater_exc_density(rho_a, rho_b):
    """Exchange-only (Slater/Dirac) energy density; analytic-oracle and
    Xalpha use."""
    rho_a = jnp.maximum(rho_a, _TINY)
    rho_b = jnp.maximum(rho_b, _TINY)
    return -_CX * (2.0 ** (1.0 / 3.0)) * (rho_a ** (4.0 / 3.0)
                                          + rho_b ** (4.0 / 3.0))


_XC_FUNCS = {"lsda": lsda_exc_density, "lda": lsda_exc_density,
             "slater": slater_exc_density}


@partial(jax.jit, static_argnames=("restricted", "xc"))
def _exc_from_dm(dm, ao, w, restricted, xc="lsda"):
    """E_xc of a density matrix: dm (nao, nao) spin-traced total if
    restricted, else (2, nao, nao) per spin."""
    func = _XC_FUNCS[xc]
    if restricted:
        rho = 0.5 * jnp.einsum("pg, pq, qg -> g", ao, dm, ao)
        return jnp.sum(w * func(rho, rho))
    rho_a = jnp.einsum("pg, pq, qg -> g", ao, dm[0], ao)
    rho_b = jnp.einsum("pg, pq, qg -> g", ao, dm[1], ao)
    return jnp.sum(w * func(rho_a, rho_b))


def eval_exc_vxc(dm, ao, w, restricted=True, xc="lsda"):
    """(E_xc, v_xc) with v_xc = dE_xc/dD by autodiff.

    restricted: dm is the spin-traced TOTAL density matrix; v_xc is the
    per-spin potential (the derivative wrt the total D already gives the
    spin potential because E depends on D/2 per channel).
    """
    dm = jnp.asarray(dm)
    ao = jnp.asarray(ao)
    w = jnp.asarray(w)
    exc, vxc = jax.value_and_grad(_exc_from_dm)(dm, ao, w, restricted,
                                               xc)
    # symmetrize the gradient wrt the (symmetric-matrix) argument
    vxc = 0.5 * (vxc + jnp.swapaxes(vxc, -1, -2))
    return float(exc), np.asarray(vxc)
