"""
Maximally-localized Wannier engine (lo/maxloc.py + lo/wannier.W90).

Reference role: /root/reference/libdmet/lo/pywannier90.py (external
wannier90 driver).  Oracles here are physics, not the Fortran library:
the B1 completeness condition, jax.grad of the spread functional vs the
analytic MV gradient, exact localization of a complete basis, and the
gauge-invariant part Omega_I as the single-band floor.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from libdmet_preview_tpu.lo import maxloc
from libdmet_preview_tpu.lo.wannier import W90


def ssh_bands(nkx=8, t1=1.0, t2=0.4, a=1.0, frac=0.4):
    """Dimerized chain, 2 sites/cell at x = 0 and frac*a (convention II:
    Bloch phases on cells only)."""
    latt = np.diag([a, 10.0, 10.0])
    kmesh = (nkx, 1, 1)
    kf = maxloc.kmesh_kpts_frac(kmesh)
    tau = np.array([[0.0, 0, 0], [frac * a, 0, 0]])
    C = np.zeros((nkx, 2, 2), dtype=complex)
    for i, k in enumerate(kf[:, 0]):
        ph = np.exp(2j * np.pi * k)
        h = np.array([[0, t1 + t2 * np.conj(ph)],
                      [t1 + t2 * ph, 0]])
        _, v = np.linalg.eigh(h)
        C[i] = v
    return C, kmesh, latt, tau


def rand_gauge(rng, nk, nw, amp=0.3):
    A = rng.randn(nk, nw, nw) + 1j * rng.randn(nk, nw, nw)
    W = (A - A.conj().swapaxes(-2, -1)) / 2
    return maxloc._expm_antiherm(jnp.asarray(W * amp))


def test_b1_condition_meshes():
    """sum_b w_b b (x) b = identity on the periodic dims, for 1D, 2D
    rectangular, 3D cubic, and a sheared (triclinic-ish) cell."""
    cases = [
        (np.diag([1.0, 9.0, 9.0]), (6, 1, 1)),
        (np.diag([1.0, 2.0, 9.0]), (4, 3, 1)),
        (np.diag([1.3, 1.3, 1.3]), (3, 3, 3)),
        (np.array([[1.0, 0, 0], [0.5, 0.9, 0], [0.1, 0.2, 1.4]]),
         (2, 2, 2)),
    ]
    for latt, kmesh in cases:
        bv = maxloc.kmesh_bvectors(latt, kmesh)
        outer = np.einsum("b, bi, bj -> ij", bv["w_b"], bv["b_cart"],
                          bv["b_cart"])
        pd = bv["pdims"]
        assert np.allclose(outer[np.ix_(pd, pd)], np.eye(len(pd)),
                           atol=1e-8), (latt, kmesh, outer)
        # non-periodic rows/cols carry nothing
        npd = [d for d in range(3) if d not in pd]
        if npd:
            assert np.allclose(outer[npd], 0.0, atol=1e-12)


def test_mv_gradient_vs_autodiff():
    """Analytic MV gradient == jax.grad of the pure spread functional:
    d/dt Omega(U e^{t dW}) at t=0 equals Re tr[G dW]."""
    rng = np.random.RandomState(3)
    C, kmesh, latt, tau = ssh_bands(nkx=6)
    M0, bv = maxloc.mmn_from_C(C, kmesh, latt, tau=tau)
    w_b, b_cart = jnp.asarray(bv["w_b"]), jnp.asarray(bv["b_cart"])
    nbi = jnp.asarray(bv["nb_idx"])
    U = rand_gauge(rng, 6, 2)

    def om_t(t):
        Ut = jnp.einsum("kij, kjl -> kil", U,
                        maxloc._expm_antiherm(t * dW))
        return maxloc.spread_from_M(
            maxloc._rotate_M(jnp.asarray(M0), Ut, nbi), w_b, b_cart)[0]

    B = rng.randn(6, 2, 2) + 1j * rng.randn(6, 2, 2)
    dW = jnp.asarray((B - B.conj().swapaxes(-2, -1)) / 2)
    # evaluate at t0 != 0: at exactly 0 the expm eigh is fully
    # degenerate and its JVP is undefined
    t0 = 0.05
    Ut = jnp.einsum("kij, kjl -> kil", U,
                    maxloc._expm_antiherm(t0 * dW))
    G = maxloc.mv_gradient(
        maxloc._rotate_M(jnp.asarray(M0), Ut, nbi), w_b, b_cart)
    # directional derivative along the left-invariant direction dW' with
    # U(t) = U expm(t dW): dU at t0 corresponds to dW' = expm(-t0 dW) dW
    # expm(t0 dW)... dW commutes with expm(t dW), so dW' = dW exactly.
    inner = float(jnp.real(jnp.einsum("kij, kji ->", G, dW)))
    import jax
    fd = float(jax.grad(om_t)(t0))
    assert abs(fd - inner) < 1e-8 * max(1.0, abs(fd))
    # descent direction: +G strictly decreases at first order
    assert float(jnp.real(jnp.einsum("kij, kji ->", G, G))) < 0


def test_maxloc_complete_basis_exact():
    """The full 2-orbital space localizes exactly back onto the point
    orbitals: Omega -> 0, centers -> tau (mod lattice), from a random
    gauge."""
    rng = np.random.RandomState(0)
    C, kmesh, latt, tau = ssh_bands(nkx=8)
    M0, bv = maxloc.mmn_from_C(C, kmesh, latt, tau=tau)
    U0 = rand_gauge(rng, 8, 2)
    U, info = maxloc.max_loc_U(M0, bv, U0=U0, max_iter=3000)
    assert info["omega"] < 1e-8
    xs = np.sort(info["centers"][:, 0] % 1.0)
    assert np.allclose(xs, [0.0, 0.4], atol=1e-6)
    # U stays unitary
    UhU = np.einsum("kmi, kmj -> kij", np.asarray(U).conj(),
                    np.asarray(U))
    assert np.allclose(UhU, np.eye(2), atol=1e-10)


def test_maxloc_occupied_band():
    """Single (occupied) SSH band: Omega_D is driven to 0, Omega ->
    Omega_I (the gauge-invariant floor), center = strong-bond midpoint."""
    C, kmesh, latt, tau = ssh_bands(nkx=8, t1=1.0, t2=0.4)
    Cocc = C[:, :, :1]
    M0, bv = maxloc.mmn_from_C(Cocc, kmesh, latt, tau=tau)
    _, info = maxloc.max_loc_U(M0, bv, max_iter=3000)
    assert info["omega_D"] < 1e-12
    assert abs(info["omega"] - info["omega_I"]) < 1e-10
    assert abs(info["centers"][0, 0] - 0.2) < 1e-8


def test_maxloc_gauge_invariance():
    """Two different random gauges converge to the same spread; Omega_I
    itself is identical before/after (gauge invariant)."""
    C, kmesh, latt, tau = ssh_bands(nkx=6, t2=0.6)
    M0, bv = maxloc.mmn_from_C(C, kmesh, latt, tau=tau)
    w_b, b_cart = jnp.asarray(bv["w_b"]), jnp.asarray(bv["b_cart"])
    nbi = jnp.asarray(bv["nb_idx"])
    oms = []
    for seed in (1, 2):
        U0 = rand_gauge(np.random.RandomState(seed), 6, 2)
        om_I0 = maxloc.spread_from_M(
            maxloc._rotate_M(jnp.asarray(M0), U0, nbi), w_b, b_cart
        )[1]["I"]
        _, info = maxloc.max_loc_U(M0, bv, U0=U0, max_iter=3000)
        assert abs(float(om_I0) - info["omega_I"]) < 1e-9
        oms.append(info["omega"])
    assert abs(oms[0] - oms[1]) < 1e-7


def test_w90_facade(tmp_path):
    """Reference-shaped W90 driver: kernel returns localized C_lo_k,
    spreads sum to Omega, export_AME/make_win write consumable files."""
    C, kmesh, latt, tau = ssh_bands(nkx=4)
    w90 = W90(C, kmesh, latt, num_wann=2, tau=tau,
              guess=np.eye(2))
    C_lo = w90.kernel(max_iter=3000)
    assert C_lo.shape == (4, 2, 2)
    assert w90.omega < 1e-7
    assert abs(np.sum(w90.wann_spreads) - w90.omega) < 1e-8
    # k-resolved orthonormality of the localized orbitals
    for k in range(4):
        g = C_lo[k].conj().T @ C_lo[k]
        assert np.allclose(g, np.eye(2), atol=1e-10)
    w90.mo_energy_kpts = np.zeros((4, 2))
    w90.export_AME(prefix=str(tmp_path / "w"))
    win = w90.make_win()
    assert "mp_grid = 4 1 1" in win
    amn = (tmp_path / "w.amn").read_text().splitlines()
    assert amn[1].split() == ["2", "4", "2"]
    mmn = (tmp_path / "w.mmn").read_text().splitlines()
    assert mmn[1].split() == ["2", "4", "2"]
    assert (tmp_path / "w.eig").exists()
    # num_wann mismatch is a clear error pointing at disentanglement
    with pytest.raises(ValueError):
        W90(C, kmesh, latt, num_wann=1)


def test_maxloc_2d_square():
    """2D check: two px/py-like point orbitals on a square lattice
    localize exactly (complete basis) with centers at their tau."""
    rng = np.random.RandomState(5)
    n = 3
    latt = np.diag([1.0, 1.0, 8.0])
    kmesh = (n, n, 1)
    kf = maxloc.kmesh_kpts_frac(kmesh)
    tau = np.array([[0.1, 0.2, 0], [0.6, 0.7, 0]])
    nk = n * n
    C = np.zeros((nk, 2, 2), dtype=complex)
    for i, k in enumerate(kf):
        phx = np.exp(2j * np.pi * k[0])
        h = np.array([[0.3, 0.8 + 0.2 * phx],
                      [0.8 + 0.2 * np.conj(phx), -0.3]])
        _, v = np.linalg.eigh(h)
        C[i] = v
    M0, bv = maxloc.mmn_from_C(C, kmesh, latt, tau=tau)
    # small scramble: large random gauges can land in an Im-ln branch
    # local minimum (the known MV branch-cut issue; real wannier90 uses
    # guiding centers for the same reason)
    U0 = rand_gauge(rng, nk, 2, amp=0.05)
    _, info = maxloc.max_loc_U(M0, bv, U0=U0, max_iter=5000)
    assert info["omega"] < 1e-7
    cen = np.sort(info["centers"][:, 0] % 1.0)
    assert np.allclose(cen, [0.1, 0.6], atol=1e-5)
