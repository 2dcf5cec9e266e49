"""
Complex linear algebra as real-pair arithmetic (TPU-native).

TPU XLA does not support complex128, so every k-space quantity in this
framework is carried as a pair of real float64 arrays (re, im).  The two
key primitives:

  * zeigh: Hermitian eigendecomposition via the real symmetric embedding
        W = [[A, -B], [B, A]],  H = A + iB
    whose spectrum is that of H doubled.  Matrix functions commute with the
    embedding, so densities/occupation-weighted projectors are extracted
    from F(W) block-wise without ever disentangling paired eigenvectors --
    this is exact even for degenerate spectra (k/-k pairs).

  * DFT-by-matmul phase tables (cos/sin) replacing complex FFTs; the cell
    meshes in DMET are small (nk <= O(10^3)), so the O(nk^2) matmul DFT is
    faster on the MXU than a complex FFT would be, and it shards trivially
    over a k-mesh axis.
"""

from functools import lru_cache, partial
import itertools as it

import numpy as np
import jax
import jax.numpy as jnp


# ----------------------------------------------------------------------
# real-pair helpers
# ----------------------------------------------------------------------

def zpair(x):
    """numpy/jnp complex array -> (re, im) pair."""
    x = np.asarray(x)
    return np.ascontiguousarray(x.real), np.ascontiguousarray(x.imag)


def to_complex(z):
    re, im = z
    return np.asarray(re) + 1j * np.asarray(im)


def zmatmul(a, b):
    """(re,im) @ (re,im) on the last two axes."""
    ar, ai = a
    br, bi = b
    return (ar @ br - ai @ bi, ar @ bi + ai @ br)


# ----------------------------------------------------------------------
# Hermitian eigh via real embedding
# ----------------------------------------------------------------------

@jax.jit
def zeigh(h_re, h_im):
    """Batched Hermitian eigendecomposition of H = h_re + i h_im.

    h_re/h_im: (..., n, n).  Returns (w2, V) where w2 (..., 2n) is the
    doubled spectrum (each eigenvalue of H appears twice) and V (..., 2n, 2n)
    the real eigenvectors of the embedding W."""
    n = h_re.shape[-1]
    top = jnp.concatenate([h_re, -h_im], axis=-1)
    bot = jnp.concatenate([h_im, h_re], axis=-1)
    W = jnp.concatenate([top, bot], axis=-2)
    return jnp.linalg.eigh(W)


@partial(jax.jit, static_argnames=("iters",))
def zeigh_refined(h_re, h_im, iters=2, tau=1e-8):
    """zeigh via an f32 seed + masked first-order f64 refinement.

    TPU f64 eigh is sequential-iteration bound (batch is nearly free,
    size is not); the f32 eigh is ~4x faster.  The f32 eigenbasis is
    polished in f64: Newton-Schulz re-orthonormalization, Rayleigh
    quotients T = V^T W V, first-order rotation E_ij = T_ij/(lam_j-lam_i)
    masked where |lam_j - lam_i| < tau*scale.  Masked (near-)degenerate
    subspaces stay mixed -- harmless by design, since every consumer
    (matrix functions, divided differences) is invariant under rotations
    within degenerate subspaces (the doubled spectrum is ALWAYS paired).
    Mixing error contracts quadratically per iteration; iters=2 reaches
    ~1e-10 for spectra with distinct gaps > 1e-4.

    Returns (w2, V) like zeigh but UNSORTED."""
    n = h_re.shape[-1]
    top = jnp.concatenate([h_re, -h_im], axis=-1)
    bot = jnp.concatenate([h_im, h_re], axis=-1)
    W = jnp.concatenate([top, bot], axis=-2)
    w32, V32 = jnp.linalg.eigh(W.astype(jnp.float32))
    V = V32.astype(W.dtype)
    I = jnp.eye(2 * n, dtype=W.dtype)
    scale = jnp.max(jnp.abs(w32)).astype(W.dtype) + 1e-30

    def rayleigh(V):
        T = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, W, V,
                       optimize=True)
        return T, jnp.diagonal(T, axis1=-2, axis2=-1)

    for _ in range(iters):
        G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
        V = V @ (1.5 * I - 0.5 * G)
        T, lam = rayleigh(V)
        d = lam[..., None, :] - lam[..., :, None]
        mask = jnp.abs(d) > tau * scale
        E = jnp.where(mask, T / jnp.where(mask, d, 1.0), 0.0)
        V = V + V @ E
    G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
    V = V @ (1.5 * I - 0.5 * G)
    _, lam = rayleigh(V)
    return lam, V


# Eigensolver used inside the Fermi-density ops:
#   None = auto (f32 seed + 2 masked f64 refinement passes on TPU, where
#          the direct f64 eigh is the slow op; direct eigh elsewhere),
#   0    = direct f64 eigh,
#   k>0  = f32 seed + k refinement iterations.
# The refined path is validated to machine precision against the direct
# eigh in tests/test_units.py.
EIGH_REFINE = None
_EIGH_REFINE_AUTO = None


def _eigh_refine_level():
    if EIGH_REFINE is not None:
        return int(EIGH_REFINE)
    global _EIGH_REFINE_AUTO
    if _EIGH_REFINE_AUTO is None:
        try:
            _EIGH_REFINE_AUTO = 2 if jax.default_backend() == "tpu" else 0
        except Exception:
            _EIGH_REFINE_AUTO = 0
    return _EIGH_REFINE_AUTO


def _zeigh_mf(h_re, h_im):
    level = _eigh_refine_level()
    if level:
        return zeigh_refined(h_re, h_im, iters=level)
    return zeigh(h_re, h_im)


@partial(jax.jit, static_argnames=("iters",))
def eigh_refined_real(h, iters=2, tau=1e-8):
    """Plain-symmetric analog of zeigh_refined: f32 eigh seed + masked
    first-order f64 refinement.  Returns (w, V), UNSORTED."""
    n = h.shape[-1]
    w32, V32 = jnp.linalg.eigh(h.astype(jnp.float32))
    V = V32.astype(h.dtype)
    I = jnp.eye(n, dtype=h.dtype)
    scale = jnp.max(jnp.abs(w32)).astype(h.dtype) + 1e-30

    def rayleigh(V):
        T = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, h, V,
                       optimize=True)
        return T, jnp.diagonal(T, axis1=-2, axis2=-1)

    for _ in range(iters):
        G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
        V = V @ (1.5 * I - 0.5 * G)
        T, lam = rayleigh(V)
        d = lam[..., None, :] - lam[..., :, None]
        mask = jnp.abs(d) > tau * scale
        E = jnp.where(mask, T / jnp.where(mask, d, 1.0), 0.0)
        V = V + V @ E
    G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
    V = V @ (1.5 * I - 0.5 * G)
    _, lam = rayleigh(V)
    return lam, V


def _eigh_mf_real(h):
    level = _eigh_refine_level()
    if level:
        return eigh_refined_real(h, iters=level)
    return jnp.linalg.eigh(h)


@jax.jit
def zfunc_from_eig(V, f2):
    """Matrix function F(H) from the embedding eigensystem.

    V: (..., 2n, 2n) eigenvectors of W; f2: (..., 2n) function values on the
    doubled spectrum (paired eigenvalues must get equal values).
    Returns (F_re, F_im) with F_re = F(W)[:n,:n], F_im = F(W)[n:, :n]."""
    n = V.shape[-1] // 2
    FW = jnp.einsum("...pi, ...i, ...qi -> ...pq", V, f2, V)
    return FW[..., :n, :n], FW[..., n:, :n]


# ----------------------------------------------------------------------
# differentiable Fermi density matrix (degenerate-safe custom JVP)
# ----------------------------------------------------------------------

def _fermi(x, mu, beta):
    z = jnp.clip(beta * (x - mu), -100.0, 100.0)
    return 1.0 / (jnp.exp(z) + 1.0)


def _bisect_mu(ew, nelec, beta, n_sweep=6, grid=256, weights=None):
    """Chemical-potential search by PARALLEL grid refinement: each sweep
    evaluates N(mu) on `grid` candidates at once (one vectorized reduction
    instead of one sequential bisection step) and narrows the bracket by
    1/grid -- 6 sweeps of 256 resolve the bracket by 256^-6 (~4e-15
    relative), matching 50 bisection steps with 10x fewer sequential
    dispatches (tiny-op latency dominates bisection on accelerators; the
    wide grid is one cheap vectorized reduction)."""
    from jax import lax
    pad = jnp.maximum(jnp.asarray(10.0, ew.dtype), 1.0 / beta)
    lo = jnp.min(ew) - pad
    hi = jnp.max(ew) + pad
    flat = ew.ravel()
    if weights is None:
        wflat = jnp.ones_like(flat)
    else:
        wflat = jnp.broadcast_to(weights[..., None], ew.shape).ravel()

    def sweep(bounds, _):
        lo, hi = bounds
        mus = lo + (hi - lo) * jnp.linspace(0.0, 1.0, grid, dtype=ew.dtype)
        counts = jnp.sum(wflat[None, :]
                         * _fermi(flat[None, :], mus[:, None], beta), axis=1)
        # largest grid point with count below the target (counts ascending)
        below = counts < nelec
        idx = jnp.clip(jnp.sum(below) - 1, 0, grid - 2)
        return (mus[idx], mus[idx + 1]), None

    (lo, hi), _ = lax.scan(sweep, (lo, hi), None, length=n_sweep)
    return 0.5 * (lo + hi)


def _fermi_K(ew, mu, beta):
    """Daleckii-Krein divided-difference table of the Fermi function
    (degenerate-safe: -> f' on the diagonal/degenerate pairs)."""
    f = _fermi(ew, mu, beta)
    lam_i = ew[..., :, None]
    lam_j = ew[..., None, :]
    dl = lam_i - lam_j
    small = jnp.abs(dl) < 1e-9
    favg = 0.5 * (lam_i + lam_j)
    fp_pair = -beta * _fermi(favg, mu, beta) * (1.0 - _fermi(favg, mu, beta))
    K = jnp.where(small, fp_pair,
                  (f[..., :, None] - f[..., None, :])
                  / jnp.where(small, 1.0, dl))
    return f, K


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def zrho_fermi_w(h_re, h_im, nelec, beta, weights):
    """zrho_fermi with per-batch-element k weights in the electron count
    N = sum_k w_k tr f(H_k) (time-reversal-reduced meshes: w = 2 for
    paired k, 1 for self-paired).  weights participates only in the mu
    constraint; its cotangent is zero."""
    ew, V = _zeigh_mf(h_re, h_im)
    mu = _bisect_mu(ew, nelec, beta, weights=weights)
    occ = _fermi(ew, mu, beta)
    rho_re, rho_im = zfunc_from_eig(V, occ)
    return rho_re, rho_im, mu


def _zrho_fermi_w_fwd(h_re, h_im, nelec, beta, weights):
    ew, V = _zeigh_mf(h_re, h_im)
    mu = _bisect_mu(ew, nelec, beta, weights=weights)
    occ = _fermi(ew, mu, beta)
    rho_re, rho_im = zfunc_from_eig(V, occ)
    return (rho_re, rho_im, mu), (ew, V, mu, weights)


def _zrho_fermi_w_bwd(nelec, beta, res, cot):
    ew, V, mu, weights = res
    gh_re, gh_im = _zrho_bwd_core(ew, V, mu, cot, beta, weights)
    return gh_re, gh_im, jnp.zeros_like(weights)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def zrho_fermi(h_re, h_im, nelec, beta):
    """Grand-canonical density matrix rho = f_beta(H - mu) at fixed total
    electron number, batched over leading axes, with a DEGENERATE-SAFE
    derivative (the analytic finite-T gradient of reference
    routine/ftsystem.py:147-292, as a first-class differentiable op).

    h_re/h_im: (..., n, n) Hermitian real pair; `nelec` is the target count
    on the DOUBLED spectrum of the real embedding (2x physical; see zeigh).
    Returns (rho_re, rho_im, mu).  jax.grad through this op is exact even
    for exactly degenerate spectra (k/-k pairs, embedding doubling) via
    Daleckii-Krein divided differences + chemical-potential feedback
    (d mu from dN = 0).  Implemented as custom_vjp so the backward pass
    REUSES the forward eigendecomposition (one eigh per grad step).
    """
    ew, V = _zeigh_mf(h_re, h_im)
    mu = _bisect_mu(ew, nelec, beta)
    occ = _fermi(ew, mu, beta)
    rho_re, rho_im = zfunc_from_eig(V, occ)
    return rho_re, rho_im, mu


def _zrho_fermi_fwd(h_re, h_im, nelec, beta):
    ew, V = _zeigh_mf(h_re, h_im)
    mu = _bisect_mu(ew, nelec, beta)
    occ = _fermi(ew, mu, beta)
    rho_re, rho_im = zfunc_from_eig(V, occ)
    return (rho_re, rho_im, mu), (ew, V, mu)


def _zrho_bwd_core(ew, V, mu, cot, beta, weights=None):
    w_re, w_im, w_mu = cot
    n = w_re.shape[-1]
    f, K = _fermi_K(ew, mu, beta)
    fp = -beta * f * (1.0 - f)
    if weights is None:
        wk = jnp.ones(ew.shape[:-1], dtype=ew.dtype)
    else:
        wk = weights
    # the mu constraint is N = sum_k w_k tr f -> weighted feedback sums
    denom = jnp.sum(wk[..., None] * fp)
    safe = jnp.abs(denom) > 1e-300
    inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)

    # cotangent on F(W): only the [:n,:n] (re) and [n:,:n] (im) blocks
    # were read
    zeros = jnp.zeros_like(w_re)
    top = jnp.concatenate([w_re, zeros], axis=-1)
    bot = jnp.concatenate([w_im, zeros], axis=-1)
    What = jnp.concatenate([top, bot], axis=-2)
    W_eig = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, What, V)

    # adjoint of dF_eig = K o M - diag(f') dmu,
    # dmu = sum_k w_k f' M_ii / denom
    trace_term = jnp.einsum("...ii, ...i ->", W_eig, fp)
    Mct = K * W_eig
    diag_coeff = (w_mu - trace_term) * inv_denom
    Mct = Mct + jnp.einsum("...i, ij -> ...ij", wk[..., None] * fp,
                           jnp.eye(ew.shape[-1], dtype=ew.dtype)) * diag_coeff
    dW = jnp.einsum("...pi, ...ij, ...qj -> ...pq", V, Mct, V)
    # adjoint of the real-embedding map W = [[a, -b], [b, a]]
    gh_re = dW[..., :n, :n] + dW[..., n:, n:]
    gh_im = dW[..., n:, :n] - dW[..., :n, n:]
    return gh_re, gh_im


def _zrho_fermi_bwd(nelec, beta, res, cot):
    ew, V, mu = res
    return _zrho_bwd_core(ew, V, mu, cot, beta, None)


zrho_fermi.defvjp(_zrho_fermi_fwd, _zrho_fermi_bwd)
zrho_fermi_w.defvjp(_zrho_fermi_w_fwd, _zrho_fermi_w_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def rho_fermi_real(h, nelec2, beta):
    """REAL-SYMMETRIC specialization of zrho_fermi for the embedding-fit
    hot loops (ops.fit.FitVcorEmb / ops.fastpath): when the embedding
    Hamiltonian is purely real, the doubled-spectrum embedding wastes an
    eigh of size 2n on a block-diagonal matrix -- this op diagonalizes
    the n x n symmetric matrix directly (TPU eigh cost is dominated by
    the SEQUENTIAL QR iteration count, which scales with n).

    `nelec2` keeps the doubled-spectrum convention (2x the physical
    count), so rho_fermi_real(h, n2, b) == zrho_fermi(h, 0, n2, b)[0]
    is a drop-in replacement.  Same degenerate-safe Daleckii-Krein
    backward with chemical-potential feedback, reusing the forward
    eigendecomposition.  Returns (rho, mu)."""
    ew, V = _eigh_mf_real(h)
    mu = _bisect_mu(ew, 0.5 * nelec2, beta)
    occ = _fermi(ew, mu, beta)
    rho = jnp.einsum("...pi, ...i, ...qi -> ...pq", V, occ, V)
    return rho, mu


def _rho_fermi_real_fwd(h, nelec2, beta):
    ew, V = _eigh_mf_real(h)
    mu = _bisect_mu(ew, 0.5 * nelec2, beta)
    occ = _fermi(ew, mu, beta)
    rho = jnp.einsum("...pi, ...i, ...qi -> ...pq", V, occ, V)
    return (rho, mu), (ew, V, mu)


def _rho_fermi_real_bwd(nelec2, beta, res, cot):
    ew, V, mu = res
    w_rho, w_mu = cot
    f, K = _fermi_K(ew, mu, beta)
    fp = -beta * f * (1.0 - f)
    # the 2x doubled-count factors cancel between the dN = 0 numerator
    # and denominator, so the single-spectrum sums give the same dmu
    denom = jnp.sum(fp)
    safe = jnp.abs(denom) > 1e-300
    inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
    W_eig = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, w_rho, V)
    trace_term = jnp.einsum("...ii, ...i ->", W_eig, fp)
    Mct = K * W_eig
    diag_coeff = (w_mu - trace_term) * inv_denom
    Mct = Mct + jnp.einsum("...i, ij -> ...ij", fp,
                           jnp.eye(ew.shape[-1], dtype=ew.dtype)
                           ) * diag_coeff
    dh = jnp.einsum("...pi, ...ij, ...qj -> ...pq", V, Mct, V)
    return (dh,)


rho_fermi_real.defvjp(_rho_fermi_real_fwd, _rho_fermi_real_bwd)


# ----------------------------------------------------------------------
# warm-started Fermi density: refine a carried eigenbasis instead of
# re-diagonalizing (the TPU fit hot loop evaluates rho(H + dH) for a
# long sequence of SMALL dH -- a fresh 32x32 f32 eigh costs ~0.3 ms of
# sequential iteration on the chip while a masked refinement pass is
# ~0.15 ms of pure matmuls; carrying the basis across the CG line
# search turns the per-evaluation eigh into refinement-only, with an
# exact-eigh fallback under lax.cond whenever the refinement residual
# says the warm start was too far)
# ----------------------------------------------------------------------

_WS_RTOL = 1e-7


def _refine_from(h, V0, iters=2, tau=1e-8):
    """Masked first-order eigenbasis refinement starting at V0
    (same scheme as eigh_refined_real, arbitrary starting basis).
    Returns (lam, V, resid) -- resid = max |offdiag(V^T h V)|, the
    convergence certificate."""
    n = h.shape[-1]
    I = jnp.eye(n, dtype=h.dtype)
    V = V0

    def rayleigh(V):
        T = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, h, V,
                       optimize=True)
        return T, jnp.diagonal(T, axis1=-2, axis2=-1)

    scale = None
    for _ in range(iters):
        G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
        V = V @ (1.5 * I - 0.5 * G)
        T, lam = rayleigh(V)
        if scale is None:
            scale = jnp.max(jnp.abs(lam)) + 1e-30
        d = lam[..., None, :] - lam[..., :, None]
        mask = jnp.abs(d) > tau * scale
        E = jnp.where(mask, T / jnp.where(mask, d, 1.0), 0.0)
        V = V + V @ E
    G = jnp.einsum("...pi, ...pj -> ...ij", V, V, optimize=True)
    V = V @ (1.5 * I - 0.5 * G)
    T, lam = rayleigh(V)
    off = T - jnp.eye(h.shape[-1], dtype=h.dtype) * lam[..., None, :]
    # exclude masked (near-degenerate) pairs from the certificate: the
    # consumers are invariant under rotations inside those subspaces
    d = lam[..., None, :] - lam[..., :, None]
    live = jnp.abs(d) > tau * scale
    resid = jnp.max(jnp.abs(jnp.where(live, off, 0.0)))
    return lam, V, resid


def _eig_ws(h, V0):
    """(lam, V) via warm-started refinement with exact-eigh fallback.
    One refinement pass (quadratic contraction) + the residual
    certificate: the certificate is what guarantees correctness, the
    single pass is the cost gamble."""
    lam_r, V_r, resid = _refine_from(h, V0, iters=1)
    scale = jnp.max(jnp.abs(lam_r)) + 1e-30
    ok = resid < _WS_RTOL * scale

    def warm(_):
        return lam_r, V_r

    def fresh(_):
        lam, V = _eigh_mf_real(h)
        return lam, V

    from jax import lax
    return lax.cond(ok, warm, fresh, None)


@jax.custom_vjp
def rho_fermi_real_ws(h, nelec2, beta, V0):
    """rho_fermi_real with a WARM-STARTED eigenbasis: V0 is the carried
    approximate eigenbasis (e.g. from the previous fit step); the op
    refines it (matmuls only) and falls back to the full eigh when the
    residual certificate fails -- identical results either way.

    Returns (rho, mu, V) with V the converged basis to carry forward.
    V0 is a pure computational hint: its cotangent is ZERO (rho does
    not depend on V0 at convergence).  Pass V0 = I (or anything
    non-orthogonal to the true basis) to force the fresh-eigh path.
    nelec2/beta follow rho_fermi_real conventions but ride as traced
    values here (shape-static)."""
    ew, V = _eig_ws(h, V0)
    mu = _bisect_mu(ew, 0.5 * nelec2, beta)
    occ = _fermi(ew, mu, beta)
    rho = jnp.einsum("...pi, ...i, ...qi -> ...pq", V, occ, V)
    return rho, mu, V


def _rho_fermi_real_ws_fwd(h, nelec2, beta, V0):
    ew, V = _eig_ws(h, V0)
    mu = _bisect_mu(ew, 0.5 * nelec2, beta)
    occ = _fermi(ew, mu, beta)
    rho = jnp.einsum("...pi, ...i, ...qi -> ...pq", V, occ, V)
    return (rho, mu, V), (ew, V, mu, beta)


def _rho_fermi_real_ws_bwd(res, cot):
    ew, V, mu, beta = res
    w_rho, w_mu, _w_V = cot        # basis cotangent discarded (gauge)
    f, K = _fermi_K(ew, mu, beta)
    fp = -beta * f * (1.0 - f)
    denom = jnp.sum(fp)
    safe = jnp.abs(denom) > 1e-300
    inv_denom = jnp.where(safe, 1.0 / jnp.where(safe, denom, 1.0), 0.0)
    W_eig = jnp.einsum("...pi, ...pq, ...qj -> ...ij", V, w_rho, V)
    trace_term = jnp.einsum("...ii, ...i ->", W_eig, fp)
    Mct = K * W_eig
    diag_coeff = (w_mu - trace_term) * inv_denom
    Mct = Mct + jnp.einsum("...i, ij -> ...ij", fp,
                           jnp.eye(ew.shape[-1], dtype=ew.dtype)
                           ) * diag_coeff
    dh = jnp.einsum("...pi, ...ij, ...qj -> ...pq", V, Mct, V)
    return (dh, jnp.zeros_like(mu), jnp.zeros_like(mu),
            jnp.zeros_like(V))


rho_fermi_real_ws.defvjp(_rho_fermi_real_ws_fwd, _rho_fermi_real_ws_bwd)


# ----------------------------------------------------------------------
# DFT phase tables for cell meshes
# ----------------------------------------------------------------------

@lru_cache(maxsize=None)
def dft_tables(kmesh):
    """cos/sin tables for the C-ordered cell mesh.

    Returns (cos_kR, sin_kR), each (nk, nk), entry [k, R] for scaled kpts
    (fftfreq per axis) and integer cell positions, phase = 2*pi*k.R."""
    kmesh = tuple(int(x) for x in kmesh)
    kfrac = np.array(list(it.product(*[np.fft.fftfreq(m) for m in kmesh])))
    cells = np.array(list(it.product(*[range(m) for m in kmesh])), dtype=float)
    phase = 2.0 * np.pi * (kfrac @ cells.T)
    return np.cos(phase), np.sin(phase)


@jax.jit
def _dft_R2k(A_re, A_im, cos_t, sin_t):
    """A(k) = sum_R e^{-i k.R} A(R) over the leading cell axis."""
    re = jnp.einsum("kR, R... -> k...", cos_t, A_re) \
        + jnp.einsum("kR, R... -> k...", sin_t, A_im)
    im = jnp.einsum("kR, R... -> k...", cos_t, A_im) \
        - jnp.einsum("kR, R... -> k...", sin_t, A_re)
    return re, im


@jax.jit
def _dft_k2R(A_re, A_im, cos_t, sin_t):
    """A(R) = (1/nk) sum_k e^{+i k.R} A(k) over the leading k axis."""
    nk = cos_t.shape[0]
    re = (jnp.einsum("kR, k... -> R...", cos_t, A_re)
          - jnp.einsum("kR, k... -> R...", sin_t, A_im)) / nk
    im = (jnp.einsum("kR, k... -> R...", cos_t, A_im)
          + jnp.einsum("kR, k... -> R...", sin_t, A_re)) / nk
    return re, im


def R2k(A, kmesh):
    """Stripe real (or pair) operator R -> k.  A: ((spin,) ncells, n, m) real
    array or (re, im) pair; the cell axis is the -3rd."""
    cos_t, sin_t = dft_tables(tuple(int(x) for x in kmesh))
    cos_t, sin_t = jnp.asarray(cos_t), jnp.asarray(sin_t)
    if isinstance(A, tuple):
        A_re, A_im = jnp.asarray(A[0]), jnp.asarray(A[1])
    else:
        A_re = jnp.asarray(A)
        A_im = jnp.zeros_like(A_re)
    moved = A_re.ndim > 3
    if moved:
        # move spin in front of einsum batch: treat leading axes by vmap
        re, im = jax.vmap(lambda r, i: _dft_R2k(r, i, cos_t, sin_t))(A_re, A_im)
    else:
        re, im = _dft_R2k(A_re, A_im, cos_t, sin_t)
    return re, im


def k2R(A, kmesh, real=True):
    """k -> stripe R.  A is a (re, im) pair (or real array); returns real
    stripe if real=True else a pair."""
    cos_t, sin_t = dft_tables(tuple(int(x) for x in kmesh))
    cos_t, sin_t = jnp.asarray(cos_t), jnp.asarray(sin_t)
    if isinstance(A, tuple):
        A_re, A_im = jnp.asarray(A[0]), jnp.asarray(A[1])
    else:
        A_re = jnp.asarray(A)
        A_im = jnp.zeros_like(A_re)
    if A_re.ndim > 3:
        re, im = jax.vmap(lambda r, i: _dft_k2R(r, i, cos_t, sin_t))(A_re, A_im)
    else:
        re, im = _dft_k2R(A_re, A_im, cos_t, sin_t)
    if real:
        return re
    return re, im
