"""
Benchmark: DMET iteration hot path (mean field + Schmidt bath + embedding
transform + vcor-fit gradient) at Nk=27, timed on the default JAX backend
(the real TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is the speedup over an equivalent single-process NumPy/LAPACK
pipeline executed in the same interpreter (the reference implementation is
pure NumPy/PySCF on CPU; BASELINE.json publishes no numbers, so the NumPy
pipeline is the stand-in measured on this host).
"""

import json
import time

import numpy as np

import libdmet_preview_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp

from libdmet_preview_tpu.ops import zlinalg

# workload: Nk=27 k-points, 16 local orbitals per cell, 16 valence ->
# embedding dim 32; shapes chosen to mirror the driver metric
# "DMET iteration wall-time (bath + transform + vcor fit) at Nk=27".
NK = 27
NLO = 16
NVAL = NLO
NEO = NLO + NVAL
BETA = 1000.0
FILLING = 0.5
N_FIT_STEPS = 20   # vcor-fit gradient evaluations per DMET iteration


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    # Hermitian translation-invariant model: h(-R) = h(R)^T makes every
    # H(k) Hermitian with H(-k) = H(k)* (time-reversal symmetric)
    h_R = rng.randn(NK, NLO, NLO) * 0.2
    h_R[0] = (h_R[0] + h_R[0].T) / 2
    for R in range(1, NK // 2 + 1):
        h_R[(-R) % NK] = h_R[R].T
    cos_t, sin_t = zlinalg.dft_tables((NK,))
    f_re = np.einsum("kR, Rij -> kij", cos_t, h_R)
    f_im = -np.einsum("kR, Rij -> kij", sin_t, h_R)
    vmat = rng.randn(1, NLO, NLO) * 0.05
    vmat = (vmat + vmat.transpose(0, 2, 1)) / 2
    rho_t = np.tile(np.eye(NEO)[None] * FILLING, (1, 1, 1))
    env_idx = np.arange(NLO, NK * NLO)
    return (f_re[None], f_im[None], vmat, rho_t, cos_t, sin_t, env_idx)


def dmet_iteration(f_re, f_im, vmat, rho_target, cos_t, sin_t, env_idx):
    """One DMET iteration hot path, fully traced (single program):
    mean field -> Schmidt bath (once) -> embedding transform ->
    N_FIT_STEPS vcor-fit gradient steps at FIXED basis (the reference
    FitVcorEmb semantics) -> final embedding quantities.

    TIME-REVERSAL REDUCTION: the lattice operators are real in R space, so
    H(-k) = H(k)* and everything is computed on the irreducible half mesh
    (14 of 27 k points) with weights -- the reference's
    get_weights_t_reversal (eri_transform.py:142) as a compute saver for
    the eigh-bound mean field."""
    nelec2 = f_re.shape[0] * NK * 2 * NLO * FILLING
    spin = f_re.shape[0]
    nibz = NK // 2 + 1
    wk = jnp.asarray(np.asarray([1.0] + [2.0] * (nibz - 1)))
    f_re = f_re[:, :nibz]
    f_im = f_im[:, :nibz]
    cos_w = cos_t[:nibz] * wk[:, None]
    sin_w = sin_t[:nibz] * wk[:, None]

    def mean_field(v):
        h_re = f_re + v[:, None]
        rho_kre, rho_kim, mu = zlinalg.zrho_fermi_w(h_re, f_im, nelec2,
                                                    BETA, wk)
        return h_re, rho_kre, rho_kim

    def fold_emb(b_re, b_im, A_re, A_im):
        # sum over the full mesh of Re(term): term(-k) = conj(term(k)),
        # so weighted real parts over the IBZ reproduce it exactly
        out = (jnp.einsum("k, skpi, skpq, skqj -> sij", wk, b_re, A_re, b_re)
               + jnp.einsum("k, skpi, skpq, skqj -> sij", wk, b_im, A_re, b_im)
               + jnp.einsum("k, skpi, skpq, skqj -> sij", wk, b_im, A_im, b_re)
               - jnp.einsum("k, skpi, skpq, skqj -> sij", wk, b_re, A_im, b_im))
        return out / NK

    # --- bath from the current vcor's mean field (ONE svd per iteration)
    h_re0, rho_kre0, rho_kim0 = mean_field(vmat)
    rho_R = (jnp.einsum("kR, skpq -> sRpq", cos_w, rho_kre0)
             - jnp.einsum("kR, skpq -> sRpq", sin_w, rho_kim0)) / NK
    flat = rho_R.reshape(spin, NK * NLO, NLO)
    env = flat[:, env_idx, :NVAL]
    # left singular vectors via the NVAL x NVAL Gram eigh (SVD-free: the
    # tall f64 SVD is the slower TPU op; the bath SPAN is what matters,
    # and the benched loss is gauge-invariant -- verified == svd on CPU).
    # Clamped inverse-sqrt + two Newton-Schulz passes keep u orthonormal.
    G = jnp.einsum("spi, spj -> sij", env, env)
    w, V = jnp.linalg.eigh(G)
    w = jnp.maximum(w, 1e-14 * w.max())
    u = jnp.einsum("spi, sij -> spj", env, V) / jnp.sqrt(w)[:, None, :]
    eye16 = jnp.eye(u.shape[-1], dtype=env.dtype)
    for _ in range(2):
        g2 = jnp.einsum("spi, spj -> sij", u, u)
        u = u @ (1.5 * eye16 - 0.5 * g2)
    basis = jnp.zeros((spin, NK * NLO, NEO), f_re.dtype)
    basis = basis.at[:, :NLO, :NLO].set(jnp.eye(NLO))
    basis = basis.at[:, env_idx, NLO:].set(u)
    bR = basis.reshape(spin, NK, NLO, NEO)
    # cos/sin tables are symmetric on the uniform mesh; slice k rows
    b_re = jnp.einsum("kR, sRpj -> skpj", cos_t[:nibz], bR)
    b_im = jnp.einsum("kR, sRpj -> skpj", sin_t[:nibz], bR)
    b_re = jax.lax.stop_gradient(b_re)
    b_im = jax.lax.stop_gradient(b_im)

    def loss(v):
        h_re, rho_kre, rho_kim = mean_field(v)
        rho_emb = fold_emb(b_re, b_im, rho_kre, rho_kim)
        return jnp.sum((rho_emb - rho_target) ** 2)

    # vcor fit at fixed basis: gradient steps through the degenerate-safe
    # Fermi-density op
    def body(carry, _):
        v = carry
        err, g = jax.value_and_grad(loss)(v)
        return v - 0.05 * g, err

    vmat_fit, errs = jax.lax.scan(body, vmat, None, length=N_FIT_STEPS)

    # final embedding H1 at the fitted vcor
    h_re, rho_kre, rho_kim = mean_field(vmat_fit)
    hb_re = jnp.einsum("skpq, skqj -> skpj", h_re, b_re) \
        - jnp.einsum("skpq, skqj -> skpj", f_im, b_im)
    hb_im = jnp.einsum("skpq, skqj -> skpj", h_re, b_im) \
        + jnp.einsum("skpq, skqj -> skpj", f_im, b_re)
    embH1 = (jnp.einsum("k, skpi, skpj -> sij", wk, b_re, hb_re)
             + jnp.einsum("k, skpi, skpj -> sij", wk, b_im, hb_im)) / NK
    return vmat_fit, errs[-1], embH1


def numpy_iteration(f_re, f_im, vmat, rho_target, cos_t, sin_t, env_idx):
    """Equivalent NumPy/LAPACK pipeline (reference-style, per-k loops)."""
    nelec = int(f_re.shape[0] * NK * NLO * FILLING) * 2

    def mf_and_emb(v):
        h = f_re + 1j * f_im + v[:, None]
        spin = h.shape[0]
        ews, evs = [], []
        for s in range(spin):
            for k in range(NK):
                w, c = np.linalg.eigh(h[s, k])
                ews.append(w)
                evs.append(c)
        ew = np.asarray(ews).reshape(spin, NK, NLO)
        ev = np.asarray(evs).reshape(spin, NK, NLO, NLO)
        # mu bisection + fermi occupations
        lo, hi = ew.min() - 10, ew.max() + 10
        for _ in range(60):
            mid = (lo + hi) / 2
            n = np.sum(1.0 / (np.exp(np.clip(BETA * (ew - mid), -100, 100)) + 1))
            if n * 2 < nelec:
                lo = mid
            else:
                hi = mid
        occ = 1.0 / (np.exp(np.clip(BETA * (ew - (lo + hi) / 2), -100, 100)) + 1)
        rho_k = np.einsum("skpi, ski, skqi -> skpq", ev, occ, ev.conj())
        rho_R = np.einsum("kR, skpq -> sRpq", cos_t + 1j * sin_t.conj() * (-1),
                          rho_k).real / NK
        flat = rho_R.reshape(spin, NK * NLO, NLO)
        env = flat[:, env_idx, :NVAL]
        u = np.stack([np.linalg.svd(env[s], full_matrices=False)[0]
                      for s in range(spin)])
        basis = np.zeros((spin, NK * NLO, NEO))
        basis[:, :NLO, :NLO] = np.eye(NLO)
        basis[:, env_idx, NLO:] = u
        bR = basis.reshape(spin, NK, NLO, NEO)
        b_k = np.einsum("kR, sRpj -> skpj", cos_t.T + 1j * sin_t.T, bR)
        embH1 = np.einsum("skpi, skpq, skqj -> sij", b_k.conj(), h, b_k).real / NK
        rho_emb = np.einsum("skpi, skpq, skqj -> sij",
                            b_k.conj(), rho_k, b_k).real / NK
        return rho_emb, embH1

    v = vmat.copy()
    for _ in range(N_FIT_STEPS):
        # forward + numerical gradient proxy: one extra forward per param
        # block is what the reference's analytic gradient costs ~2 forwards;
        # charge 2 forwards per step (favorable to the baseline)
        mf_and_emb(v)
        rho_emb, embH1 = mf_and_emb(v)
        v = v - 0.0 * v
    return v, np.sum((rho_emb - rho_target) ** 2), embH1


def timeit(fn, n=5):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n


N_CHAIN = 10   # back-to-back DMET iterations per timed program


def main():
    inputs = make_inputs()
    # fast eigh path: f32 seed + f64 masked refinement (validated to
    # machine precision against the direct eigh in tests/test_units.py)
    zlinalg.EIGH_REFINE = 2

    def chained(f_re, f_im, vmat, rho_target, cos_t, sin_t, env_idx):
        # a real DMET loop runs iterations back to back with a data
        # dependency (the fitted vcor feeds the next iteration); chaining
        # inside one program measures the sustained per-iteration cost
        # without charging the host fetch round trip N times
        def body(v, _):
            v_fit, err, embH1 = dmet_iteration(
                f_re, f_im, v, rho_target, cos_t, sin_t, env_idx)
            return v_fit, (err, embH1)
        v_fin, (errs, _) = jax.lax.scan(body, vmat, None, length=N_CHAIN)
        return v_fin, errs[-1]

    jitted = jax.jit(chained)
    dev_inputs = jax.device_put(tuple(jnp.asarray(x) for x in inputs))

    def run_jax():
        out = jitted(*dev_inputs)
        # materialize a scalar: on the tunneled TPU backend
        # block_until_ready returns before remote execution finishes, so
        # fetching a value is the only honest completion barrier
        return float(out[1])

    t_jax = timeit(run_jax, n=5) / N_CHAIN

    def run_np():
        return numpy_iteration(*[np.asarray(x) for x in inputs])

    t_np = timeit(run_np, n=3)   # per iteration already (no fetch cost)

    print(json.dumps({
        "metric": "dmet_iteration_walltime_nk27",
        "value": round(t_jax * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(t_np / t_jax, 2),
    }))


if __name__ == "__main__":
    main()
