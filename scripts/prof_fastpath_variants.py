import sys, time
import numpy as np
import libdmet_preview_tpu
import jax, jax.numpy as jnp
import bench as B
from libdmet_preview_tpu.ops.fastpath import make_dmet_iteration, chain_iterations

Lat, vmat, rho_t, chol_L = B.make_lattice()
vcor = B._VcorFixed(vmat)
rng = np.random.RandomState(7)

variant = sys.argv[1]
chol, nfit = {"full": (chol_L, 20), "noeri": (None, 20),
              "noeri1": (None, 1), "eri1": (chol_L, 1)}[variant]

t0 = time.perf_counter()
step, p0 = make_dmet_iteration(Lat, vcor, B.FILLING, beta=B.BETA,
                               fit_max_iter=nfit, chol_L=chol)
dp = rng.randn(len(p0)) * 0.1
embH1_p = step(jnp.asarray(p0 + dp), jnp.asarray(rho_t))[2]
print("step-compile+run", round(time.perf_counter() - t0, 1), "s", flush=True)
w, V = np.linalg.eigh(np.asarray(embH1_p))
occ = 1.0 / (np.exp(np.clip(B.BETA * (w - np.median(w)), -100, 100)) + 1)
rho_target = np.einsum("spi, si, sqi -> spq", V, occ, V)
chained = chain_iterations(step, B.N_CHAIN)
p0_j = jnp.asarray(p0); t_j = jnp.asarray(rho_target)
def run():
    return float(chained(p0_j, t_j)[1])
t0 = time.perf_counter()
run()
print("chain-compile+run", round(time.perf_counter() - t0, 1), "s", flush=True)
t0 = time.perf_counter()
for _ in range(5): run()
t = (time.perf_counter() - t0) / 5 / B.N_CHAIN
print(variant, round(t*1e3, 3), "ms/iter", flush=True)
