import time
import numpy as np
import libdmet_preview_tpu
import jax, jax.numpy as jnp
from jax import lax
from libdmet_preview_tpu.ops import zlinalg

def timeit(fn, *a, n=20):
    fn(*a)  # compile
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    # materialize
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    return (time.perf_counter() - t0) / n * 1e3

rng = np.random.RandomState(0)
H = rng.randn(32, 32); H = jnp.asarray(H + H.T)
Hb = rng.randn(14, 32, 32); Hb = jnp.asarray(Hb + Hb.transpose(0,2,1))

# chain 20 dependent evals inside ONE program to remove dispatch cost
def chain20(f):
    def g(x):
        def body(c, _):
            out = f(c)
            return c + 1e-20 * out[0].sum() if isinstance(out, tuple) else c + 1e-20*out.sum(), None
        return lax.scan(body, x, None, length=20)[0]
    return jax.jit(g)

eigh32_f32 = jax.jit(lambda h: jnp.linalg.eigh(h.astype(jnp.float32)))
eigh32_f64 = jax.jit(lambda h: jnp.linalg.eigh(h))
eighb_f32 = jax.jit(lambda h: jnp.linalg.eigh(h.astype(jnp.float32)))
refined = jax.jit(lambda h: zlinalg.eigh_refined_real(h))
rho = jax.jit(lambda h: zlinalg.rho_fermi_real(h, 32, 1000.0))
fg = jax.jit(jax.value_and_grad(lambda h: zlinalg.rho_fermi_real(h, 32, 1000.0)[0].sum()))
mm = jax.jit(lambda h: h @ h)

for name, f, x in [("eigh32_f32", eigh32_f32, H),
                   ("eigh32_f64", eigh32_f64, H),
                   ("eighb14_f32", eighb_f32, Hb),
                   ("eigh_refined", refined, H),
                   ("rho_fermi", rho, H),
                   ("rho_fg", fg, H),
                   ("matmul32", mm, H)]:
    t1 = timeit(f, x)
    c = chain20(lambda y, f=f: (f(y)[0] if isinstance(f(y), tuple) else f(y),))
    tc = timeit(c, x) / 20.0
    print(f"{name:14s} dispatch {t1:8.3f} ms   chained {tc:8.3f} ms", flush=True)
