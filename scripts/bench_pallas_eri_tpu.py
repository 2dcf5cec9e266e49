"""
On-chip benchmark + accuracy check of the Pallas split-precision ERI
syrk (ops/pallas_eri.py) against the f64 einsum path, at ab initio
embedding scale (neo >= 64, naux >= 512).  Run on the real TPU:

    python scripts/bench_pallas_eri_tpu.py

Times are honest: every measurement materializes a host scalar (the
tunneled TPU returns from block_until_ready early).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import libdmet_preview_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp


def timed(fn, n=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    return (time.perf_counter() - t0) / n, out


def main():
    from libdmet_preview_tpu.ops.pallas_eri import (eri_from_df_pallas,
                                                    pack_tril, syrk_df,
                                                    TI, KB)
    from libdmet_preview_tpu.ops.eri_transform import (_syrk_eri,
                                                       _rotate_chol,
                                                       get_emb_eri_chol)
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    for neo, naux in ((64, 512), (96, 1024)):
        Lemb = rng.randn(naux, neo, neo) * (naux ** -0.5)
        Lemb = 0.5 * (Lemb + Lemb.transpose(0, 2, 1))
        F = pack_tril(Lemb)
        npair = F.shape[1]
        npair_p = -(-npair // TI) * TI
        naux_p = -(-naux // KB) * KB
        Fp = np.zeros((naux_p, npair_p))
        Fp[:naux, :npair] = F
        Fj = jnp.asarray(Fp)

        def run_pallas():
            return float(syrk_df(Fj)[0, 0])

        t_pal, _ = timed(run_pallas)

        Lj = jnp.asarray(Lemb)

        def run_einsum():
            return float(_syrk_eri(Lj, Lj)[0, 0, 0, 0])

        t_ein, _ = timed(run_einsum)

        eri_p = eri_from_df_pallas(Lemb)
        eri_ref = np.einsum("xij, xkl -> ijkl", Lemb, Lemb,
                            optimize=True)
        rel = np.abs(eri_p - eri_ref).max() / np.abs(eri_ref).max()
        flops = 2.0 * naux_p * npair_p * npair_p
        print("neo=%3d naux=%4d npair=%5d | pallas %7.2f ms "
              "(%6.1f GF/s) | f64 einsum %7.2f ms | speedup %.2fx | "
              "rel err %.2e"
              % (neo, naux, npair, t_pal * 1e3, flops / t_pal / 1e9,
                 t_ein * 1e3, t_ein / t_pal, rel))
        assert rel < 1e-6, "accuracy regression"

    # library-level auto-selection smoke (small lattice shapes, sizes
    # above the threshold): get_emb_eri_chol must route to the kernel
    # on TPU and agree with the einsum path
    ncells, nlo, neo, naux = 8, 8, 64, 512
    basis = rng.randn(1, ncells, nlo, neo) * 0.3
    L = rng.randn(naux, ncells * nlo, ncells * nlo) * (naux ** -0.5)
    L = 0.5 * (L + L.transpose(0, 2, 1))
    import os
    os.environ["LIBDMET_PALLAS_ERI"] = "1"
    e_pal = get_emb_eri_chol(L, basis)
    os.environ["LIBDMET_PALLAS_ERI"] = "0"
    e_ref = get_emb_eri_chol(L, basis)
    rel = np.abs(e_pal - e_ref).max() / np.abs(e_ref).max()
    print("library get_emb_eri_chol pallas-vs-einsum rel err: %.2e"
          % rel)
    assert rel < 1e-6


if __name__ == "__main__":
    main()
