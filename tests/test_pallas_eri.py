"""
Pallas GDF/Cholesky ERI-accumulation kernel (ops/pallas_eri.py) vs the
exact fp64 einsum path, on the interpreter (CPU suite) -- the flagship
TPU kernel of SURVEY 7 (reference hot loop eri_transform.py:436-522).
"""

import numpy as np
import pytest


def test_syrk_split_precision():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ops.pallas_eri import eri_from_df_pallas
    rng = np.random.RandomState(0)
    naux, neo = 96, 18
    L = rng.randn(naux, neo, neo)
    L = 0.5 * (L + L.transpose(0, 2, 1)) * 0.3
    eri_ref = np.einsum("xij, xkl -> ijkl", L, L, optimize=True)
    eri = eri_from_df_pallas(L, interpret=True)
    rel = np.abs(eri - eri_ref).max() / np.abs(eri_ref).max()
    # split-fp32 + Kahan accumulation: ~1e-7 relative (documented model)
    assert rel < 1e-6, rel


def test_cross_gemm_split_precision():
    """Unrestricted ab channel: eri_ab = sum_x La (x) Lb through the same
    kernel with distinct i/j operands, vs the fp64 einsum."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ops.pallas_eri import eri_from_df_pallas
    rng = np.random.RandomState(3)
    naux, neo = 96, 18
    La = rng.randn(naux, neo, neo)
    La = 0.5 * (La + La.transpose(0, 2, 1)) * 0.3
    Lb = rng.randn(naux, neo, neo)
    Lb = 0.5 * (Lb + Lb.transpose(0, 2, 1)) * 0.3
    eri_ref = np.einsum("xij, xkl -> ijkl", La, Lb, optimize=True)
    eri = eri_from_df_pallas(La, Lb, interpret=True)
    rel = np.abs(eri - eri_ref).max() / np.abs(eri_ref).max()
    assert rel < 1e-6, rel


def test_pallas_matches_library_chol_path():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ops.pallas_eri import get_emb_eri_chol_pallas
    from libdmet_preview_tpu.ops.eri_transform import (cholesky_eri,
                                                       get_emb_eri_chol)
    from libdmet_preview_tpu.models.abinitio import make_h_ring_lattice
    Lat, meta = make_h_ring_lattice(ncells=3, atoms_per_cell=2,
                                    r_bond=1.8, basis="sto-6g")
    rng = np.random.RandomState(1)
    nc, nlo = Lat.ncells, Lat.nscsites
    basis = rng.randn(1, nc, nlo, 5)
    L = np.asarray(Lat.Ham.getH2())
    eri_lib = get_emb_eri_chol(L, basis)
    eri_pl = get_emb_eri_chol_pallas(L, basis, interpret=True)
    rel = np.abs(eri_pl - eri_lib).max() / np.abs(eri_lib).max()
    assert rel < 1e-6, rel


def test_tri_index_map_exact():
    """The compressed-triangle index map m -> (i, j) is exact for every
    m up to thousands of tiles (float-sqrt seed + integer fix-up)."""
    import jax.numpy as jnp
    from libdmet_preview_tpu.ops.pallas_eri import _tri_ij
    ms = jnp.arange(0, 20100)
    i, j = _tri_ij(ms)
    i, j = np.asarray(i), np.asarray(j)
    m = 0
    for ii in range(200):
        for jj in range(ii + 1):
            assert i[m] == ii and j[m] == jj, (m, ii, jj, i[m], j[m])
            m += 1


def test_syrk_triangular_grid_multi_tile():
    """Symmetric syrk on a multi-tile (4x4 tiles, 2 K blocks) problem:
    the lower-triangle grid + mirror reproduces the fp64 einsum and the
    result is exactly symmetric."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from libdmet_preview_tpu.ops.pallas_eri import eri_from_df_pallas
    rng = np.random.RandomState(5)
    naux, neo = 256, 28          # npair = 406 -> 4 TI tiles, 2 K blocks
    L = rng.randn(naux, neo, neo)
    L = 0.5 * (L + L.transpose(0, 2, 1)) * 0.1
    eri_ref = np.einsum("xij, xkl -> ijkl", L, L, optimize=True)
    eri = eri_from_df_pallas(L, interpret=True)
    rel = np.abs(eri - eri_ref).max() / np.abs(eri_ref).max()
    assert rel < 1e-6, rel
    e2 = eri.reshape(neo * neo, neo * neo)
    assert np.abs(e2 - e2.T).max() == 0.0
