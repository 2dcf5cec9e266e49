"""
Pallas TPU kernel for the GDF/Cholesky embedding-ERI accumulation
(the flagship hot loop of ab initio DMET, SURVEY 3.4 / reference
eri_transform.py:436-522 `_Lij_s4_to_eri`): the s4(tril)-packed
  eri[pq, rs] = sum_x F[x, pq] F[x, rs]        (a syrk, F = packed L_emb)

TPU-native design (this is where the FLOPs live at north-star scale,
O(naux * npair^2)):

  * the MXU is fp32; float64 operands are SPLIT into (hi, lo) fp32 pairs
    (lo = x - fp64(hi)), and the product recomposed from three fp32 GEMMs
    hi.hi + hi.lo + lo.hi -- the classic double-float product, keeping
    ~47 effective mantissa bits of the operands;
  * the auxiliary axis is tiled (KB = 128) so each MXU GEMM accumulates
    only KB terms in fp32; across K tiles the per-tile contributions are
    combined with a KAHAN (compensated) fp32 accumulator pair held in
    VMEM scratch -- effective ~48-bit accumulation without fp64 in the
    kernel;
  * grid = (npair/TI, npair/TJ, naux/KB) with K innermost, so the
    scratch accumulator lives across the K sweep of each output tile;
  * outputs are the (value, compensation) fp32 pair, composed to float64
    outside.  Measured accuracy vs the fp64 einsum: ~1e-7 relative
    (tests/test_pallas_eri.py); the exact-fp64 einsum path remains the
    default on CPU.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

TI = 128
KB = 128


def split_f32(x):
    """float64 -> (hi, lo) float32 pair with x ~= hi + lo."""
    x = jnp.asarray(x, jnp.float64)
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _syrk_kernel(fhi_i, flo_i, fhi_j, flo_j, out_val, out_comp,
                 acc, comp):
    from jax.experimental import pallas as pl
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        comp[:] = jnp.zeros_like(comp)

    dn = (((0,), (0,)), ((), ()))
    # HIGHEST: full-f32 MXU passes (TPU's DEFAULT f32 matmul runs bf16
    # passes, which would waste the operand split)
    hp = jax.lax.Precision.HIGHEST
    t = jax.lax.dot_general(fhi_i[:], fhi_j[:], dimension_numbers=dn,
                            preferred_element_type=jnp.float32,
                            precision=hp)
    t = t + jax.lax.dot_general(fhi_i[:], flo_j[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=hp)
    t = t + jax.lax.dot_general(flo_i[:], fhi_j[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=hp)
    # Kahan step: y = t - comp; s = acc + y; comp = (s - acc) - y
    y = t - comp[:]
    s = acc[:] + y
    comp[:] = (s - acc[:]) - y
    acc[:] = s

    @pl.when(k == nk - 1)
    def _():
        out_val[:] = acc[:]
        out_comp[:] = -comp[:]


def _tri_ij(m):
    """Compressed-lower-triangle linear index m -> (i, j) with i >= j:
    the inverse of m = i (i + 1) / 2 + j, in traceable PURE-int32 math
    (float sqrt seed + exact fix-up; exact for any practical tile
    count).  int32 throughout -- the Mosaic scalar core cannot lower
    the int64 that x64-mode weak types would promote to."""
    one = jnp.int32(1)
    two = jnp.int32(2)
    m = jnp.asarray(m).astype(jnp.int32)
    mf = m.astype(jnp.float32)
    i = jnp.floor((jnp.sqrt(8.0 * mf + 1.0) - 1.0) * 0.5).astype(jnp.int32)
    # float-precision fix-up (at most one step either way)
    i = jnp.where(((i + one) * (i + two)) // two <= m, i + one, i)
    i = jnp.where((i * (i + one)) // two > m, i - one, i)
    j = m - (i * (i + one)) // two
    return i, j


@partial(jax.jit, static_argnames=("interpret",))
def syrk_df(F, F2=None, interpret=False):
    """eri = F^T F2 for DF factors F/F2 (naux, npair), float64 in/out,
    via the split-fp32 Kahan Pallas kernel (F2=None -> the syrk F^T F;
    distinct F2 is the unrestricted ab cross block).  naux and npair
    must be padded to multiples of KB/TI by the caller
    (see eri_from_df_pallas).

    Symmetric (F2=None) case: the grid runs only the LOWER-TRIANGULAR
    output tiles (a compressed-triangle 2D grid, i >= j), halving the
    MXU work and the operand DMA of the full square; the upper triangle
    is mirrored outside the kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    naux, npair = F.shape
    fhi, flo = split_f32(F)
    nt = npair // TI
    if F2 is None:
        grid = (nt * (nt + 1) // 2, naux // KB)
        spec_i = pl.BlockSpec((KB, TI),
                              lambda m, k: (k, _tri_ij(m)[0]),
                              memory_space=pltpu.VMEM)
        spec_j = pl.BlockSpec((KB, TI),
                              lambda m, k: (k, _tri_ij(m)[1]),
                              memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((TI, TI),
                              lambda m, k: _tri_ij(m),
                              memory_space=pltpu.VMEM)
        val, comp = pl.pallas_call(
            _syrk_tri_kernel,
            grid=grid,
            in_specs=[spec_i, spec_i, spec_j, spec_j],
            out_specs=[spec_o, spec_o],
            out_shape=[jax.ShapeDtypeStruct((npair, npair), jnp.float32),
                       jax.ShapeDtypeStruct((npair, npair), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((TI, TI), jnp.float32),
                            pltpu.VMEM((TI, TI), jnp.float32)],
            interpret=interpret,
        )(fhi, flo, fhi, flo)
        M = val.astype(jnp.float64) + comp.astype(jnp.float64)
        L = jnp.tril(M)
        return L + L.T - jnp.diag(jnp.diag(L))
    fhi2, flo2 = split_f32(F2)
    grid = (npair // TI, npair // TI, naux // KB)
    spec_i = pl.BlockSpec((KB, TI), lambda i, j, k: (k, i),
                          memory_space=pltpu.VMEM)
    spec_j = pl.BlockSpec((KB, TI), lambda i, j, k: (k, j),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((TI, TI), lambda i, j, k: (i, j),
                          memory_space=pltpu.VMEM)
    val, comp = pl.pallas_call(
        _syrk_kernel,
        grid=grid,
        in_specs=[spec_i, spec_i, spec_j, spec_j],
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((npair, npair), jnp.float32),
                   jax.ShapeDtypeStruct((npair, npair), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((TI, TI), jnp.float32),
                        pltpu.VMEM((TI, TI), jnp.float32)],
        interpret=interpret,
    )(fhi, flo, fhi2, flo2)
    return val.astype(jnp.float64) + comp.astype(jnp.float64)


def _syrk_tri_kernel(fhi_i, flo_i, fhi_j, flo_j, out_val, out_comp,
                     acc, comp):
    """Same Kahan split-f32 accumulation as _syrk_kernel, on the
    compressed-triangle grid (tile axis 0, K axis 1)."""
    from jax.experimental import pallas as pl
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        comp[:] = jnp.zeros_like(comp)

    dn = (((0,), (0,)), ((), ()))
    hp = jax.lax.Precision.HIGHEST
    t = jax.lax.dot_general(fhi_i[:], fhi_j[:], dimension_numbers=dn,
                            preferred_element_type=jnp.float32,
                            precision=hp)
    t = t + jax.lax.dot_general(fhi_i[:], flo_j[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=hp)
    t = t + jax.lax.dot_general(flo_i[:], fhi_j[:], dimension_numbers=dn,
                                preferred_element_type=jnp.float32,
                                precision=hp)
    y = t - comp[:]
    s = acc[:] + y
    comp[:] = (s - acc[:]) - y
    acc[:] = s

    @pl.when(k == nk - 1)
    def _():
        out_val[:] = acc[:]
        out_comp[:] = -comp[:]


def dot_split(A, B):
    """f64-in f64-out matmul via the double-float operand split on the
    f32 MXU (hi.hi + hi.lo + lo.hi; ~47 operand mantissa bits): the
    TPU-native path for the big DF-factor rotations, where a plain f64
    dot has no MXU lowering.  Traceable (usable inside jitted programs)."""
    ahi, alo = split_f32(A)
    bhi, blo = split_f32(B)
    hp = jax.lax.Precision.HIGHEST
    t = jnp.matmul(ahi, bhi, precision=hp, preferred_element_type=jnp.float32)
    t = t + jnp.matmul(ahi, blo, precision=hp,
                       preferred_element_type=jnp.float32)
    t = t + jnp.matmul(alo, bhi, precision=hp,
                       preferred_element_type=jnp.float32)
    return t.astype(jnp.float64)


def pack_tril(Lemb):
    """(naux, neo, neo) symmetric -> s4-packed (naux, neo*(neo+1)/2)."""
    neo = Lemb.shape[-1]
    idx = np.tril_indices(neo)
    return np.asarray(Lemb)[:, idx[0], idx[1]]


def unpack_s4(eri_s4, neo):
    """s4-packed (npair, npair) -> full (neo, neo, neo, neo)."""
    npair = neo * (neo + 1) // 2
    idx = np.tril_indices(neo)
    M = np.zeros((neo, neo, npair))
    M[idx[0], idx[1]] = eri_s4[:npair, :npair]
    M[idx[1], idx[0]] = eri_s4[:npair, :npair]
    out = np.zeros((neo, neo, neo, neo))
    out[:, :, idx[0], idx[1]] = M
    out[:, :, idx[1], idx[0]] = M
    return out


def eri_from_df_pallas(Lemb, Lemb2=None, interpret=False):
    """Full embedding ERI from embedded DF factors Lemb (naux, neo, neo)
    via the Pallas syrk: pack tril, pad to tile multiples, kernel,
    unpack.  With Lemb2, computes the cross block
    eri[ij, kl] = sum_x Lemb[x, ij] Lemb2[x, kl] (the unrestricted ab
    channel).  Returns (neo, neo, neo, neo) float64."""
    Lemb = np.asarray(Lemb)
    naux, neo = Lemb.shape[0], Lemb.shape[-1]
    F = pack_tril(Lemb)
    npair = F.shape[1]
    npair_p = -(-npair // TI) * TI
    naux_p = -(-naux // KB) * KB
    Fp = np.zeros((naux_p, npair_p))
    Fp[:naux, :npair] = F
    F2p = None
    if Lemb2 is not None:
        F2 = pack_tril(Lemb2)
        F2p = np.zeros((naux_p, npair_p))
        F2p[:naux, :npair] = F2
        F2p = jnp.asarray(F2p)
    eri_s4 = np.asarray(syrk_df(jnp.asarray(Fp), F2p,
                                interpret=interpret))
    return unpack_s4(eri_s4[:npair, :npair], neo)


def get_emb_eri_chol_pallas(chol_L, basis, interpret=False):
    """Drop-in Pallas variant of ops.eri_transform.get_emb_eri_chol for
    restricted bases: rotate the Cholesky factors into the embedding
    space (one batched GEMM chain) and run the syrk kernel.
    basis: (spin=1, ncells, nlo, neo)."""
    basis = np.asarray(basis)
    spin, ncells, nlo, neo = basis.shape
    assert spin == 1
    C = jnp.asarray(basis.reshape(ncells * nlo, neo))
    L = jnp.asarray(chol_L)
    Lemb = jnp.einsum("xpq, pi, qj -> xij", L, C, C, optimize=True)
    return eri_from_df_pallas(np.asarray(Lemb), interpret=interpret)[None]
