"""
Embedding-ERI transforms from factorized two-electron integrals
(TPU-native rewrite of the reference's hot core,
/root/reference/libdmet/basis_transform/eri_transform.py:44-1500).

The reference streams CDERI chunks from HDF5 per (ki, kj) momentum pair
and accumulates eri += w * L^dagger L on the CPU.  Here the density-fitted
(Cholesky) factors live on device and the whole transform is two batched
GEMMs that XLA tiles onto the MXU:

    L_emb[x, i, j] = C[p, i] L[x, p, q] C[q, j]          (AO->EO rotation)
    eri[s]         = einsum('xij, xkl -> ijkl', La, Lb)  (syrk-like)

For the molecular/ring path the factors come from a pivoted Cholesky of
the exact ERI (utils analog of reference utils/cholesky.py); for a
periodic GDF path the same kernel consumes per-k CDERI pairs.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def cholesky_eri(eri, tol=1e-9, max_rank=None):
    """Pivoted (modified) Cholesky factorization of a (n, n, n, n) chemist
    ERI: eri ~= sum_x L[x] (x) L[x], L (naux, n, n)
    (reference utils/cholesky.py:21-117 capability)."""
    eri = np.asarray(eri)
    n = eri.shape[0]
    M = eri.reshape(n * n, n * n).copy()
    diag = np.diag(M).copy()
    if max_rank is None:
        max_rank = n * n
    Ls = []
    for _ in range(max_rank):
        p = int(np.argmax(diag))
        dmax = diag[p]
        if dmax < tol:
            break
        l = M[:, p] / np.sqrt(dmax)
        Ls.append(l)
        M -= np.outer(l, l)
        diag = np.maximum(np.diag(M), 0.0)
    L = np.asarray(Ls).reshape(len(Ls), n, n)
    # symmetrize (pq) since eri has (pq|rs) = (qp|rs) for real orbitals
    return 0.5 * (L + L.transpose(0, 2, 1))


@jax.jit
def _rotate_chol(L, C):
    """(naux, n, n) x (n, neo) -> (naux, neo, neo)."""
    return jnp.einsum("xpq, pi, qj -> xij", L, C, C, optimize=True)


@jax.jit
def _syrk_eri(La, Lb):
    return jnp.einsum("xij, xkl -> ijkl", La, Lb, optimize=True)


def _use_pallas_syrk(naux, neo):
    """Auto-select the Pallas split-precision syrk kernel: TPU backend,
    size above the tile threshold (the kernel pays off once the s4 pair
    matrix exceeds one 128x128 MXU tile), unless overridden by
    LIBDMET_PALLAS_ERI=0/1."""
    import os
    ov = os.environ.get("LIBDMET_PALLAS_ERI")
    if ov is not None:
        return ov not in ("0", "false", "False")
    try:
        backend = jax.default_backend()
    except Exception:
        return False
    return (backend == "tpu" and neo >= 48 and naux >= 256)


def get_emb_eri_chol(L, basis, outcore=None):
    """Embedding ERI from Cholesky/DF factors.

    L: (naux, nsite, nsite) factors in the (LO, full-lattice) site basis;
    basis: (spin, ncells, nlo, neo) embedding basis (R stripe).
    Returns (spin_pair, neo, neo, neo, neo) with blocks [aa] or
    [aa, bb, ab] (chemist), matching embham._emb_H2's contract.

    outcore: optional HDF5 path -- the result is streamed to a dataset
    "eri" and returned as an open-for-read h5py Dataset (the reference's
    outcore result mode, eri_transform.py:311-327), for embeddings whose
    ERI exceeds host RAM."""
    basis = np.asarray(basis)
    spin, ncells, nlo, neo = basis.shape
    C = basis.reshape(spin, ncells * nlo, neo)
    Lj = jnp.asarray(L)
    Ls = [_rotate_chol(Lj, jnp.asarray(C[s])) for s in range(spin)]
    if _use_pallas_syrk(np.shape(L)[0], neo):
        # flagship TPU kernel: split-fp32 Kahan syrk on the MXU
        # (ops/pallas_eri.py; ~1e-7 relative vs the f64 einsum,
        # tests/test_pallas_eri.py + the on-chip bench in README);
        # unrestricted runs two syrks (aa, bb) + the ab cross GEMM
        # through the same kernel
        from libdmet_preview_tpu.ops.pallas_eri import eri_from_df_pallas
        La = np.asarray(Ls[0])
        if spin == 1:
            blocks = [jnp.asarray(eri_from_df_pallas(La))]
        else:
            Lb = np.asarray(Ls[1])
            blocks = [jnp.asarray(eri_from_df_pallas(La)),
                      jnp.asarray(eri_from_df_pallas(Lb)),
                      jnp.asarray(eri_from_df_pallas(La, Lb))]
    elif spin == 1:
        blocks = [_syrk_eri(Ls[0], Ls[0])]
    else:
        blocks = [_syrk_eri(Ls[0], Ls[0]), _syrk_eri(Ls[1], Ls[1]),
                  _syrk_eri(Ls[0], Ls[1])]
    if outcore is not None:
        import h5py
        with h5py.File(outcore, "w") as f:
            dset = f.create_dataset(
                "eri", (len(blocks),) + (neo,) * 4, dtype="f8")
            for i, b in enumerate(blocks):
                dset[i] = np.asarray(b)
        f = h5py.File(outcore, "r")
        return f["eri"]
    return np.asarray([np.asarray(x) for x in blocks])


def get_emb_eri_gso_chol(L, basis):
    """GSO (particle-hole transformed) embedding ERI from Cholesky/DF
    factors (reference eri_transform.py:1104-1311 get_emb_eri_gso role).

    The transformed two-body [aa: +g, bb: +g, ab: -g] of one spatial ERI
    g = sum_x L_x (x) L_x factorizes exactly:

        g_gso = sum_x (La_x - Lb_x) (x) (La_x - Lb_x)

    with La/Lb the factors rotated by the a/b species blocks of the GSO
    embedding basis -- one subtraction plus the same rotate+syrk kernel.

    L: (naux, nsite, nsite) in the (LO, full-lattice) site basis per
    SPECIES sub-block index; basis: (1, ncells, nso, neo) GSO basis with
    rows [:nao] = a-species, [nao:] = b-species per cell.
    Returns (neo,)*4 chemist."""
    basis = np.asarray(basis)
    if basis.ndim == 4:
        basis = basis[0]
    ncells, nso, neo = basis.shape
    nao = nso // 2
    Ca = basis[:, :nao, :].reshape(ncells * nao, neo)
    Cb = basis[:, nao:, :].reshape(ncells * nao, neo)
    Lj = jnp.asarray(L)
    La = _rotate_chol(Lj, jnp.asarray(Ca))
    Lb = _rotate_chol(Lj, jnp.asarray(Cb))
    Ld = La - Lb
    return np.asarray(_syrk_eri(Ld, Ld))


def _cplx_einsum(spec, *pairs):
    """einsum over complex operands given as (re, im) pairs; returns a
    (re, im) pair.  Expands to real einsums (TPU has no complex128)."""
    acc_re, acc_im = None, None
    import itertools
    n = len(pairs)
    for bits in itertools.product((0, 1), repeat=n):
        # term = prod_i (re or i*im); collect i-power and sign
        arrs = [pairs[i][bits[i]] for i in range(n)]
        k = sum(bits) % 4
        term = jnp.einsum(spec, *arrs, optimize=True)
        if k == 0:
            acc_re = term if acc_re is None else acc_re + term
        elif k == 1:
            acc_im = term if acc_im is None else acc_im + term
        elif k == 2:
            acc_re = -term if acc_re is None else acc_re - term
        else:
            acc_im = -term if acc_im is None else acc_im - term
    if acc_re is None:
        acc_re = jnp.zeros_like(acc_im)
    if acc_im is None:
        acc_im = jnp.zeros_like(acc_re)
    return acc_re, acc_im


def make_gdf_factors(eri_lo, ncells, nlo, tol=1e-10):
    """k-resolved density-fitting factors of a translation-invariant LO
    ERI, grouped by momentum transfer (the GDF/CDERI structure the
    reference streams from HDF5, eri_transform.py:195-335).

    For each transfer q the Hermitian PSD matrix
        M_q[(k1, p, a), (k3, s, r)] = (k1 p, k1+q a | k3+q r, k3 s)
    is factorized M_q = F_q F_q^H (eigendecomposition; rank-revealing).
    Conventions: creation legs carry e^{+ikR} phases.

    Returns {q: (F_re, F_im)} with F shaped (ncells, nlo, nlo, naux_q)."""
    eri_lo = np.asarray(eri_lo)
    E = eri_lo.reshape(ncells, nlo, ncells, nlo, ncells, nlo, ncells, nlo)
    f = np.fft.fftfreq(ncells)
    P = np.exp(-2j * np.pi * np.outer(f, np.arange(ncells)))
    # creation legs (A, C) carry e^{-ikR} = P; annihilation legs the conj
    Ek = np.einsum("ApBqCrDs, kA, lB, mC, nD -> kplqmrns",
                   E, P, P.conj(), P, P.conj()) / ncells ** 2
    nn = nlo * nlo
    out = {}
    for q in range(ncells):
        M = np.zeros((ncells * nn, ncells * nn), dtype=complex)
        for k1 in range(ncells):
            for k3 in range(ncells):
                blk = Ek[k1, :, (k1 + q) % ncells, :,
                         (k3 + q) % ncells, :, k3, :]
                blk = blk.transpose(0, 1, 3, 2)    # cols packed (s, r)
                M[k1 * nn:(k1 + 1) * nn,
                  k3 * nn:(k3 + 1) * nn] = blk.reshape(nn, nn)
        M = 0.5 * (M + M.conj().T)
        w, v = np.linalg.eigh(M)
        keep = w > tol
        F = v[:, keep] * np.sqrt(w[keep])
        F = F.reshape(ncells, nlo, nlo, -1)
        out[q] = (np.ascontiguousarray(F.real),
                  np.ascontiguousarray(F.imag))
    return out


def get_emb_eri_gdf(factors, basis_k, ncells, nlo, tr_symm=False):
    """Embedding ERI from k-resolved GDF factors with momentum
    conservation (TPU-native form of the reference's hot loop,
    eri_transform.py:235-565: per-q rotate + syrk, batched GEMMs).

    tr_symm=True exploits time reversal (real R-space orbitals): the -q
    transfer contributes the complex conjugate, so only the irreducible
    transfers are computed with weight 2 (the reference's
    get_weights_t_reversal, eri_transform.py:142).

    factors: {q: (F_re, F_im)} from make_gdf_factors;
    basis_k: (re, im) pair (1, nk, nlo, neo).
    Returns the real (1, neo, neo, neo, neo) chemist embedding ERI."""
    C_re = jnp.asarray(basis_k[0][0])
    C_im = jnp.asarray(basis_k[1][0])
    neo = C_re.shape[-1]
    eri = jnp.zeros((neo,) * 4)
    if tr_symm:
        items = [(q, f, 2.0 if (ncells - q) % ncells != q else 1.0)
                 for q, f in factors.items()
                 if q <= (ncells - q) % ncells]
    else:
        items = [(q, f, 1.0) for q, f in factors.items()]
    for q, (F_re, F_im), w in items:
        Fq = (jnp.asarray(F_re), jnp.asarray(F_im))
        Cq = (jnp.roll(C_re, -q, axis=0), jnp.roll(C_im, -q, axis=0))
        Cconj = (C_re, -C_im)
        Cqconj = (Cq[0], -Cq[1])
        # G_x[i, j] = sum_{k p a} F[k,p,a,x] C*(k)_pi C(k+q)_aj
        G = _cplx_einsum("kpax, kpi, kaj -> xij", Fq, Cconj, Cq)
        # H_x[k, l] = sum_{k3 s r} F[k3,s,r,x] C(k3+q)_rl' C*(k3)_sl
        H = _cplx_einsum("ksrx, krm, ksl -> xml", Fq, Cq, Cconj)
        # eri += w * Re[ G_x[i,j] * conj(H_x[k,l]) ]
        eri = eri + w * (jnp.einsum("xij, xkl -> ijkl", G[0], H[0])
                         + jnp.einsum("xij, xkl -> ijkl", G[1], H[1]))
    return np.asarray(eri)[None] / ncells ** 2


def get_emb_eri_mol(eri_full, basis):
    """Direct (un-factorized) embedding transform; brute-force oracle for
    get_emb_eri_chol (reference eri_transform.py:1429 get_emb_eri_mol)."""
    basis = np.asarray(basis)
    spin, ncells, nlo, neo = basis.shape
    C = basis.reshape(spin, ncells * nlo, neo)
    g = jnp.asarray(eri_full)

    def t4(Cp, Cq):
        return np.asarray(jnp.einsum(
            "pqrs, pi, qj, rk, sl -> ijkl", g, Cp, Cp, Cq, Cq,
            optimize=True))

    Cs = [jnp.asarray(C[s]) for s in range(spin)]
    if spin == 1:
        return t4(Cs[0], Cs[0])[None]
    return np.asarray([t4(Cs[0], Cs[0]), t4(Cs[1], Cs[1]),
                       t4(Cs[0], Cs[1])])


def get_emb_eri_gso_gdf(factors, basis_k, ncells, nao, tr_symm=False):
    """GSO (particle-hole transformed) embedding ERI from k-resolved GDF
    factors (reference eri_transform.py:1104-1311 get_emb_eri_gso, the
    GDF driver for ab initio superconducting DMET).

    The ph-transformed two-body [aa: +g, bb: +g, ab: -g] of the spatial
    g factorizes PER AUXILIARY VECTOR: with La/Lb the factors rotated by
    the a/b species blocks of the GSO basis, g_gso = sum_x (La - Lb)
    (x) (La - Lb)^*, so the kernel is the spinless one on the species
    difference -- same momentum-conservation loop as get_emb_eri_gdf.

    factors: {q: (F_re, F_im)} from make_gdf_factors over nao spatial
    LOs; basis_k: (re, im) pair (1, nk, 2*nao, neo) GSO basis, rows
    [:nao] = a species, [nao:] = b species per cell.
    Returns the real (neo, neo, neo, neo) chemist GSO embedding ERI."""
    Ca_re = jnp.asarray(basis_k[0][0][:, :nao, :])
    Ca_im = jnp.asarray(basis_k[1][0][:, :nao, :])
    Cb_re = jnp.asarray(basis_k[0][0][:, nao:, :])
    Cb_im = jnp.asarray(basis_k[1][0][:, nao:, :])
    neo = Ca_re.shape[-1]
    eri = jnp.zeros((neo,) * 4)
    if tr_symm:
        items = [(q, f, 2.0 if (ncells - q) % ncells != q else 1.0)
                 for q, f in factors.items()
                 if q <= (ncells - q) % ncells]
    else:
        items = [(q, f, 1.0) for q, f in factors.items()]
    for q, (F_re, F_im), w in items:
        Fq = (jnp.asarray(F_re), jnp.asarray(F_im))
        Gs, Hs = [], []
        for C_re, C_im in ((Ca_re, Ca_im), (Cb_re, Cb_im)):
            Cq = (jnp.roll(C_re, -q, axis=0), jnp.roll(C_im, -q, axis=0))
            Cc = (C_re, -C_im)
            Gs.append(_cplx_einsum("kpax, kpi, kaj -> xij", Fq, Cc, Cq))
            Hs.append(_cplx_einsum("ksrx, krm, ksl -> xml", Fq, Cq, Cc))
        G = (Gs[0][0] - Gs[1][0], Gs[0][1] - Gs[1][1])
        H = (Hs[0][0] - Hs[1][0], Hs[0][1] - Hs[1][1])
        eri = eri + w * (jnp.einsum("xij, xkl -> ijkl", G[0], H[0])
                         + jnp.einsum("xij, xkl -> ijkl", G[1], H[1]))
    return np.asarray(eri) / ncells ** 2


def get_emb_eri(source, basis, df_type=None, **kwargs):
    """Unified embedding-ERI dispatch by density-fitting type -- the
    TPU-native analog of the reference's get_emb_eri entry point
    (/root/reference/libdmet/basis_transform/eri_transform.py:44-94,
    which routes on the PySCF DF object's class).  Here the routing key
    is either inferred from `source` or named explicitly:

      df_type      source                         driver
      ---------    ----------------------------   -------------------------
      "chol"       (naux, n, n) Cholesky/DF L      get_emb_eri_chol
      "gdf"        {q: (F_re, F_im)} k-factors     get_emb_eri_gdf
      "mol"        dense (n,)*4 chemist ERI        get_emb_eri_mol
      "aft"        PbcCell                         cell.get_emb_eri_aft
      "fft"        PbcCell                         cell.get_emb_eri_fft
      "mdf"/"rs"   PbcCell                         cell.get_emb_eri_rs
                   (the range-separated Gaussian-SR + plane-wave-LR
                   driver fills the reference MDF role,
                   eri_transform.py:566-1087; see ints/pbc.py)

    For the cell drivers `basis` is the (nao, neo) AO->EO coefficient
    matrix; for the array drivers it is the (spin, ncells, nlo, neo)
    stripe embedding basis (get_emb_eri_gdf additionally needs
    ncells/nlo via kwargs).  Extra kwargs pass through to the driver."""
    if df_type is None:
        if hasattr(source, "get_emb_eri_aft"):
            df_type = "aft"
        elif isinstance(source, dict):
            df_type = "gdf"
        else:
            arr = np.asarray(source)
            if arr.ndim == 3:
                df_type = "chol"
            elif arr.ndim >= 4:
                df_type = "mol"
            else:
                raise ValueError("cannot infer df_type from source shape "
                                 f"{arr.shape}")
    df_type = df_type.lower()
    if df_type == "chol":
        return get_emb_eri_chol(source, basis, **kwargs)
    if df_type == "gdf":
        return get_emb_eri_gdf(source, basis, **kwargs)
    if df_type in ("mol", "incore"):
        return get_emb_eri_mol(source, basis)
    if df_type in ("aft", "fft", "mdf", "rs"):
        name = {"aft": "get_emb_eri_aft", "fft": "get_emb_eri_fft",
                "mdf": "get_emb_eri_rs", "rs": "get_emb_eri_rs"}[df_type]
        return getattr(source, name)(basis, **kwargs)
    raise ValueError(f"unknown df_type {df_type!r}")
