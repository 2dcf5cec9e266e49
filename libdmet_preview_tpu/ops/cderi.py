"""
CDERI (PySCF GDF HDF5) interop: ingest externally prepared density-
fitting factors into the per-transfer GDF factors this library's
embedding-ERI kernels consume, and export ours in the same layout.

The reference consumes any converged PySCF `kmf + GDF` object by
streaming its `_cderi` HDF5 file
(/root/reference/libdmet/basis_transform/eri_transform.py:195-233
sr_loop); this module owns that file surface natively so externally
prepared solids can run without PySCF:

  layout:  j3c-kptij : (npair, 2, 3) absolute k-points of each stored
                       (ki, kj) pair (only ki <= kj stored; the reverse
                       pair is the conjugate transpose)
           j3c/<idx>/<seg> : aux x row-chunk datasets, concatenated
                       over <seg>; REAL s2 (packed tril) when ki == kj
                       and the k-point is real (gamma-like), COMPLEX s1
                       (nao*nao) otherwise

  contraction convention: (p_ki q_kj | r_kk s_kl) =
      sum_x L[ki,kj][x, p, q] * L[kl,kk][x, s, r]
  with momentum conservation kj - ki = kk - kl (mod G).  This is the
  documented PySCF GDF rule; verify the absolute normalization against
  a real PySCF file when one is available (zero-egress environment:
  validated here against this library's own analytic factors).
"""

import numpy as np
import h5py

from libdmet_preview_tpu.utils import logger as log


def _kpt_index(kpts, k, tol=1e-8):
    d = np.abs(kpts - np.asarray(k)[None, :]).sum(axis=1)
    i = int(np.argmin(d))
    if d[i] > tol:
        raise ValueError("k-point %s not in the mesh" % (k,))
    return i


def _q_index(kpts_scaled, ki, kj, tol=1e-6):
    """Index q with kpts_scaled[q] == kpts_scaled[kj] - kpts_scaled[ki]
    (mod 1)."""
    d = kpts_scaled[kj] - kpts_scaled[ki]
    d = d - np.round(d)
    for q in range(len(kpts_scaled)):
        r = kpts_scaled[q] - d
        if np.abs(r - np.round(r)).max() < tol:
            return q
    raise ValueError("no transfer index for pair (%d, %d)" % (ki, kj))


def write_cderi(fname, factors, kpts, kpts_scaled, nao):
    """Export per-transfer factors {q: (F_re, F_im)} (F shaped
    (nk, nao, nao, naux_q)) as a PySCF-layout CDERI HDF5 file.

    ALL (ki, kj) pairs are stored explicitly (the layout permits an
    arbitrary kptij list): PySCF's ki <= kj + conjugate convention
    presumes one globally shared REAL auxiliary basis, which our
    per-transfer eigen factors do not have -- conjugate-filling across
    transfers would mix aux gauges."""
    nk = len(kpts)
    with h5py.File(fname, "w") as f:
        pairs = []
        idx = 0
        for ki in range(nk):
            for kj in range(nk):
                q = _q_index(kpts_scaled, ki, kj)
                F_re, F_im = factors[q]
                L = (F_re[ki] + 1j * F_im[ki])      # (nao, nao, naux)
                L = np.moveaxis(L, -1, 0)           # (naux, nao, nao)
                # PySCF stores gamma-like diagonal pairs REAL s2-packed;
                # our eigen factors are only real there if the aux gauge
                # is real, so store s2 only when actually real
                gamma_like = (ki == kj
                              and np.abs(kpts_scaled[ki]
                                         - np.round(kpts_scaled[ki])
                                         ).max() < 1e-8
                              and np.abs(L.imag).max() < 1e-12)
                grp = f.create_group("j3c/%d" % idx)
                naux = L.shape[0]
                # split into two segments to mirror PySCF's chunking
                cut = max(1, naux // 2)
                if gamma_like:
                    ix, jx = np.tril_indices(nao)
                    Lp = L.real[:, ix, jx]
                    grp["0"] = Lp[:cut]
                    grp["1"] = Lp[cut:]
                else:
                    Ls = L.reshape(naux, nao * nao)
                    grp["0"] = Ls[:cut]
                    grp["1"] = Ls[cut:]
                pairs.append((kpts[ki], kpts[kj]))
                idx += 1
        f["j3c-kptij"] = np.asarray(pairs)


def read_cderi(fname, kpts, kpts_scaled, nao, tol_kpt=1e-8):
    """Ingest a PySCF-layout CDERI HDF5 file into the per-transfer GDF
    factors {q: (F_re, F_im)} consumed by
    ops.eri_transform.get_emb_eri_gdf (reference sr_loop role)."""
    nk = len(kpts)
    kpts = np.asarray(kpts, dtype=float)
    kpts_scaled = np.asarray(kpts_scaled, dtype=float)
    pair_L = {}
    with h5py.File(fname, "r") as f:
        kptij = np.asarray(f["j3c-kptij"])
        for idx in range(kptij.shape[0]):
            ki = _kpt_index(kpts, kptij[idx, 0], tol_kpt)
            kj = _kpt_index(kpts, kptij[idx, 1], tol_kpt)
            grp = f["j3c/%d" % idx]
            segs = sorted(grp.keys(), key=int)
            L = np.concatenate([np.asarray(grp[s]) for s in segs],
                               axis=0)
            if L.ndim == 2 and L.shape[1] == nao * (nao + 1) // 2 \
                    and not np.iscomplexobj(L):
                # s2 packed tril -> full symmetric
                full = np.zeros((L.shape[0], nao, nao))
                ix, jx = np.tril_indices(nao)
                full[:, ix, jx] = L
                full[:, jx, ix] = L
                L = full.astype(complex)
            else:
                L = np.asarray(L, dtype=complex).reshape(-1, nao, nao)
            pair_L[(ki, kj)] = L
    # conjugate-transpose fills the unstored reverse pairs
    for (ki, kj) in list(pair_L.keys()):
        if (kj, ki) not in pair_L:
            pair_L[(kj, ki)] = pair_L[(ki, kj)].conj().transpose(0, 2, 1)
    factors = {}
    for q in range(nk):
        Fs = []
        naux_q = None
        for ki in range(nk):
            kj = None
            for cand in range(nk):
                if _q_index(kpts_scaled, ki, cand) == q:
                    kj = cand
                    break
            if kj is None or (ki, kj) not in pair_L:
                raise ValueError("missing CDERI pair for transfer %d "
                                 "at k %d" % (q, ki))
            L = pair_L[(ki, kj)]
            if naux_q is None:
                naux_q = L.shape[0]
            log.eassert(L.shape[0] == naux_q,
                        "inconsistent naux across pairs of transfer %d",
                        q)
            Fs.append(np.moveaxis(L, 0, -1))       # (nao, nao, naux)
        F = np.asarray(Fs)                         # (nk, nao, nao, naux)
        factors[q] = (np.ascontiguousarray(F.real),
                      np.ascontiguousarray(F.imag))
    return factors
