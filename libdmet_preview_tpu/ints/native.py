"""
Lazy build + ctypes binding of the native integral core (_gto_core.cpp).

The reference leans on PySCF's C libcgto for AO integrals (SURVEY 2.8);
this framework owns that capability: the O(nao^4) s-shell ERI loop runs
in C++ (built once with g++ into the package directory), with the pure
NumPy implementation in ints/gto.py as the validated fallback.  pybind11
is not available in this image, so the binding is a plain C ABI through
ctypes.
"""

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from libdmet_preview_tpu.utils import logger as log

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_gto_core.cpp")
if os.access(_HERE, os.W_OK):
    _SO_DIR = _HERE
else:  # read-only install: build under the user cache dir instead
    _SO_DIR = os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.join(os.path.expanduser("~"), ".cache")),
        "libdmet_preview_tpu")
    os.makedirs(_SO_DIR, exist_ok=True)


def _src_snapshot(src):
    """(source bytes, hash-stamped .so path), captured at IMPORT time:
    the lazy build later compiles THIS snapshot into a content-keyed
    file, so a long-running process always loads a binary matching the
    C source that shipped with its loaded Python code -- never a
    silently ABI-mismatched rebuild (editing the .cpp while jobs ran
    used to rebuild the shared mtime-keyed .so under them and segfault
    on the changed struct layouts)."""
    with open(src, "rb") as f:
        data = f.read()
    h = hashlib.md5(data).hexdigest()[:10]
    base = os.path.splitext(os.path.basename(src))[0]
    return data, os.path.join(_SO_DIR, "%s.%s.so" % (base, h))


_GTO_SRC_DATA, _SO = _src_snapshot(_SRC)
_LIB = None
_TRIED = False


def _build_snapshot(src_data, so, timeout=120):
    """Compile the import-time source snapshot to a private temp file
    and os.rename into place: rename is atomic on POSIX, so concurrent
    processes never observe a partially written .so (they either load
    the old complete file or the new one)."""
    tmp_src = "%s.tmp.%d.cpp" % (so, os.getpid())
    tmp = "%s.tmp.%d" % (so, os.getpid())
    try:
        with open(tmp_src, "wb") as f:
            f.write(src_data)
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-x", "c++",
                        "-o", tmp, tmp_src], check=True,
                       capture_output=True, timeout=timeout)
        os.rename(tmp, so)
        return True
    except Exception as e:  # compiler missing / sandboxed build dir
        log.warn("native integral core build failed (%s); "
                 "using the NumPy path", e)
        try:
            if os.path.exists(tmp):
                os.remove(tmp)
        except OSError:
            pass
        return False
    finally:
        try:
            if os.path.exists(tmp_src):
                os.remove(tmp_src)
        except OSError:
            pass


def _build():
    return _build_snapshot(_GTO_SRC_DATA, _SO)


def get_lib():
    """The loaded native library, or None (NumPy fallback)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("LIBDMET_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO):        # content-keyed name: exists == current
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        log.warn("native integral core load failed (%s)", e)
        return None
    lib.eri_s_shells.argtypes = [
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.eri_s_shells.restype = None
    _LIB = lib
    return _LIB


_SR_SRC_DATA, _SR_SO = _src_snapshot(os.path.join(_HERE, "_sr_core.cpp"))
_SR_LIB = None
_SR_TRIED = False


def get_sr_lib():
    """Native short-range Hermite-sum core (_sr_core.cpp) or None.
    Built lazily next to _gto_core.so with the same atomic-rename
    scheme."""
    global _SR_LIB, _SR_TRIED
    if _SR_LIB is not None or _SR_TRIED:
        return _SR_LIB
    _SR_TRIED = True
    if os.environ.get("LIBDMET_TPU_NO_NATIVE"):
        return None
    so = _SR_SO
    if not os.path.exists(so):     # content-keyed name: exists == current
        if not _build_snapshot(_SR_SRC_DATA, so, timeout=180):
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        log.warn("native SR core load failed (%s)", e)
        return None
    lib.sr_hermite_sum.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.sr_hermite_sum.restype = None
    lib.sr_cand_sum.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.sr_cand_sum.restype = None
    _f8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    _i8 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.erfc_eri_rows.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _f8, _f8, _f8, ctypes.c_double,
        ctypes.c_int64, _i8, _f8, _f8, _f8,
        _f8, _f8, _f8,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.erfc_eri_rows.restype = None
    _SR_LIB = lib
    return _SR_LIB


def sr_hermite_sum(lsum, PC, wz, kimg, nimg, alpha, kernel):
    """S[(t,u,v) flat, img] = sum_k wz_k R_tuv(alpha; PC_k) via the
    native core; returns (S_re, S_im) or None if unavailable."""
    lib = get_sr_lib()
    if lib is None or lsum > 4:
        return None
    PC = np.ascontiguousarray(PC, dtype=np.float64)
    wz = np.ascontiguousarray(wz, dtype=np.float64)
    kimg = np.ascontiguousarray(kimg, dtype=np.int64)
    dim = (lsum + 1) ** 3
    S_re = np.zeros((dim, nimg))
    S_im = np.zeros((dim, nimg))
    a = complex(alpha)
    lib.sr_hermite_sum(lsum, PC.shape[0], nimg, PC.reshape(-1), wz, kimg,
                       float(a.real), float(a.imag), int(kernel),
                       S_re.reshape(-1), S_im.reshape(-1))
    return S_re, S_im


def sr_cand_sum(lsum, P, inv, cand_img, cand_c, ctrs, Zs, rng2, alpha,
                kernel):
    """Fused candidate screen + Hermite kernel sum (see sr_cand_sum in
    _sr_core.cpp); caller must pass C-contiguous arrays of the right
    dtypes.  Returns (S_re, S_im) of shape ((lsum+1)^3, nimg_p), or
    None if the native core is unavailable."""
    lib = get_sr_lib()
    if lib is None or lsum > 4:
        return None
    nimg_p = P.shape[0]
    dim = (lsum + 1) ** 3
    S_re = np.zeros((dim, nimg_p))
    S_im = np.zeros((dim, nimg_p))
    a = complex(alpha)
    lib.sr_cand_sum(lsum, cand_img.shape[0], nimg_p, P.reshape(-1),
                    inv, cand_img, cand_c, ctrs.reshape(-1), Zs,
                    float(rng2), float(a.real), float(a.imag),
                    int(kernel), S_re.reshape(-1), S_im.reshape(-1))
    return S_re, S_im


def eri_s_shells(shells):
    """Native ERI for a list of contracted s shells
    [(center_xyz, [(exp, coeff), ...]), ...]; returns (nao,)*4 or None if
    the native core is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nao = len(shells)
    nprim = np.asarray([len(prims) for _, prims in shells], dtype=np.int64)
    exps = np.ascontiguousarray(
        np.concatenate([[a for a, _ in prims] for _, prims in shells]),
        dtype=np.float64)
    cofs = np.ascontiguousarray(
        np.concatenate([[c for _, c in prims] for _, prims in shells]),
        dtype=np.float64)
    cens = np.ascontiguousarray(
        np.asarray([xyz for xyz, _ in shells], dtype=np.float64))
    out = np.zeros((nao,) * 4)
    lib.eri_s_shells(nao, nprim, exps, cofs, cens.reshape(-1),
                     out.reshape(-1))
    return out
