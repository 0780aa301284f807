"""ctypes wrapper for the C++ host DTW kernel (csrc/dtwhost.cc).

The TPU path is `ops/dtw.py` (wavefront `lax.scan`) / `ops/dtw_pallas.py`
(hand-written kernel); this host kernel is the C++ fallback SURVEY §7
allows — used by the reference-comparison benchmark harness
(`scripts/bench_eval.py`) and available for JAX-free callers. Bit-exact
against the JAX implementations (`tests/test_dtw_host.py`).
"""

from __future__ import annotations

import os
import subprocess

import numpy as np

_lib = None
_checked = False


def _ensure_built(lib_path: str, src_name: str) -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(os.path.dirname(here), 'csrc', src_name)
    if not os.path.exists(src):
        return
    if (os.path.exists(lib_path)
            and os.path.getmtime(lib_path) >= os.path.getmtime(src)):
        return
    try:
        subprocess.run(['make', '-C', os.path.dirname(src)],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass


def get_lib():
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    import ctypes
    here = os.path.dirname(os.path.abspath(__file__))
    lib_path = os.path.join(here, 'libdtwhost.so')
    _ensure_built(lib_path, 'dtwhost.cc')
    if not os.path.exists(lib_path):
        return None
    lib = ctypes.CDLL(lib_path)
    lib.dtw_host_batch.restype = None
    lib.dtw_host_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float)]
    _lib = lib
    return lib


def dtw_normalized_host(dist: np.ndarray, n1, n2) -> np.ndarray:
    """Normalized DTW scores for (B, S1, S2) padded distance matrices —
    numpy in, numpy out, no JAX. Same contract as `dtw.dtw_normalized`."""
    import ctypes
    lib = get_lib()
    if lib is None:
        raise RuntimeError("libdtwhost.so not built; run `make -C csrc`")
    dist = np.ascontiguousarray(dist, dtype=np.float32)
    b, s1, s2 = dist.shape
    n1 = np.ascontiguousarray(n1, dtype=np.int32)
    n2 = np.ascontiguousarray(n2, dtype=np.int32)
    out = np.empty((b,), dtype=np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.dtw_host_batch(dist.ctypes.data_as(fp), b, s1, s2,
                       n1.ctypes.data_as(ip), n2.ctypes.data_as(ip),
                       out.ctypes.data_as(fp))
    return out


def dtw_batch_host(x, y, sx, sy, dist_mat, ignore_diag: bool = False,
                   symetric: bool = False):
    """Signature-compatible with the reference Cython `dtw.dtw_batch`
    (`dtw.pyx:16-36`) and with `ops.dtw.dtw_batch`; pure host compute."""
    dist_mat = np.ascontiguousarray(dist_mat, dtype=np.float32)
    nx, ny, _s1, _s2 = dist_mat.shape
    sx = np.asarray(sx, dtype=np.int32)
    sy = np.asarray(sy, dtype=np.int32)
    flat = dist_mat.reshape(nx * ny, _s1, _s2)
    out = dtw_normalized_host(flat, np.repeat(sx, ny),
                              np.tile(sy, nx)).reshape(nx, ny)
    if ignore_diag:
        np.fill_diagonal(out, 0.0)
    return out
