"""ctypes bindings for the native rANS kernel (csrc/rans.cc).

Builds the shared library on first use with g++ (cached beside the source,
keyed on a source hash) and exposes drop-in encode/decode with the exact
signature and bitstream of the numpy path in coding.py. Falls back cleanly
when no compiler is available; set HIFIC_TPU_NATIVE=0 to force the numpy
path.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "rans.cc")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    with open(_CSRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "HIFIC_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hific_tpu"))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"librans_{digest}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-march=native", _CSRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so_path)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)

    i64, i32p, u32p, f64p = (ctypes.c_int64,
                             np.ctypeslib.ndpointer(np.int32, flags="C"),
                             np.ctypeslib.ndpointer(np.uint32, flags="C"),
                             np.ctypeslib.ndpointer(np.float64, flags="C"))
    lib.rans_encode_indexed.restype = ctypes.c_int64
    lib.rans_encode_indexed.argtypes = [
        i32p, i32p, i64, i64, u32p, i32p, i32p, i64, ctypes.c_int, u32p, i64]
    lib.rans_decode_indexed.restype = None
    lib.rans_decode_indexed.argtypes = [
        u32p, i64, i32p, i64, i64, u32p, i32p, i32p, i64, i32p, ctypes.c_int,
        i32p]
    lib.pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.pmf_to_quantized_cdf.argtypes = [f64p, i64, ctypes.c_int, i32p]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("HIFIC_TPU_NATIVE", "1") == "0":
        return None
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            globals()["_TRIED"] = True
    return _LIB


def available() -> bool:
    return get_lib() is not None


def encode_lanes(symbols_l: np.ndarray, indices_l: np.ndarray,
                 cdf: np.ndarray, cdf_length: np.ndarray,
                 cdf_offset: np.ndarray, precision: int) -> np.ndarray:
    """symbols_l/indices_l: (n_pos, n_lanes) int32, lane layout pre-applied."""
    lib = get_lib()
    assert lib is not None
    n_pos, n_lanes = symbols_l.shape
    symbols_l = np.ascontiguousarray(symbols_l, np.int32)
    indices_l = np.ascontiguousarray(indices_l, np.int32)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    cdf_length = np.ascontiguousarray(cdf_length, np.int32)
    cdf_offset = np.ascontiguousarray(cdf_offset, np.int32)

    cap = 2 * n_lanes + 4 * n_pos * n_lanes + 1024
    out = np.empty(cap, np.uint32)
    n = lib.rans_encode_indexed(symbols_l, indices_l, n_pos, n_lanes, cdf,
                                cdf_length, cdf_offset, cdf.shape[1],
                                precision, out, cap)
    if n < 0:  # capacity miss (pathological overflow payloads)
        cap = -n
        out = np.empty(cap, np.uint32)
        n = lib.rans_encode_indexed(symbols_l, indices_l, n_pos, n_lanes, cdf,
                                    cdf_length, cdf_offset, cdf.shape[1],
                                    precision, out, cap)
        assert n > 0
    return out[:n].copy()


def decode_lanes(encoded: np.ndarray, indices_l: np.ndarray, cdf: np.ndarray,
                 cdf_length: np.ndarray, cdf_offset: np.ndarray,
                 inverse: np.ndarray, precision: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    n_pos, n_lanes = indices_l.shape
    encoded = np.ascontiguousarray(encoded, np.uint32)
    indices_l = np.ascontiguousarray(indices_l, np.int32)
    cdf = np.ascontiguousarray(cdf, np.uint32)
    cdf_length = np.ascontiguousarray(cdf_length, np.int32)
    cdf_offset = np.ascontiguousarray(cdf_offset, np.int32)
    inverse = np.ascontiguousarray(inverse, np.int32)
    out = np.empty((n_pos, n_lanes), np.int32)
    lib.rans_decode_indexed(encoded, len(encoded), indices_l, n_pos, n_lanes,
                            cdf, cdf_length, cdf_offset, cdf.shape[1],
                            inverse, precision, out)
    return out


def pmf_to_quantized_cdf_native(pmf: np.ndarray, precision: int) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    pmf = np.ascontiguousarray(pmf, np.float64)
    out = np.empty(len(pmf) + 1, np.int32)
    rc = lib.pmf_to_quantized_cdf(pmf, len(pmf), precision, out)
    assert rc == 0, f"pmf_to_quantized_cdf failed: {rc}"
    return out
