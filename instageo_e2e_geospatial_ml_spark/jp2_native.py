"""Optional native EBCOT tier-1 kernel (ctypes, lazily compiled).

jp2_t1.c — a line-for-line port of jp2.py's reference MQ coder + coding
passes — is compiled once per machine with the system C compiler into a
content-hash-keyed shared object under the user cache dir and loaded via
ctypes. Nothing is installed: if no compiler is present (or the build
fails for any reason) `available()` is False and jp2.py silently keeps
its pure-Python vectorized path, which is the behavioral source of truth
(tests pin bit-exact parity between the two, truncated streams included).

Why this exists: tier-1 is a bit-serial arithmetic coder — the one
workload numpy cannot vectorize (every MQ decision depends on the coder
state left by the previous one). The pure-Python rewrite buys ~4-5×;
the compiled kernel buys ~120× measured end-to-end on tier-1 decode
(BENCH/jp2.json; isolated coder microbenchmarks run higher still),
which is what makes JP2-heavy scans
(Sentinel-2 band rasters at 100 TB) a scan-cost problem instead of a
cluster-sizing problem. Executor-side use is fine: the .so is compiled
on first use per machine and cached; pandas-UDF workers share it.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jp2_t1.c")
_BAND_ID = {"LL": 0, "HL": 1, "LH": 2, "HH": 3}

_lib = None
_tried = False


def _cache_dir() -> str:
    root = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = os.path.join(root, "instageo_e2e_geospatial_ml_spark")
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> "ctypes.CDLL | None":
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None or not os.path.exists(_SRC):
        return None
    with open(_SRC, "rb") as fh:
        src = fh.read()
    key = hashlib.sha256(src).hexdigest()[:16]
    so = os.path.join(_cache_dir(), f"jp2_t1_{key}.so")
    if not os.path.exists(so):
        # build to a temp name + atomic rename: concurrent executors race
        # benignly (same content, same target)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so))
        os.close(fd)
        try:
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.rename(tmp, so)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.jp2_t1_decode.restype = ctypes.c_int
    lib.jp2_t1_decode.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.jp2_t1_encode.restype = ctypes.c_int
    lib.jp2_t1_encode.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def _get() -> "ctypes.CDLL | None":
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib


def available() -> bool:
    return _get() is not None


def tier1_decode_c(
    data: bytes, h: int, w: int, band: str, nplanes: int, npasses: int
) -> np.ndarray:
    lib = _get()
    out = np.zeros(h * w, np.int64)
    rc = lib.jp2_t1_decode(
        bytes(data),
        len(data),
        h,
        w,
        _BAND_ID[band],
        nplanes,
        npasses,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise MemoryError(f"jp2_t1_decode failed: {rc}")
    return out.reshape(h, w)


def tier1_encode_c(coefs: np.ndarray, band: str) -> tuple[bytes, int, int]:
    lib = _get()
    h, w = coefs.shape
    c64 = np.ascontiguousarray(coefs, np.int64)
    # worst-case MQ output is well under 2 bytes/coefficient/plane; the
    # generous cap keeps the C side allocation-free
    cap = h * w * 16 + 1024
    buf = ctypes.create_string_buffer(cap)
    npasses = ctypes.c_int(0)
    nplanes = ctypes.c_int(0)
    rc = lib.jp2_t1_encode(
        c64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        h,
        w,
        _BAND_ID[band],
        buf,
        cap,
        ctypes.byref(npasses),
        ctypes.byref(nplanes),
    )
    if rc < 0:
        raise MemoryError(f"jp2_t1_encode failed: {rc}")
    return buf.raw[:rc], npasses.value, nplanes.value
