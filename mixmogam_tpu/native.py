"""ctypes bindings for the C++ data-plane (native/fast_parse.cpp):
threaded CSV->int8 parsing and 2-bit genotype packing.

The library is built lazily (one `make` invocation, cached next to the
sources) and everything here degrades gracefully to the pure-Python
paths when no C++ toolchain is available."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastparse.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                           capture_output=True, timeout=120)
        return r.returncode == 0 and os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            _bind(lib)
        except OSError:
            return None
        except AttributeError:
            # a stale .so built before the current ABI (e.g. pre-VCF):
            # rebuild once, else degrade to the Python paths instead of
            # crashing callers with a missing-symbol AttributeError
            # (review finding)
            if not _build():
                return None
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                _bind(lib)
            except (OSError, AttributeError):
                return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    """Declare every exported symbol's signature; raises AttributeError
    when the .so predates a symbol (stale build)."""
    lib.count_csv.restype = ctypes.c_int
    lib.count_csv.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int64)]
    lib.parse_dosage_csv.restype = ctypes.c_int64
    lib.parse_dosage_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.packed_row_bytes.restype = ctypes.c_int64
    lib.packed_row_bytes.argtypes = [ctypes.c_int64]
    lib.pack_2bit.restype = None
    lib.pack_2bit.argtypes = [ctypes.POINTER(ctypes.c_int8),
                              ctypes.c_int64, ctypes.c_int64,
                              ctypes.POINTER(ctypes.c_uint8)]
    lib.unpack_2bit.restype = None
    lib.unpack_2bit.argtypes = [ctypes.POINTER(ctypes.c_uint8),
                                ctypes.c_int64, ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_int8)]
    lib.vcf_open.restype = ctypes.c_void_p
    lib.vcf_open.argtypes = [ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int64)]
    lib.vcf_close.restype = None
    lib.vcf_close.argtypes = [ctypes.c_void_p]
    lib.vcf_next.restype = ctypes.c_int64
    lib.vcf_next.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int]


def available() -> bool:
    return get_lib() is not None


def parse_dosage_csv(path: str, n_threads: int = 0
                     ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                         np.ndarray, int]]:
    """Parse a dosage CSV body natively. Returns (matrix int8 (M, n),
    chromosomes, positions, n_samples) or None if native is unavailable.
    The caller parses the header (accession names) in Python."""
    lib = get_lib()
    if lib is None:
        return None
    n_rows = ctypes.c_int64()
    n_fields = ctypes.c_int64()
    if lib.count_csv(path.encode(), ctypes.byref(n_rows),
                     ctypes.byref(n_fields)) != 0:
        return None
    M = int(n_rows.value)
    n = int(n_fields.value) - 2
    if n <= 0 or M < 0:
        return None
    mat = np.empty((M, n), dtype=np.int8)
    chroms = np.empty(M, dtype=np.int32)
    poss = np.empty(M, dtype=np.int64)
    got = lib.parse_dosage_csv(
        path.encode(), M, n,
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        chroms.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        poss.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_threads)
    if got < 0:
        return None
    if got < M:
        mat, chroms, poss = mat[:got], chroms[:got], poss[:got]
    return mat, chroms, poss, n


def iter_vcf(path: str, n_samples: int, chunk_rows: int = 65_536,
             n_threads: int = 0):
    """Stream a VCF's GT records natively (native/fast_vcf.cpp, round 4:
    one pass, memory-bounded, zlib-transparent so plain .vcf, gzip AND
    bgzip all parse in C++). Yields per-chunk tuples
    (matrix int8 (m, n), positions, chrom_codes int32 (-1 = non-
    numeric), chrom_names bytes (m, 16) NUL-padded, alleles (m, 2) str,
    chunk_max_arity). Raises ValueError on a structurally malformed
    body (the caller catches and falls back to the Python reader, which
    raises the descriptive error) and RuntimeError when the native
    library is unavailable or the header disagrees — use
    `native.available()` / a Python header pre-check first."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    ns = ctypes.c_int64()
    h = lib.vcf_open(path.encode(), ctypes.byref(ns))
    if not h:
        raise RuntimeError("native header parse failed")
    try:
        if int(ns.value) != n_samples:
            raise RuntimeError(
                f"native header sample count {int(ns.value)} != "
                f"python's {n_samples}")
        mat = np.empty((chunk_rows, n_samples), dtype=np.int8)
        poss = np.empty(chunk_rows, dtype=np.int64)
        codes = np.empty(chunk_rows, dtype=np.int32)
        names = np.zeros(chunk_rows * 16, dtype=np.uint8)
        offs = np.zeros(2 * chunk_rows, dtype=np.int64)
        acap = 64 * chunk_rows
        arena = np.zeros(acap, dtype=np.uint8)
        while True:
            arity = ctypes.c_int32(1)
            got = lib.vcf_next(
                h, chunk_rows,
                mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                poss.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                names.ctypes.data_as(ctypes.c_char_p),
                arena.ctypes.data_as(ctypes.c_char_p), arena.size,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.byref(arity), n_threads)
            if got == -3:      # arena too small: grow and retry (input
                acap *= 4      # is carried inside the native handle)
                arena = np.zeros(acap, dtype=np.uint8)
                continue
            if got < 0:
                raise ValueError("malformed VCF body (native)")
            w = int(got)
            if w == 0:
                return
            # split only the USED arena extent: the last ALT string
            # starts at offs[2w-1] and ends at its NUL (splitting the
            # whole mostly-zero arena would materialize millions of
            # empty byte-strings per chunk)
            off_last = int(offs[2 * w - 1])
            used = off_last + int(np.argmax(arena[off_last:] == 0)) + 1
            parts = arena[:used].tobytes().split(b"\0")[:2 * w]
            alleles = (np.asarray(
                [p.decode("utf-8", "replace") for p in parts],
                dtype=object).reshape(w, 2) if w
                else np.zeros((0, 2), dtype=object))
            yield (mat[:w].copy(), poss[:w].copy(), codes[:w].copy(),
                   names.reshape(chunk_rows, 16)[:w].copy(),
                   np.asarray(alleles, dtype=str), int(arity.value))
    finally:
        lib.vcf_close(h)


def parse_vcf(path: str, n_samples: int, n_threads: int = 0,
              chunk_rows: int = 65_536
              ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  np.ndarray, np.ndarray, int]]:
    """Parse a whole VCF natively via the streaming iterator:
    (matrix int8 (M, n), positions, chrom_codes int32 (-1 = non-numeric),
    chrom_names bytes (M, 16) NUL-padded, alleles (M, 2) str, max_arity)
    — or None if native is unavailable / the file needs the Python path
    (malformed lines, >15-char chromosome names). The caller parses the
    header (sample IDs) and resolves -1 chromosome codes."""
    try:
        chunks = list(iter_vcf(path, n_samples, chunk_rows=chunk_rows,
                               n_threads=n_threads))
    except (RuntimeError, ValueError):
        return None
    if not chunks:
        return (np.zeros((0, n_samples), np.int8),
                np.zeros(0, np.int64), np.zeros(0, np.int32),
                np.zeros((0, 16), np.uint8),
                np.zeros((0, 2), dtype=str), 1)
    mat = np.vstack([c[0] for c in chunks])
    poss = np.concatenate([c[1] for c in chunks])
    codes = np.concatenate([c[2] for c in chunks])
    names = np.vstack([c[3] for c in chunks])
    alleles = np.concatenate([c[4].reshape(-1, 2) for c in chunks])
    arity = max(c[5] for c in chunks)
    return mat, poss, codes, names, np.asarray(alleles, dtype=str), arity


def pack_2bit(mat: np.ndarray) -> np.ndarray:
    """int8 (M, n) dosages (0..2, -1 missing) -> (M, ceil(n/4)) uint8.
    Falls back to a numpy implementation without the native lib."""
    src = np.asarray(mat)
    if np.issubdtype(src.dtype, np.floating):
        # validate BEFORE the lossy int8 cast: fractional dosages would
        # silently truncate (0.7 -> 0) and NaN casts to an undefined
        # int8 (review finding)
        if src.size and (np.isnan(src).any()
                         or not np.array_equal(src, np.rint(src))):
            raise ValueError(
                "pack_2bit needs integer hard calls (0..2, -1 = "
                "missing); this float matrix has fractional or NaN "
                "dosages — 2-bit packing would silently fabricate hard "
                "calls. Use the HDF5 container for imputed dosages.")
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    if mat.size and (mat.min() < -1 or mat.max() > 2):
        raise ValueError(
            "pack_2bit stores dosages 0..2 (+ -1 = missing); the matrix "
            "contains values outside that range, which 2-bit packing "
            "would silently convert to missing. Use the HDF5 container "
            "for >2 dosages.")
    M, n = mat.shape
    rb = (n + 3) // 4
    lib = get_lib()
    if lib is not None:
        out = np.empty((M, rb), dtype=np.uint8)
        lib.pack_2bit(mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      M, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    codes = np.where((mat >= 0) & (mat <= 2), mat, 3).astype(np.uint8)
    pad = rb * 4 - n
    if pad:
        codes = np.concatenate(
            [codes, np.full((M, pad), 3, dtype=np.uint8)], axis=1)
    codes = codes.reshape(M, rb, 4)
    return (codes[:, :, 0] | (codes[:, :, 1] << 2) | (codes[:, :, 2] << 4)
            | (codes[:, :, 3] << 6)).astype(np.uint8)


def unpack_2bit(packed: np.ndarray, n_samples: int) -> np.ndarray:
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    M = packed.shape[0]
    lib = get_lib()
    if lib is not None:
        out = np.empty((M, n_samples), dtype=np.int8)
        lib.unpack_2bit(
            packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), M,
            n_samples, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
        return out
    codes = np.stack([(packed >> (2 * k)) & 3 for k in range(4)],
                     axis=2).reshape(M, -1)[:, :n_samples]
    return np.where(codes == 3, -1, codes).astype(np.int8)
