"""ctypes binding to the native C++ runtime (native/libmm2tpu.so).

Build with `make -C native`. All entry points fall back gracefully to the
Python/NumPy references when the shared library is absent.
"""
from __future__ import annotations

import ctypes
import pathlib
from typing import Optional, Tuple

import numpy as np

_SO = pathlib.Path(__file__).resolve().parent.parent.parent / "native" / "libmm2tpu.so"
_lib: Optional[ctypes.CDLL] = None
_checked = False

_i8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib or None
    _checked = True
    if not _SO.exists():
        _lib = None
        return None
    lib = ctypes.CDLL(str(_SO))
    lib.mm2_chain_exact.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
        ctypes.c_int32, _u64p, _u64p, _i32p, _i32p, _i32p]
    lib.mm2_chain_exact.restype = None
    lib.mm2_v_carry.argtypes = [ctypes.c_int64, _i32p, _i32p, _i32p]
    lib.mm2_v_carry.restype = None
    lib.mm2_sketch.argtypes = [
        _i8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_uint32, ctypes.c_int32, _u64p, _u64p, ctypes.c_int64]
    lib.mm2_sketch.restype = ctypes.c_int64
    _u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    _i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    _s8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    if hasattr(lib, "mm2_update_stats"):
        for fn in (lib.mm2_update_stats, lib.mm2_zdrop_scan):
            fn.argtypes = [_u32p, ctypes.c_int64, _i8p, _i8p, _s8p,
                           ctypes.c_int32, ctypes.c_int32, _i64p]
            fn.restype = None
    if hasattr(lib, "mm2_ksw_exts2"):
        lib.mm2_ksw_exts2.argtypes = [
            ctypes.c_int32, _i8p, ctypes.c_int32, _i8p, _s8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, _i64p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.POINTER(ctypes.c_int32)]
        lib.mm2_ksw_exts2.restype = ctypes.c_int
    if hasattr(lib, "mm2_ksw_extd2"):
        lib.mm2_ksw_extd2.argtypes = [
            ctypes.c_int32, _i8p, ctypes.c_int32, _i8p,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.POINTER(ctypes.c_int32)]
        lib.mm2_ksw_extd2.restype = ctypes.c_int
        lib.mm2_free.argtypes = [ctypes.c_void_p]
        lib.mm2_free.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def chain_scores_exact(a: np.ndarray, max_dist_x: int, max_dist_y: int,
                       bw: int, max_skip: int, max_iter: int,
                       gap_scale: float, is_cdna: bool, n_segs: int
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native exact chaining DP; same contract as chain_ref.chain_scores_exact."""
    lib = _load()
    n = len(a)
    f = np.zeros(n, np.int32)
    p = np.full(n, -1, np.int32)
    v = np.zeros(n, np.int32)
    if n:
        ax = np.ascontiguousarray(a[:, 0])
        ay = np.ascontiguousarray(a[:, 1])
        lib.mm2_chain_exact(n, max_dist_x, max_dist_y, bw, max_skip,
                            max_iter, gap_scale, int(is_cdna), n_segs,
                            ax, ay, f, p, v)
    return f, p.astype(np.int64), v


def v_carry(f: np.ndarray, p: np.ndarray) -> np.ndarray:
    lib = _load()
    n = len(f)
    v = np.zeros(n, np.int32)
    if n:
        lib.mm2_v_carry(n, np.ascontiguousarray(f, np.int32),
                        np.ascontiguousarray(p, np.int32), v)
    return v


def has_ksw() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "mm2_ksw_extd2")


def ksw_extd2(qlen: int, query: np.ndarray, tlen: int, target: np.ndarray,
              mat: np.ndarray, q: int, e: int, q2: int, e2: int, w: int,
              zdrop: int, end_bonus: int, flag: int):
    """Native extd2 extension DP; same contract (and bit-identical
    results) as ops/ksw2_ref.ksw_extd2. Releases the GIL."""
    from ..ops.ksw2_ref import ExtzResult

    lib = _load()
    ez_out = np.zeros(10, np.int64)
    cig_ptr = ctypes.POINTER(ctypes.c_uint32)()
    n_cig = ctypes.c_int32(0)
    rc = lib.mm2_ksw_extd2(
        qlen, np.ascontiguousarray(query, np.uint8),
        tlen, np.ascontiguousarray(target, np.uint8),
        np.ascontiguousarray(np.asarray(mat).reshape(-1), np.int8),
        q, e, q2, e2, w, zdrop, end_bonus, flag,
        ez_out, ctypes.byref(cig_ptr), ctypes.byref(n_cig))
    if rc != 0:
        raise MemoryError("mm2_ksw_extd2 allocation failed")
    ez = ExtzResult()
    (ez.max, zd, ez.max_q, ez.max_t, ez.mqe, ez.mqe_t, ez.mte,
     ez.mte_q, ez.score, re_) = ez_out.tolist()
    ez.zdropped = bool(zd)
    ez.reach_end = bool(re_)
    if n_cig.value:
        ez.cigar = np.ctypeslib.as_array(cig_ptr,
                                         shape=(n_cig.value,)).tolist()
        lib.mm2_free(cig_ptr)
    return ez


def has_cigar_walks() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "mm2_update_stats")


def update_stats(cigar: np.ndarray, qseq: np.ndarray, tseq: np.ndarray,
                 mat: np.ndarray, q: int, e: int) -> np.ndarray:
    """Native mm_update_extra stats walk (align.c:240-286); returns
    int64 [blen, mlen, n_ambi, dp_max, qoff, toff]."""
    lib = _load()
    out = np.zeros(6, np.int64)
    lib.mm2_update_stats(
        np.ascontiguousarray(cigar, np.uint32), len(cigar),
        np.ascontiguousarray(qseq, np.uint8),
        np.ascontiguousarray(tseq, np.uint8),
        np.ascontiguousarray(np.asarray(mat).reshape(-1), np.int8),
        q, e, out)
    return out


def zdrop_scan(cigar: np.ndarray, qseq: np.ndarray, tseq: np.ndarray,
               mat: np.ndarray, q: int, e: int):
    """Native mm_test_zdrop scan (align.c:52-68); returns
    (max_zdrop, [[i0, i1], [j0, j1]])."""
    lib = _load()
    out = np.zeros(5, np.int64)
    lib.mm2_zdrop_scan(
        np.ascontiguousarray(cigar, np.uint32), len(cigar),
        np.ascontiguousarray(qseq, np.uint8),
        np.ascontiguousarray(tseq, np.uint8),
        np.ascontiguousarray(np.asarray(mat).reshape(-1), np.int8),
        q, e, out)
    return int(out[0]), [[int(out[1]), int(out[2])],
                         [int(out[3]), int(out[4])]]


def has_exts2() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "mm2_ksw_exts2")


def ksw_exts2(qlen: int, query: np.ndarray, tlen: int, target: np.ndarray,
              mat: np.ndarray, q: int, e: int, q2: int, noncan: int,
              zdrop: int, junc_bonus: int, flag: int, junc=None):
    """Native splice extension DP; same contract (and bit-identical
    results) as ops/ksw2_splice_ref.ksw_exts2. Releases the GIL."""
    from ..ops.ksw2_ref import ExtzResult

    lib = _load()
    ez_out = np.zeros(10, np.int64)
    cig_ptr = ctypes.POINTER(ctypes.c_uint32)()
    n_cig = ctypes.c_int32(0)
    if junc is not None:
        junc_arr = np.ascontiguousarray(junc, np.uint8)
        junc_p = junc_arr.ctypes.data_as(ctypes.c_void_p)
    else:
        junc_p = None
    rc = lib.mm2_ksw_exts2(
        qlen, np.ascontiguousarray(query, np.uint8),
        tlen, np.ascontiguousarray(target, np.uint8),
        np.ascontiguousarray(np.asarray(mat).reshape(-1), np.int8),
        q, e, q2, noncan, zdrop, junc_bonus, flag, junc_p,
        ez_out, ctypes.byref(cig_ptr), ctypes.byref(n_cig))
    if rc != 0:
        raise MemoryError("mm2_ksw_exts2 allocation failed")
    ez = ExtzResult()
    (ez.max, zd, ez.max_q, ez.max_t, ez.mqe, ez.mqe_t, ez.mte,
     ez.mte_q, ez.score, re_) = ez_out.tolist()
    ez.zdropped = bool(zd)
    ez.reach_end = bool(re_)
    if n_cig.value:
        ez.cigar = np.ctypeslib.as_array(cig_ptr,
                                         shape=(n_cig.value,)).tolist()
        lib.mm2_free(cig_ptr)
    return ez


def sketch(codes: np.ndarray, w: int, k: int, rid: int,
           is_hpc: bool) -> np.ndarray:
    """Native minimizer sketch over nt4 codes; returns (n,2) uint64."""
    lib = _load()
    codes = np.ascontiguousarray(codes, np.uint8)
    cap = max(len(codes), 64)
    x = np.empty(cap, np.uint64)
    y = np.empty(cap, np.uint64)
    n = lib.mm2_sketch(codes, len(codes), w, k, rid, int(is_hpc), x, y, cap)
    if n < 0:  # capacity miss (pathological w/k); retry with exact size
        cap = -n
        x = np.empty(cap, np.uint64)
        y = np.empty(cap, np.uint64)
        n = lib.mm2_sketch(codes, len(codes), w, k, rid, int(is_hpc), x, y, cap)
    return np.stack([x[:n], y[:n]], axis=1)
