"""ctypes bridge to the reference ksw2 kernels compiled as a shared
library (see scripts/make_golden.sh) — the differential-test oracle."""
import ctypes
import pathlib

import numpy as np

SO = pathlib.Path("/tmp/golden/libksw2oracle.so")
_lib = None


class KswExtz(ctypes.Structure):
    _fields_ = [
        ("max_zdropped", ctypes.c_uint32),
        ("max_q", ctypes.c_int), ("max_t", ctypes.c_int),
        ("mqe", ctypes.c_int), ("mqe_t", ctypes.c_int),
        ("mte", ctypes.c_int), ("mte_q", ctypes.c_int),
        ("score", ctypes.c_int),
        ("m_cigar", ctypes.c_int), ("n_cigar", ctypes.c_int),
        ("reach_end", ctypes.c_int),
        ("cigar", ctypes.POINTER(ctypes.c_uint32)),
    ]


def available():
    return SO.exists()


def _load():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(str(SO))
    return _lib


def _unpack(ez):
    return dict(
        max=int(ez.max_zdropped & 0x7FFFFFFF),
        zdropped=bool(ez.max_zdropped >> 31),
        max_q=ez.max_q, max_t=ez.max_t, mqe=ez.mqe, mqe_t=ez.mqe_t,
        mte=ez.mte, mte_q=ez.mte_q, score=ez.score,
        reach_end=bool(ez.reach_end),
        cigar=[ez.cigar[i] for i in range(ez.n_cigar)] if ez.n_cigar else [],
    )


def extd2(q8, t8, mat, q, e, q2, e2, w, zdrop, end_bonus, flag):
    lib = _load()
    ez = KswExtz()
    ctypes.memset(ctypes.byref(ez), 0, ctypes.sizeof(ez))
    mat8 = np.asarray(mat, np.int8)
    lib.ksw_extd2_sse(None, len(q8), q8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      len(t8), t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      ctypes.c_int8(5), mat8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      ctypes.c_int8(q), ctypes.c_int8(e), ctypes.c_int8(q2),
                      ctypes.c_int8(e2), ctypes.c_int(w), ctypes.c_int(zdrop),
                      ctypes.c_int(end_bonus), ctypes.c_int(flag), ctypes.byref(ez))
    return _unpack(ez)


def extz2(q8, t8, mat, q, e, w, zdrop, end_bonus, flag):
    lib = _load()
    ez = KswExtz()
    ctypes.memset(ctypes.byref(ez), 0, ctypes.sizeof(ez))
    mat8 = np.asarray(mat, np.int8)
    lib.ksw_extz2_sse(None, len(q8), q8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      len(t8), t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      ctypes.c_int8(5), mat8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      ctypes.c_int8(q), ctypes.c_int8(e), ctypes.c_int(w),
                      ctypes.c_int(zdrop), ctypes.c_int(end_bonus),
                      ctypes.c_int(flag), ctypes.byref(ez))
    return _unpack(ez)


def exts2(q8, t8, mat, q, e, q2, noncan, zdrop, junc_bonus, flag, junc=None):
    lib = _load()
    ez = KswExtz()
    ctypes.memset(ctypes.byref(ez), 0, ctypes.sizeof(ez))
    mat8 = np.asarray(mat, np.int8)
    jp = (junc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
          if junc is not None else None)
    lib.ksw_exts2_sse(None, len(q8), q8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      len(t8), t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      ctypes.c_int8(5), mat8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      ctypes.c_int8(q), ctypes.c_int8(e), ctypes.c_int8(q2),
                      ctypes.c_int8(noncan), ctypes.c_int(zdrop),
                      ctypes.c_int8(junc_bonus), ctypes.c_int(flag), jp,
                      ctypes.byref(ez))
    return _unpack(ez)


def ll(q8, t8, mat, gapo, gape):
    lib = _load()
    mat8 = np.asarray(mat, np.int8)
    lib.ksw_ll_qinit.restype = ctypes.c_void_p
    qp = lib.ksw_ll_qinit(None, 2, len(q8),
                          q8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          5, mat8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    qe = ctypes.c_int()
    te = ctypes.c_int()
    score = lib.ksw_ll_i16(ctypes.c_void_p(qp), len(t8),
                           t8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           gapo, gape, ctypes.byref(qe), ctypes.byref(te))
    return int(score), qe.value, te.value
