"""ctypes bindings to the native (C++) FST core.

Loads ``native/libkhg_native.so`` (building it with g++ on first use if
absent) and exposes compose / determinize_star / minimize_encoded /
connect with the same signatures and semantics as the Python
implementations in khg_tpu.fstlib.fst — the Python versions are the
reference; equivalence is pinned by tests.  Used by the training-graph
compiler for production-scale graph building.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from khg_tpu.fstlib.fst import Arc, VectorFst

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libkhg_native.so"
_SRC_PATH = _NATIVE_DIR / "khg_native.cc"

_lib = None
_lib_failed = False


class _FstBuf(ctypes.Structure):
    _fields_ = [
        ("num_states", ctypes.c_int32),
        ("start", ctypes.c_int32),
        ("finals", ctypes.POINTER(ctypes.c_float)),
        ("num_arcs", ctypes.c_int64),
        ("src", ctypes.POINTER(ctypes.c_int32)),
        ("il", ctypes.POINTER(ctypes.c_int32)),
        ("ol", ctypes.POINTER(ctypes.c_int32)),
        ("w", ctypes.POINTER(ctypes.c_float)),
        ("dst", ctypes.POINTER(ctypes.c_int32)),
    ]


class _LatticeBuf(ctypes.Structure):
    _fields_ = [
        ("num_states", ctypes.c_int32),
        ("start", ctypes.c_int32),
        ("num_arcs", ctypes.c_int64),
        ("src", ctypes.POINTER(ctypes.c_int32)),
        ("il", ctypes.POINTER(ctypes.c_int32)),
        ("ol", ctypes.POINTER(ctypes.c_int32)),
        ("gc", ctypes.POINTER(ctypes.c_double)),
        ("ac", ctypes.POINTER(ctypes.c_double)),
        ("dst", ctypes.POINTER(ctypes.c_int32)),
        ("key_t", ctypes.POINTER(ctypes.c_int32)),
        ("key_s", ctypes.POINTER(ctypes.c_int32)),
        ("num_finals", ctypes.c_int32),
        ("final_state", ctypes.POINTER(ctypes.c_int32)),
        ("final_w", ctypes.POINTER(ctypes.c_double)),
        ("partial", ctypes.c_int32),
        ("max_live_links", ctypes.c_int64),
    ]


class _PathBuf(ctypes.Structure):
    _fields_ = [
        ("found", ctypes.c_int32),
        ("n_il", ctypes.c_int32),
        ("n_ol", ctypes.c_int32),
        ("il", ctypes.POINTER(ctypes.c_int32)),
        ("ol", ctypes.POINTER(ctypes.c_int32)),
        ("cost", ctypes.c_double),
    ]


def _build() -> bool:
    if not _SRC_PATH.exists():
        return False
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                str(_SRC_PATH), "-o", str(_SO_PATH),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    stale = (
        _SO_PATH.exists()
        and _SRC_PATH.exists()
        and _SO_PATH.stat().st_mtime < _SRC_PATH.stat().st_mtime
    )
    if (not _SO_PATH.exists() or stale) and not _build():
        _lib_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
    except OSError as e:
        logger.warning("native load failed: %s", e)
        _lib_failed = True
        return None
    lib.khg_compose.argtypes = [
        ctypes.POINTER(_FstBuf), ctypes.POINTER(_FstBuf), ctypes.POINTER(_FstBuf)
    ]
    lib.khg_compose.restype = ctypes.c_int
    lib.khg_determinize_star.argtypes = [
        ctypes.POINTER(_FstBuf), ctypes.c_int, ctypes.POINTER(_FstBuf)
    ]
    lib.khg_determinize_star.restype = ctypes.c_int
    lib.khg_minimize_encoded.argtypes = [
        ctypes.POINTER(_FstBuf), ctypes.POINTER(_FstBuf)
    ]
    lib.khg_minimize_encoded.restype = ctypes.c_int
    lib.khg_connect.argtypes = [ctypes.POINTER(_FstBuf), ctypes.POINTER(_FstBuf)]
    lib.khg_connect.restype = ctypes.c_int
    lib.khg_free_fst.argtypes = [ctypes.POINTER(_FstBuf)]
    lib.khg_free_fst.restype = None
    lib.khg_lattice_decode.argtypes = [
        ctypes.c_int32,                         # num_states
        ctypes.c_int32,                         # start
        ctypes.POINTER(ctypes.c_double),        # finals
        ctypes.POINTER(ctypes.c_int64),         # arc_offsets (CSR)
        ctypes.POINTER(ctypes.c_int32),         # ilabels
        ctypes.POINTER(ctypes.c_int32),         # olabels
        ctypes.POINTER(ctypes.c_double),        # weights
        ctypes.POINTER(ctypes.c_int32),         # dests
        ctypes.POINTER(ctypes.c_float),         # loglikes (T, P)
        ctypes.c_int32,                         # T
        ctypes.c_int32,                         # P
        ctypes.POINTER(ctypes.c_int32),         # id2pdf
        ctypes.c_double,                        # acoustic_scale
        ctypes.c_double,                        # beam
        ctypes.c_int32,                         # max_active
        ctypes.c_int32,                         # min_active
        ctypes.c_double,                        # lattice_beam
        ctypes.c_int32,                         # prune_interval
        ctypes.c_int32,                         # allow_partial
        ctypes.POINTER(_LatticeBuf),
    ]
    lib.khg_lattice_decode.restype = ctypes.c_int
    lib.khg_free_lattice.argtypes = [ctypes.POINTER(_LatticeBuf)]
    lib.khg_free_lattice.restype = None
    lib.khg_shortest_path.argtypes = [
        ctypes.c_int32,                         # num_states
        ctypes.c_int32,                         # start
        ctypes.POINTER(ctypes.c_double),        # finals
        ctypes.c_int64,                         # num_arcs
        ctypes.POINTER(ctypes.c_int32),         # src
        ctypes.POINTER(ctypes.c_int32),         # ilabels
        ctypes.POINTER(ctypes.c_int32),         # olabels
        ctypes.POINTER(ctypes.c_double),        # weights
        ctypes.POINTER(ctypes.c_int32),         # dests
        ctypes.POINTER(_PathBuf),
    ]
    lib.khg_shortest_path.restype = ctypes.c_int
    lib.khg_free_path.argtypes = [ctypes.POINTER(_PathBuf)]
    lib.khg_free_path.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _to_buf(fst: VectorFst, keep):
    """VectorFst -> _FstBuf (numpy arrays kept alive via ``keep``)."""
    n = fst.num_states
    finals = np.array(
        [f if f != float("inf") else np.float32(np.inf) for f in fst.final],
        dtype=np.float32,
    ) if n else np.zeros(0, dtype=np.float32)
    src, il, ol, w, dst = [], [], [], [], []
    for s in range(n):
        for a in fst.arcs[s]:
            src.append(s)
            il.append(a.ilabel)
            ol.append(a.olabel)
            w.append(a.weight)
            dst.append(a.nextstate)
    src = np.asarray(src, dtype=np.int32)
    il = np.asarray(il, dtype=np.int32)
    ol = np.asarray(ol, dtype=np.int32)
    w = np.asarray(w, dtype=np.float32)
    dst = np.asarray(dst, dtype=np.int32)
    keep.extend([finals, src, il, ol, w, dst])
    buf = _FstBuf()
    buf.num_states = n
    buf.start = fst.start
    buf.finals = finals.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    buf.num_arcs = len(src)
    buf.src = src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    buf.il = il.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    buf.ol = ol.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    buf.w = w.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    buf.dst = dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    return buf


def _from_buf(lib, buf: _FstBuf) -> VectorFst:
    fst = VectorFst()
    n = buf.num_states
    for _ in range(n):
        fst.add_state()
    fst.start = buf.start
    if n:
        finals = np.ctypeslib.as_array(buf.finals, shape=(n,))
        for s in range(n):
            f = float(finals[s])
            fst.final[s] = f if np.isfinite(f) else float("inf")
    na = buf.num_arcs
    if na:
        src = np.ctypeslib.as_array(buf.src, shape=(na,))
        il = np.ctypeslib.as_array(buf.il, shape=(na,))
        ol = np.ctypeslib.as_array(buf.ol, shape=(na,))
        w = np.ctypeslib.as_array(buf.w, shape=(na,))
        dst = np.ctypeslib.as_array(buf.dst, shape=(na,))
        for i in range(na):
            fst.add_arc(
                int(src[i]),
                Arc(int(il[i]), int(ol[i]), float(w[i]), int(dst[i])),
            )
    lib.khg_free_fst(ctypes.byref(buf))
    return fst


def compose(a: VectorFst, b: VectorFst) -> VectorFst:
    lib = get_lib()
    keep = []
    ba, bb = _to_buf(a, keep), _to_buf(b, keep)
    out = _FstBuf()
    rc = lib.khg_compose(ctypes.byref(ba), ctypes.byref(bb), ctypes.byref(out))
    assert rc == 0
    return _from_buf(lib, out)


def determinize_star(fst: VectorFst, semiring: str = "tropical") -> VectorFst:
    lib = get_lib()
    keep = []
    buf = _to_buf(fst, keep)
    out = _FstBuf()
    rc = lib.khg_determinize_star(
        ctypes.byref(buf), 1 if semiring == "log" else 0, ctypes.byref(out)
    )
    if rc != 0:
        raise RuntimeError("native determinize_star failed")
    return _from_buf(lib, out)


def minimize_encoded(fst: VectorFst) -> VectorFst:
    lib = get_lib()
    keep = []
    buf = _to_buf(fst, keep)
    out = _FstBuf()
    rc = lib.khg_minimize_encoded(ctypes.byref(buf), ctypes.byref(out))
    assert rc == 0
    return _from_buf(lib, out)


def connect(fst: VectorFst) -> VectorFst:
    lib = get_lib()
    keep = []
    buf = _to_buf(fst, keep)
    out = _FstBuf()
    rc = lib.khg_connect(ctypes.byref(buf), ctypes.byref(out))
    assert rc == 0
    return _from_buf(lib, out)
