"""Native (C++) accelerators, loaded via ctypes.

The reference accelerates host-side graph walking with Cython
(c_utils/c_utils.pyx); here the equivalent strand-walk lives in a small C++
shared library built by hairgs_tpu/native/build.sh. Importing this module
raises ImportError when the library has not been built — callers fall back to
the numpy implementation.
"""

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libhairgs_native.so")
if not os.path.exists(_LIB_PATH):
    raise ImportError(f"native library not built: {_LIB_PATH}")

_lib = ctypes.CDLL(_LIB_PATH)
_lib.walk_strands.restype = ctypes.c_int64
_lib.walk_strands.argtypes = [
    ctypes.POINTER(ctypes.c_int64),  # endpoint_pairs (S*2)
    ctypes.c_int64,  # num_segments
    ctypes.c_int64,  # num_endpoints
    ctypes.POINTER(ctypes.c_int64),  # out strand sequence (S*2)
    ctypes.POINTER(ctypes.c_int64),  # out strand row ids (S)
    ctypes.POINTER(ctypes.c_int64),  # out strand offsets (S+1)
    ctypes.POINTER(ctypes.c_int32),  # out id_to_strand (E)
    ctypes.POINTER(ctypes.c_int32),  # out complementary (E)
]


_lib.merge_candidates.restype = ctypes.c_int64
_lib.merge_candidates.argtypes = [
    ctypes.POINTER(ctypes.c_float),  # points (m,3)
    ctypes.POINTER(ctypes.c_float),  # dirs (m,3)
    ctypes.c_int64,  # m
    ctypes.c_float,  # dist_th
    ctypes.c_float,  # dir_th
    ctypes.c_int,  # bidirectional
    ctypes.POINTER(ctypes.c_int64),  # tips_global
    ctypes.POINTER(ctypes.c_int64),  # comp_global
    ctypes.POINTER(ctypes.c_int64),  # out p1
    ctypes.POINTER(ctypes.c_int64),  # out p2
    ctypes.POINTER(ctypes.c_float),  # out dist
    ctypes.c_int64,  # cap
]
_lib.greedy_complementary_filter.restype = None
_lib.greedy_complementary_filter.argtypes = [
    ctypes.POINTER(ctypes.c_int64),  # pairs (k,2)
    ctypes.c_int64,  # k
    ctypes.POINTER(ctypes.c_int64),  # comp_map (e,)
    ctypes.c_int64,  # e
    ctypes.POINTER(ctypes.c_uint8),  # mask out (k,)
]


def merge_candidates(points, dirs, dist_th, dir_th, bidirectional,
                     tips_global, comp_global):
    """Grid-hash candidate search; returns (p1, p2, dist) arrays in the same
    enumeration order as the reference's cKDTree ball query."""
    points = np.ascontiguousarray(points, dtype=np.float32)
    dirs = np.ascontiguousarray(dirs, dtype=np.float32)
    tips = np.ascontiguousarray(tips_global, dtype=np.int64)
    comp = np.ascontiguousarray(comp_global, dtype=np.int64)
    m = points.shape[0]
    cap = max(1024, m * 16)
    while True:
        p1 = np.empty(cap, np.int64)
        p2 = np.empty(cap, np.int64)
        dist = np.empty(cap, np.float32)
        n = _lib.merge_candidates(
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m, ctypes.c_float(dist_th), ctypes.c_float(dir_th),
            int(bidirectional),
            tips.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            p1.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            p2.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cap,
        )
        if n >= 0:
            return p1[:n], p2[:n], dist[:n]
        cap *= 4


def greedy_complementary_filter(pairs, comp_map):
    pairs = np.ascontiguousarray(pairs, dtype=np.int64)
    comp = np.ascontiguousarray(comp_map, dtype=np.int64)
    mask = np.empty(pairs.shape[0], np.uint8)
    _lib.greedy_complementary_filter(
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        pairs.shape[0],
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        comp.shape[0],
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.astype(bool)


def walk_strands(endpoint_pairs: np.ndarray, num_endpoints: int):
    """C++-accelerated strand walk; same contract as
    hairgs_tpu.topo.strands._walk_strands_np."""
    pairs = np.ascontiguousarray(endpoint_pairs, dtype=np.int64)
    ns = pairs.shape[0]
    seq = np.empty((ns, 2), dtype=np.int64)
    rows = np.empty(ns, dtype=np.int64)
    offsets = np.empty(ns + 1, dtype=np.int64)
    id_to_strand = np.full(num_endpoints, -1, dtype=np.int32)
    complementary = np.full(num_endpoints, -1, dtype=np.int32)
    num_strands = _lib.walk_strands(
        pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ns,
        num_endpoints,
        seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        id_to_strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        complementary.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if num_strands < 0:
        raise RuntimeError("walk_strands failed (malformed graph?)")
    strands, strand_rows = [], []
    for s in range(num_strands):
        a, b = offsets[s], offsets[s + 1]
        strands.append(seq[a:b].copy())
        strand_rows.append(rows[a:b].copy())
    return strands, strand_rows, id_to_strand, complementary
