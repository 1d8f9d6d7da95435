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
