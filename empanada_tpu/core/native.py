"""ctypes loader for the C++ sparse core (libetpu_core.so).

Every wrapper returns None when the shared library is unavailable so the
numpy fallbacks in the calling modules take over. The library is built
lazily (once per process tree) from empanada_tpu/core/_native via make.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "_native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libetpu_core.so")

_lib = None
_tried = False
_lock = threading.Lock()


def _build():
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, "-s"],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("EMPANADA_TPU_NO_NATIVE"):
            return None
        src = os.path.join(_NATIVE_DIR, "core.cpp")
        stale = (not os.path.exists(_LIB_PATH)
                 or (os.path.exists(src)
                     and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
        if stale:
            if not os.path.exists(src) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        p64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        p32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.etpu_coverage_ranges.restype = i64
        lib.etpu_coverage_ranges.argtypes = [p64, i64, i64, p64, i64]

        lib.etpu_ranges_intersection.restype = i64
        lib.etpu_ranges_intersection.argtypes = [p64, i64, p64, i64]

        lib.etpu_runs_ccl.restype = i64
        lib.etpu_runs_ccl.argtypes = [p64, p64, p64, i64, i64, i32, p32]

        try:
            lib.etpu_runs_ccl3d.restype = i64
            lib.etpu_runs_ccl3d.argtypes = [p64, p64, p64, i64, i64, i64,
                                            i64, i32, p32]
        except AttributeError:
            pass  # stale .so without the 3D symbol; callers fall back

        lib.etpu_fill_runs_i32.restype = None
        lib.etpu_fill_runs_i32.argtypes = [p32, i64, p64, p64, i64, i32]

        lib.etpu_fill_runs_i64.restype = None
        lib.etpu_fill_runs_i64.argtypes = [p64, i64, p64, p64, i64, i64]

        lib.etpu_encode_runs_i32.restype = i64
        lib.etpu_encode_runs_i32.argtypes = [p32, i64, i64, p64, p64, p64]

        try:
            lib.etpu_pair_intersections.restype = None
            lib.etpu_pair_intersections.argtypes = [p64, p64, p64, p64,
                                                    p64, i64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_rle_union.restype = i64
            lib.etpu_rle_union.argtypes = [p64, i64, p64, i64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_kway_merge_ranges.restype = i64
            lib.etpu_kway_merge_ranges.argtypes = [p64, p64, i64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_kway_vote.restype = i64
            lib.etpu_kway_vote.argtypes = [p64, p64, i64, i64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_kway_union_sr.restype = i64
            lib.etpu_kway_union_sr.argtypes = [p64, p64, p64, i64,
                                               p64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_kway_union_batch.restype = i64
            lib.etpu_kway_union_batch.argtypes = [p64, p64, p64, p64,
                                                  i64, p64, p64, p64]
        except AttributeError:
            pass  # stale .so; callers fall back

        try:
            lib.etpu_box_overlap_pairs.restype = i64
            lib.etpu_box_overlap_pairs.argtypes = [p64, i64, p64, i64,
                                                   i64, p64, p64, i64]
        except AttributeError:
            pass  # stale .so; callers fall back

        _lib = lib
        return _lib


def _c64(a):
    return np.ascontiguousarray(a, dtype=np.int64)


def coverage_ranges(ranges: np.ndarray, thr: int):
    lib = get_lib()
    if lib is None:
        return None
    ranges = _c64(ranges)
    n = len(ranges)
    cap = 2 * n + 2
    out = np.empty((cap, 2), dtype=np.int64)
    count = lib.etpu_coverage_ranges(ranges, n, thr, out, cap)
    if count > cap:  # shouldn't happen (output ranges <= input ranges)
        out = np.empty((count, 2), dtype=np.int64)
        count = lib.etpu_coverage_ranges(ranges, n, thr, out, count)
    out = out[:count]
    # canonicalize: the sweep emits touching ranges separately when an
    # end event shares a coordinate with a start event; the numpy
    # fallback merges them — keep both paths byte-identical
    if count > 1:
        touch = out[1:, 0] == out[:-1, 1]
        if touch.any():
            keep = np.concatenate([[True], ~touch])
            group = np.cumsum(keep) - 1
            merged = out[keep].copy()
            np.maximum.at(merged[:, 1], group, out[:, 1])
            return merged
    return out.copy()


def ranges_intersection(ranges_a: np.ndarray, ranges_b: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    a = _c64(ranges_a)
    b = _c64(ranges_b)
    return int(lib.etpu_ranges_intersection(a, len(a), b, len(b)))


def pair_intersections(ranges_a_cat, offs_a, ranges_b_cat, offs_b, pairs):
    """Batched intersection sizes for (ia, ib) pairs of instances whose
    per-instance disjoint sorted ranges are concatenated in
    ``ranges_x_cat`` ((total, 2) int64) with ``offs_x`` ((n+1,) range
    offsets). Returns (n_pairs,) int64 or None without the library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_pair_intersections"):
        return None
    ranges_a_cat = _c64(ranges_a_cat)
    ranges_b_cat = _c64(ranges_b_cat)
    offs_a = _c64(offs_a)
    offs_b = _c64(offs_b)
    pairs = _c64(pairs)
    out = np.empty(len(pairs), dtype=np.int64)
    lib.etpu_pair_intersections(ranges_a_cat, offs_a, ranges_b_cat, offs_b,
                                pairs, len(pairs), out)
    return out


def kway_merge_ranges(cat, offs):
    """Merge k individually start-sorted range lists (concatenated in
    ``cat`` (n, 2) with ``offs`` (k+1,)) into one start-sorted (n, 2)
    list — identical output to a stable argsort of the concatenation.
    Returns None without the library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_kway_merge_ranges"):
        return None
    cat = _c64(cat)
    offs = _c64(offs)
    out = np.empty_like(cat)
    n = lib.etpu_kway_merge_ranges(cat, offs, len(offs) - 1, out)
    assert n == len(cat), (n, len(cat))
    return out


def kway_vote(cat, offs, thr):
    """Maximal ranges covered by >= thr of the k individually canonical
    (start-sorted, disjoint) range lists concatenated in ``cat`` (n, 2)
    with ``offs`` (k+1,) — identical output to the concat-sort +
    coverage sweep, in one O(n log k) heap pass with no sort.
    Returns (m, 2) int64 or None without the library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_kway_vote"):
        return None
    cat = _c64(cat)
    offs = _c64(offs)
    out = np.empty_like(cat)
    n = lib.etpu_kway_vote(cat, offs, len(offs) - 1, thr, out)
    return out[:n].copy()


def kway_union_sr(starts_cat, runs_cat, offs):
    """Union of k individually canonical (start-sorted, disjoint) RLEs
    given DIRECTLY as concatenated starts/runs with ``offs`` (k+1 list
    offsets) — identical output to join_ranges over the packed ranges,
    without the (n, 2) packing, generic sort, or coverage sweep.
    Returns (starts, runs) int64 or None without the library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_kway_union_sr"):
        return None
    starts_cat = np.ascontiguousarray(starts_cat, dtype=np.int64)
    runs_cat = np.ascontiguousarray(runs_cat, dtype=np.int64)
    offs = _c64(offs)
    out_s = np.empty(len(starts_cat), dtype=np.int64)
    out_r = np.empty(len(runs_cat), dtype=np.int64)
    n = lib.etpu_kway_union_sr(starts_cat, runs_cat, offs, len(offs) - 1,
                               out_s, out_r)
    return out_s[:n].copy(), out_r[:n].copy()


def kway_union_batch(starts_cat, runs_cat, offs, group_offs):
    """Independent k-way unions of g groups of canonical RLE lists in
    ONE native crossing. ``offs`` (m+1) delimits the m input lists in
    the concatenated starts/runs; ``group_offs`` (g+1) partitions the
    lists into groups. Returns (out_starts, out_runs, out_offs) with
    out_offs (g+1) delimiting each group's union, or None without the
    library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_kway_union_batch"):
        return None
    starts_cat = np.ascontiguousarray(starts_cat, dtype=np.int64)
    runs_cat = np.ascontiguousarray(runs_cat, dtype=np.int64)
    offs = _c64(offs)
    group_offs = _c64(group_offs)
    g = len(group_offs) - 1
    out_s = np.empty(len(starts_cat), dtype=np.int64)
    out_r = np.empty(len(runs_cat), dtype=np.int64)
    out_offs = np.empty(g + 1, dtype=np.int64)
    n = lib.etpu_kway_union_batch(starts_cat, runs_cat, offs, group_offs,
                                  g, out_s, out_r, out_offs)
    return out_s[:n].copy(), out_r[:n].copy(), out_offs


def rle_union(ranges_a, ranges_b):
    """Union of two CANONICAL (sorted, disjoint) (n, 2) range lists,
    coalescing overlap and touch — identical output to
    join_ranges([ranges_a, ranges_b]). Returns (m, 2) int64 or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_rle_union"):
        return None
    a = _c64(ranges_a)
    b = _c64(ranges_b)
    out = np.empty((len(a) + len(b), 2), dtype=np.int64)
    n = lib.etpu_rle_union(a, len(a), b, len(b), out)
    return out[:n].copy()


def box_overlap_pairs(boxes_a, boxes_b=None):
    """All (ia, ib) index pairs of half-open N-d boxes with positive
    intersection, plus the intersection volumes. boxes: (n, 2*ndim)
    int64. Self mode (boxes_b=None) includes (i, i) and both orders,
    like the dense screen. Returns (pairs (k, 2), inter (k,)) or None
    without the library."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_box_overlap_pairs"):
        return None
    # int64-only: _c64 would TRUNCATE float box coordinates, silently
    # dropping thin overlaps — float boxes take the exact numpy path
    if not (np.issubdtype(np.asarray(boxes_a).dtype, np.integer)
            and (boxes_b is None
                 or np.issubdtype(np.asarray(boxes_b).dtype, np.integer))):
        return None
    a = _c64(boxes_a)
    b = a if boxes_b is None else _c64(boxes_b)
    ndim = a.shape[1] // 2
    cap = max(64, 16 * max(len(a), len(b)))
    while True:
        pairs = np.empty((cap, 2), dtype=np.int64)
        inter = np.empty(cap, dtype=np.int64)
        n = lib.etpu_box_overlap_pairs(a, len(a), b, len(b), ndim,
                                       pairs, inter, cap)
        if n <= cap:
            return pairs[:n].copy(), inter[:n].copy()
        cap = n


def runs_ccl(starts, ends, values, width: int, connectivity: int = 8):
    """Label row-split runs; returns (labels int32 per-run, n_components)."""
    lib = get_lib()
    if lib is None:
        return None
    starts = _c64(starts)
    ends = _c64(ends)
    values = _c64(values)
    labels = np.zeros(len(starts), dtype=np.int32)
    n = lib.etpu_runs_ccl(starts, ends, values, len(starts), width,
                          connectivity, labels)
    return labels, int(n)


def runs_ccl3d(starts, ends, values, d, h, w, connectivity=26):
    """3D run CCL; returns (labels int32 per-run, n_components) or None."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "etpu_runs_ccl3d"):
        return None
    starts = _c64(starts)
    ends = _c64(ends)
    values = _c64(values)
    labels = np.zeros(len(starts), dtype=np.int32)
    n = lib.etpu_runs_ccl3d(starts, ends, values, len(starts), d, h, w,
                            connectivity, labels)
    return labels, int(n)


def fill_runs(buf: np.ndarray, starts, runs, value: int):
    """In-place fill of a raveled contiguous int32/int64 buffer."""
    lib = get_lib()
    if lib is None:
        return None
    starts = _c64(starts)
    runs = _c64(runs)
    if buf.dtype == np.int32:
        lib.etpu_fill_runs_i32(buf, buf.size, starts, runs, len(starts),
                               int(value))
    elif buf.dtype == np.int64:
        lib.etpu_fill_runs_i64(buf, buf.size, starts, runs, len(starts),
                               int(value))
    else:
        return None
    return True


def encode_runs(img: np.ndarray, width: int):
    """Row-split constant-value runs of a raveled int32 image."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.int32).ravel()
    cap = img.size
    starts = np.empty(cap, dtype=np.int64)
    ends = np.empty(cap, dtype=np.int64)
    values = np.empty(cap, dtype=np.int64)
    n = lib.etpu_encode_runs_i32(img, img.size, width, starts, ends, values)
    return starts[:n].copy(), ends[:n].copy(), values[:n].copy()
