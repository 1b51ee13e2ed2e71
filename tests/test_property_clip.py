"""Property-based cross-check: the vectorized clip kernels vs a naive
line-by-line sequential transcription of the reference algorithm
(clip.hpp:102-254). Random geometries + boundary-heavy grids; exact float
equality required (both implementations perform identical IEEE ops)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geojson_vt_cpp_spark.functions import kernels as K


# --- naive sequential reference (straight transcription) --------------------

def naive_clip_line(pts, axis, k1, k2, line_metrics, in_seg_start):
    n = len(pts)
    if n < 2:
        return [], [], []
    slices, starts, ends = [], [], []
    cur, cur_start = [], in_seg_start
    line_len = in_seg_start
    o = 1 - axis

    def cross(a, b, k):
        t = (k - a[axis]) / (b[axis] - a[axis])
        p = [0.0, 0.0, 1.0]
        p[axis] = k
        p[o] = (b[o] - a[o]) * t + a[o]
        return np.array(p), t

    for i in range(n - 1):
        a, b = pts[i], pts[i + 1]
        ak, bk = a[axis], b[axis]
        is_last = i == n - 2
        seg_len = float(np.hypot(b[0] - a[0], b[1] - a[1])) if line_metrics else 0.0
        if ak < k1:
            if bk > k2:
                p1, t1 = cross(a, b, k1)
                cur.append(p1)
                if line_metrics:
                    cur_start = line_len + seg_len * t1
                p2, t2 = cross(a, b, k2)
                cur.append(p2)
                slices.append(cur)
                starts.append(cur_start)
                ends.append(line_len + seg_len * t2 if line_metrics else 0.0)
                cur, cur_start = [], in_seg_start
            elif bk > k1:
                p1, t1 = cross(a, b, k1)
                cur.append(p1)
                if line_metrics:
                    cur_start = line_len + seg_len * t1
                if is_last:
                    cur.append(b.copy())
            elif bk == k1 and not is_last:
                if line_metrics:
                    cur_start = line_len + seg_len
                cur.append(b.copy())
        elif ak > k2:
            if bk < k1:
                p2, t2 = cross(a, b, k2)
                cur.append(p2)
                if line_metrics:
                    cur_start = line_len + seg_len * t2
                p1, t1 = cross(a, b, k1)
                cur.append(p1)
                slices.append(cur)
                starts.append(cur_start)
                ends.append(line_len + seg_len * t1 if line_metrics else 0.0)
                cur, cur_start = [], in_seg_start
            elif bk < k2:
                p2, t2 = cross(a, b, k2)
                cur.append(p2)
                if line_metrics:
                    cur_start = line_len + seg_len * t2
                if is_last:
                    cur.append(b.copy())
            elif bk == k2 and not is_last:
                if line_metrics:
                    cur_start = line_len + seg_len
                cur.append(b.copy())
        else:
            cur.append(a.copy())
            if bk < k1:
                p1, t1 = cross(a, b, k1)
                cur.append(p1)
                slices.append(cur)
                starts.append(cur_start)
                ends.append(line_len + seg_len * t1 if line_metrics else 0.0)
                cur, cur_start = [], in_seg_start
            elif bk > k2:
                p2, t2 = cross(a, b, k2)
                cur.append(p2)
                slices.append(cur)
                starts.append(cur_start)
                ends.append(line_len + seg_len * t2 if line_metrics else 0.0)
                cur, cur_start = [], in_seg_start
            elif is_last:
                cur.append(b.copy())
        if line_metrics:
            line_len += seg_len
    if cur:
        slices.append(cur)
        starts.append(cur_start)
        ends.append(line_len if line_metrics else 0.0)
    return [np.vstack(s) for s in slices], starts, ends


def naive_clip_ring(pts, axis, k1, k2):
    n = len(pts)
    if n < 2:
        return np.empty((0, 3))
    out = []
    o = 1 - axis

    def cross(a, b, k):
        t = (k - a[axis]) / (b[axis] - a[axis])
        p = [0.0, 0.0, 1.0]
        p[axis] = k
        p[o] = (b[o] - a[o]) * t + a[o]
        return np.array(p)

    for i in range(n - 1):
        a, b = pts[i], pts[i + 1]
        ak, bk = a[axis], b[axis]
        if ak < k1:
            if bk > k1:
                out.append(cross(a, b, k1))
                if bk > k2:
                    out.append(cross(a, b, k2))
                elif i == n - 2:
                    out.append(b.copy())
        elif ak > k2:
            if bk < k2:
                out.append(cross(a, b, k2))
                if bk < k1:
                    out.append(cross(a, b, k1))
                elif i == n - 2:
                    out.append(b.copy())
        else:
            out.append(a.copy())
            if bk < k1:
                out.append(cross(a, b, k1))
            elif bk > k2:
                out.append(cross(a, b, k2))
    if not out:
        return np.empty((0, 3))
    ring = np.vstack(out)
    if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
        ring = np.vstack([ring, ring[0]])
    return ring


# --- strategies: mix grid-aligned coords (boundary hits) with random --------

coord = st.one_of(
    st.integers(min_value=0, max_value=10).map(float),  # exact boundary hits
    st.floats(min_value=-2.0, max_value=12.0, allow_nan=False, width=32),
)
points_list = st.lists(st.tuples(coord, coord), min_size=2, max_size=30)


@given(points_list, st.sampled_from([0, 1]), st.booleans())
@settings(max_examples=300, deadline=None)
def test_clip_line_matches_naive(coords, axis, line_metrics):
    pts = np.zeros((len(coords), 3))
    pts[:, :2] = coords
    k1, k2 = 3.0, 7.0
    got_s, got_start, got_end = K._clip_line_part(
        pts, axis, k1, k2, line_metrics, 0.0
    )
    want_s, want_start, want_end = naive_clip_line(
        pts, axis, k1, k2, line_metrics, 0.0
    )
    assert len(got_s) == len(want_s)
    for g, w in zip(got_s, want_s):
        np.testing.assert_array_equal(g, w)
    np.testing.assert_array_equal(got_start, want_start)
    np.testing.assert_array_equal(got_end, want_end)


@given(points_list, st.sampled_from([0, 1]))
@settings(max_examples=300, deadline=None)
def test_clip_ring_matches_naive(coords, axis):
    coords = coords + [coords[0]]  # close the ring
    pts = np.zeros((len(coords), 3))
    pts[:, :2] = coords
    got = K._clip_ring_part(pts, axis, 3.0, 7.0)
    want = naive_clip_ring(pts, axis, 3.0, 7.0)
    np.testing.assert_array_equal(got, want)
