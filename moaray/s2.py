"""From-scratch S2-style spherical cell index.

The north-star calls for footprints "H3/S2-encoded into a tile grid"; the
planar quadkey cells in ``moaray.geo`` cover projected mosaics, and this
module adds the spherical path for global lat/lng catalogs: the public S2
cell decomposition (six cube faces, a quadratic area-equalizing (u,v)->(s,t)
reprojection, and a Hilbert space-filling curve per face) implemented from
the published algorithm description — no external geometry libraries.

A 64-bit cell id is ``face(3 bits) | hilbert_position(2*level bits) |
1-marker`` with the marker bit making ids self-describing about their level
(same layout as the public S2 design, so ids sort in Hilbert order and a
cell's children are a contiguous id range — the property the cell-keyed
joins rely on for locality-preserving shuffles).

Everything is numpy-vectorized over point arrays (30 fixed-iteration loops
of O(n) vector ops — no per-point Python) so it can run inside
``map_batches`` at corpus scale.

No reference counterpart (moamosaic joins axis-aligned rects in one
projected CRS only; reference mosaic.py:501-535).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_POS_BITS = 2 * MAX_LEVEL  # 60 Hilbert-position bits
_SWAP = 1
_INVERT = 2

# Hilbert sub-cell traversal tables (public S2 values).
# _POS_TO_IJ[orientation][pos] -> ij (i*2 + j); _POS_TO_ORIENT[pos] is the
# orientation delta XORed in when descending into sub-cell `pos`.
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _o in range(4):
    for _p in range(4):
        _IJ_TO_POS[_o, _POS_TO_IJ[_o, _p]] = _p
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


# ---------------------------------------------------------------------------
# lat/lng <-> face/(u,v) <-> (s,t) <-> (i,j)


def latlng_to_xyz(lat_deg, lng_deg):
    """Unit sphere vectors from degrees (vectorized)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


def xyz_to_latlng(x, y, z):
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def xyz_to_face_uv(x, y, z):
    """Largest-|component| cube face + gnomonic (u, v) on that face."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az), 0, np.where(ay >= az, 1, 2)
    ).astype(np.int64)
    major = np.choose(face, (x, y, z))
    face = np.where(major < 0, face + 3, face)
    # u/v numerators per face (canonical S2 orientation)
    u_num = np.choose(face, (y, -x, -x, z, z, -y))
    v_num = np.choose(face, (z, z, -y, y, -x, -x))
    return face, u_num / major, v_num / major


def face_uv_to_xyz(face, u, v):
    face = np.asarray(face, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    x = np.choose(face, (one, -u, -u, -one, v, v))
    y = np.choose(face, (u, one, -v, -v, -one, u))
    z = np.choose(face, (v, v, one, -u, -u, -one))
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def uv_to_st(u):
    """Quadratic area-equalizing projection (public S2 formula)."""
    u = np.asarray(u, dtype=np.float64)
    return np.where(
        u >= 0.0,
        0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
        1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)),
    )


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (4.0 * s * s - 1.0) / 3.0,
        (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0,
    )


def st_to_ij(s, level=MAX_LEVEL):
    n = np.int64(1) << level
    ij = np.floor(np.asarray(s, dtype=np.float64) * float(n)).astype(np.int64)
    return np.clip(ij, 0, n - 1)


# ---------------------------------------------------------------------------
# (face, i, j) <-> cell id (Hilbert curve)


def cell_from_face_ij(face, i, j, level=MAX_LEVEL):
    """Cell id at `level` for level-`level` grid coords (vectorized)."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & _SWAP
    pos = np.zeros_like(face, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij]
        pos = (pos << np.uint64(2)) | p.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[p]
    shift = np.uint64(_POS_BITS - 2 * level + 1)
    lsb = np.uint64(1) << np.uint64(_POS_BITS - 2 * level)
    return (
        (face.astype(np.uint64) << np.uint64(_POS_BITS + 1))
        | (pos << shift)
        | lsb
    )


def cell_level(cid):
    """Level from the trailing-marker bit (vectorized)."""
    cid = np.asarray(cid, dtype=np.uint64)
    # lowest set bit index via de-Bruijn-free float trick is fragile for
    # 64-bit; isolate lsb and count with a 30-step-free log2 on the exact
    # power of two (float64 holds 2^0..2^60 exactly)
    lsb = cid & (~cid + np.uint64(1))
    expo = np.log2(lsb.astype(np.float64)).astype(np.int64)
    return (MAX_LEVEL - (expo >> 1)).astype(np.int64)


def cell_parent(cid, level):
    """Ancestor at `level` (vectorized; level must be <= cell_level)."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cid & ~(lsb + (lsb - np.uint64(1)))) | lsb


def cell_children(cid):
    """The 4 children ids of a (scalar) non-leaf cell."""
    cid = np.uint64(cid)
    lsb = cid & (~cid + np.uint64(1))
    child_lsb = lsb >> np.uint64(2)
    base = cid - lsb + child_lsb
    return [base + np.uint64(2 * k) * child_lsb for k in range(4)]


def cell_to_face_ij(cid):
    """(face, i, j, level) with (i, j) the cell's min corner in level-L
    grid units (vectorized inverse of cell_from_face_ij)."""
    cid = np.asarray(cid, dtype=np.uint64)
    level = cell_level(cid)
    face = (cid >> np.uint64(_POS_BITS + 1)).astype(np.int64)
    orient = face & _SWAP
    i = np.zeros_like(face)
    j = np.zeros_like(face)
    lmax = int(level.max()) if level.size else 0
    for k in range(lmax):
        active = level > k
        shift = np.uint64(_POS_BITS - 1) - np.uint64(2) * np.uint64(k)
        p = ((cid >> shift) & np.uint64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient, p]
        i2 = (i << 1) | (ij >> 1)
        j2 = (j << 1) | (ij & 1)
        o2 = orient ^ _POS_TO_ORIENT[p]
        i = np.where(active, i2, i)
        j = np.where(active, j2, j)
        orient = np.where(active, o2, orient)
    return face, i, j, level


def cell_from_latlng(lat_deg, lng_deg, level=MAX_LEVEL):
    """Containing cell id at `level` for lat/lng degrees (vectorized)."""
    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), level)
    j = st_to_ij(uv_to_st(v), level)
    return cell_from_face_ij(face, i, j, level)


def cell_center_latlng(cid):
    face, i, j, level = cell_to_face_ij(cid)
    n = (np.int64(1) << level).astype(np.float64)
    s = (i.astype(np.float64) + 0.5) / n
    t = (j.astype(np.float64) + 0.5) / n
    x, y, z = face_uv_to_xyz(face, st_to_uv(s), st_to_uv(t))
    return xyz_to_latlng(x, y, z)


def cell_token(cid) -> str:
    """Hex token (trailing zeros stripped), the standard compact id form."""
    return format(int(cid), "016x").rstrip("0") or "0"


# ---------------------------------------------------------------------------
# lat/lng rect covering


def _bounds_for_cells(face, i, j, level: int):
    """Vectorized conservative lat/lng bounds for level-`level` cells given
    by (face, i, j) arrays: (lat_lo, lat_hi, lng_lo, lng_hi, full_lng).

    Corners + edge midpoints, padded by half the cell's corner-to-corner
    angular diagonal — generous on purpose: coverings are a join-key
    distribution strategy and only completeness (never missing an
    intersecting cell) matters; the exact predicate re-tests every pair.
    """
    n = float(1 << level)
    s0 = i.astype(np.float64) / n
    s1 = (i + 1).astype(np.float64) / n
    t0 = j.astype(np.float64) / n
    t1 = (j + 1).astype(np.float64) / n
    sm, tm = (s0 + s1) * 0.5, (t0 + t1) * 0.5
    ss = np.stack([s0, s1, s0, s1, sm, sm, s0, s1], axis=1)
    tt = np.stack([t0, t0, t1, t1, t0, t1, tm, tm], axis=1)
    f8 = np.repeat(face, 8)
    x, y, z = face_uv_to_xyz(f8, st_to_uv(ss.ravel()), st_to_uv(tt.ravel()))
    lat, lng = xyz_to_latlng(x, y, z)
    m = len(face)
    lat = lat.reshape(m, 8)
    lng = lng.reshape(m, 8)
    x = x.reshape(m, 8)
    y = y.reshape(m, 8)
    z = z.reshape(m, 8)
    # angular diagonal pad (covers edge curvature between samples)
    cosd = np.clip(
        x[:, 0] * x[:, 3] + y[:, 0] * y[:, 3] + z[:, 0] * z[:, 3], -1.0, 1.0
    )
    pad = 0.5 * np.degrees(np.arccos(cosd)) + 1e-9
    lat_lo = lat.min(axis=1) - pad
    lat_hi = lat.max(axis=1) + pad
    lng_lo = lng.min(axis=1) - pad
    lng_hi = lng.max(axis=1) + pad
    # pole inside: the (u,v) origin of the +z / -z faces
    u0 = np.minimum(st_to_uv(s0), st_to_uv(s1))
    u1 = np.maximum(st_to_uv(s0), st_to_uv(s1))
    v0 = np.minimum(st_to_uv(t0), st_to_uv(t1))
    v1 = np.maximum(st_to_uv(t0), st_to_uv(t1))
    has_pole = (
        ((face == 2) | (face == 5))
        & (u0 <= 0.0) & (u1 >= 0.0) & (v0 <= 0.0) & (v1 >= 0.0)
    )
    lat_hi = np.where(has_pole & (face == 2), 90.0, lat_hi)
    lat_lo = np.where(has_pole & (face == 5), -90.0, lat_lo)
    full_lng = has_pole | (level == 0) | (lng_hi - lng_lo > 180.0)
    return lat_lo, lat_hi, lng_lo, lng_hi, full_lng


def rect_coverings_bfs(lat_lo, lat_hi, lng_lo, lng_hi, level,
                       max_total_cells=2_000_000):
    """Reference coverer: level-synchronous BFS in (face, i, j) space over
    the joint frontier of all rects, pruning on conservative padded
    bounds. Correct for any rect; superseded as the default by the
    analytic `rect_coverings` (kept for cross-checks and as the fallback
    its property tests compare against)."""
    lat_lo = np.asarray(lat_lo, dtype=np.float64)
    lat_hi = np.asarray(lat_hi, dtype=np.float64)
    lng_lo = np.asarray(lng_lo, dtype=np.float64)
    lng_hi = np.asarray(lng_hi, dtype=np.float64)
    nrect = len(lat_lo)
    ridx = np.repeat(np.arange(nrect, dtype=np.int64), 6)
    face = np.tile(np.arange(6, dtype=np.int64), nrect)
    i = np.zeros(nrect * 6, dtype=np.int64)
    j = np.zeros(nrect * 6, dtype=np.int64)
    for cur in range(level + 1):
        b_lat_lo, b_lat_hi, b_lng_lo, b_lng_hi, full = _bounds_for_cells(
            face, i, j, cur
        )
        keep = (b_lat_hi >= lat_lo[ridx]) & (b_lat_lo <= lat_hi[ridx]) & (
            full | ((b_lng_hi >= lng_lo[ridx]) & (b_lng_lo <= lng_hi[ridx]))
        )
        ridx, face, i, j = ridx[keep], face[keep], i[keep], j[keep]
        if cur == level:
            break
        if len(ridx) * 4 > max_total_cells:
            raise ValueError(
                f"joint covering frontier exceeds {max_total_cells} cells; "
                "use a coarser level"
            )
        rep = np.repeat
        di = np.tile(np.array([0, 0, 1, 1], dtype=np.int64), len(ridx))
        dj = np.tile(np.array([0, 1, 0, 1], dtype=np.int64), len(ridx))
        ridx = rep(ridx, 4)
        face = rep(face, 4)
        i = (rep(i, 4) << 1) | di
        j = (rep(j, 4) << 1) | dj
    return ridx, cell_from_face_ij(face, i, j, level)


_D_EPS = 1e-9  # degrees clipped off the lune edge before tan()
_ST_PAD = 1e-9  # st-units padding swallowing last-ulp projection noise


def _tand(x):
    return np.tan(np.radians(x))


def _cosd(x):
    return np.cos(np.radians(x))


def _equatorial_boxes(lat_lo, lat_hi, lng_lo, lng_hi):
    """Per-equatorial-face conservative (u, v) boxes of each rect's image.

    With d = lng - face_center (in the face's lune): faces 0/1 have
    (u, v) = (tan d, tan(lat) * sec d); faces 3/4 have the axes swapped
    and the latitude coordinate negated: (u, v) = (-tan(lat) * sec d,
    tan d) — a consequence of the canonical S2 face orientations.
    Returns list of (face, ridx, u0, u1, v0, v1)."""
    a0 = np.clip(lat_lo, -90.0 + _D_EPS, 90.0 - _D_EPS)
    a1 = np.clip(lat_hi, -90.0 + _D_EPS, 90.0 - _D_EPS)
    t0, t1 = _tand(a0), _tand(a1)
    out = []
    for face, c in ((0, 0.0), (1, 90.0), (3, 180.0), (4, -90.0)):
        for k in (-360.0, 0.0, 360.0):
            dl = lng_lo - c + k
            dh = lng_hi - c + k
            dl_c = np.maximum(dl, -90.0 + _D_EPS)
            dh_c = np.minimum(dh, 90.0 - _D_EPS)
            ok = dl_c <= dh_c
            if not ok.any():
                continue
            g0 = _tand(dl_c)  # tan d range
            g1 = _tand(dh_c)
            # sec(d) extremes: nearest-to-0 and farthest-from-0 endpoints
            d_near = np.where((dl_c <= 0.0) & (dh_c >= 0.0), 0.0,
                              np.minimum(np.abs(dl_c), np.abs(dh_c)))
            d_far = np.maximum(np.abs(dl_c), np.abs(dh_c))
            cn, cf = _cosd(d_near), _cosd(d_far)
            ws = np.stack([t0 / cn, t0 / cf, t1 / cn, t1 / cf])
            w0 = ws.min(axis=0)  # tan(lat)*sec(d) range
            w1 = ws.max(axis=0)
            if face in (0, 1):
                u0, u1, v0, v1 = g0, g1, w0, w1
            else:  # faces 3/4: u = -tan(lat)*sec(d), v = tan d
                u0, u1, v0, v1 = -w1, -w0, g0, g1
            # clip to the face square; empty when fully outside
            ok &= (u0 <= 1.0) & (u1 >= -1.0) & (v0 <= 1.0) & (v1 >= -1.0)
            if not ok.any():
                continue
            idx = np.nonzero(ok)[0]
            out.append((face, idx,
                        np.clip(u0[idx], -1.0, 1.0),
                        np.clip(u1[idx], -1.0, 1.0),
                        np.clip(v0[idx], -1.0, 1.0),
                        np.clip(v1[idx], -1.0, 1.0)))
    return out


def _polar_boxes(lat_lo, lat_hi, lng_lo, lng_hi):
    """Conservative (u, v) boxes on the polar faces (2: north, 5: south):
    the rect maps to an annular sector (u,v) = r * dir(theta)."""
    out = []
    for face in (2, 5):
        if face == 2:
            ok = lat_hi > 0.0
            b0 = np.clip(lat_lo, 1e-7, 90.0)
            b1 = np.clip(lat_hi, 1e-7, 90.0)
        else:
            ok = lat_lo < 0.0
            b0 = np.clip(-lat_hi, 1e-7, 90.0)
            b1 = np.clip(-lat_lo, 1e-7, 90.0)
        if not ok.any():
            continue
        # r = cot(colat-free lat band); decreasing in |lat|
        r_hi = _cosd(b0) / np.sin(np.radians(b0))
        r_lo = _cosd(b1) / np.sin(np.radians(b1))
        # the annulus [r_lo, r_hi] cannot touch the face square when even
        # its NEAR edge lies beyond the square's circumscribed circle
        # (radius sqrt(2)) — without this gate a wide-longitude rect far
        # from the pole fans out to up to 4^level spurious polar cells.
        ok &= r_lo <= np.sqrt(2.0)
        if not ok.any():
            continue
        # candidate angles: interval ends + axis crossings inside it
        cand = [lng_lo, lng_hi]
        for ax in (-180.0, -90.0, 0.0, 90.0, 180.0):
            inside = (lng_lo <= ax) & (ax <= lng_hi)
            cand.append(np.where(inside, ax, np.nan))
        th = np.stack(cand)  # (7, n)
        ct, st_ = _cosd(th), np.sin(np.radians(th))
        if face == 2:
            ucomp = [-r_lo * ct, -r_hi * ct]
            vcomp = [-r_lo * st_, -r_hi * st_]
        else:
            ucomp = [r_lo * st_, r_hi * st_]
            vcomp = [r_lo * ct, r_hi * ct]
        with np.errstate(invalid="ignore"):
            u0 = np.nanmin(np.concatenate(ucomp), axis=0)
            u1 = np.nanmax(np.concatenate(ucomp), axis=0)
            v0 = np.nanmin(np.concatenate(vcomp), axis=0)
            v1 = np.nanmax(np.concatenate(vcomp), axis=0)
        ok &= (u0 <= 1.0) & (u1 >= -1.0) & (v0 <= 1.0) & (v1 >= -1.0)
        if not ok.any():
            continue
        idx = np.nonzero(ok)[0]
        out.append((face, idx,
                    np.clip(u0[idx], -1.0, 1.0),
                    np.clip(u1[idx], -1.0, 1.0),
                    np.clip(v0[idx], -1.0, 1.0),
                    np.clip(v1[idx], -1.0, 1.0)))
    return out


def rect_coverings(lat_lo, lat_hi, lng_lo, lng_hi, level,
                   max_total_cells=50_000_000):
    """Coverings of MANY lat/lng rects at once: (rect_index, cell_id)
    arrays where each rect's covering is a conservative superset of the
    level-`level` cells intersecting it.

    Analytic: each rect's image on each cube face is bounded by an exact
    (u, v) box (tan/sec interval arithmetic on the equatorial faces, an
    annular sector on the polar faces), padded by an ulp guard in (s, t)
    and expanded to the inclusive (i, j) cell range — O(faces) vector ops
    per rect, no per-level BFS. `lng_lo > lng_hi` is NOT supported (split
    antimeridian-crossing rects into two calls).
    """
    lat_lo = np.asarray(lat_lo, dtype=np.float64)
    lat_hi = np.asarray(lat_hi, dtype=np.float64)
    lng_lo = np.asarray(lng_lo, dtype=np.float64)
    lng_hi = np.asarray(lng_hi, dtype=np.float64)
    boxes = _equatorial_boxes(lat_lo, lat_hi, lng_lo, lng_hi)
    boxes += _polar_boxes(lat_lo, lat_hi, lng_lo, lng_hi)
    if not boxes:
        return (np.zeros(0, dtype=np.int64),
                np.zeros(0, dtype=np.uint64))
    nmax = np.int64(1) << level
    faces_l, ridx_l, i0_l, i1_l, j0_l, j1_l = [], [], [], [], [], []
    for face, idx, u0, u1, v0, v1 in boxes:
        s0 = np.clip(uv_to_st(u0) - _ST_PAD, 0.0, 1.0)
        s1 = np.clip(uv_to_st(u1) + _ST_PAD, 0.0, 1.0)
        t0 = np.clip(uv_to_st(v0) - _ST_PAD, 0.0, 1.0)
        t1 = np.clip(uv_to_st(v1) + _ST_PAD, 0.0, 1.0)
        faces_l.append(np.full(len(idx), face, dtype=np.int64))
        ridx_l.append(idx.astype(np.int64))
        i0_l.append(st_to_ij(s0, level))
        i1_l.append(st_to_ij(s1, level))
        j0_l.append(st_to_ij(t0, level))
        j1_l.append(st_to_ij(t1, level))
    face_a = np.concatenate(faces_l)
    ridx_a = np.concatenate(ridx_l)
    i0 = np.concatenate(i0_l)
    i1 = np.concatenate(i1_l)
    j0 = np.concatenate(j0_l)
    j1 = np.concatenate(j1_l)
    wi = i1 - i0 + 1
    wj = j1 - j0 + 1
    counts = wi * wj
    total = int(counts.sum())
    if total > max_total_cells:
        raise ValueError(
            f"joint covering needs {total} cells (> {max_total_cells}); "
            "use a coarser level"
        )
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    wj_r = np.repeat(wj, counts)
    i = np.repeat(i0, counts) + local // wj_r
    j = np.repeat(j0, counts) + local % wj_r
    ridx = np.repeat(ridx_a, counts)
    cells = cell_from_face_ij(np.repeat(face_a, counts), i, j, level)
    # dedup (rect, cell): boundary clipping can emit a cell twice for one
    # rect (adjacent lune strips), and the joins rely on set semantics
    pair = np.empty((len(ridx), 2), dtype=np.uint64)
    pair[:, 0] = ridx.astype(np.uint64)
    pair[:, 1] = cells
    uniq = np.unique(pair, axis=0)
    del nmax
    return uniq[:, 0].astype(np.int64), uniq[:, 1]


def rect_covering(lat_lo, lat_hi, lng_lo, lng_hi, level,
                  max_cells=1_000_000):
    """Covering of a single lat/lng rect (see rect_coverings)."""
    _, cells = rect_coverings(
        np.asarray([lat_lo]), np.asarray([lat_hi]),
        np.asarray([lng_lo]), np.asarray([lng_hi]),
        level, max_total_cells=max_cells,
    )
    return [int(c) for c in cells]
