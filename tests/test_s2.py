"""From-scratch S2 cell index: structural invariants + the cell-keyed
spherical joins vs brute force (no external geometry library exists in the
sandbox, so validation is via exact self-inverses and curve/containment
properties that would break under any wrong table or transform)."""

import numpy as np
import pytest

from moaray import s2
from moaray.ops.s2join import latlng_points, s2_cell_census, s2_rect_join

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_face_uv_roundtrip(rng):
    lat = rng.uniform(-89.9, 89.9, 3000)
    lng = rng.uniform(-180, 180, 3000)
    x, y, z = s2.latlng_to_xyz(lat, lng)
    f, u, v = s2.xyz_to_face_uv(x, y, z)
    assert f.min() >= 0 and f.max() <= 5
    x2, y2, z2 = s2.face_uv_to_xyz(f, u, v)
    assert np.min(x * x2 + y * y2 + z * z2) > 1 - 1e-12


def test_st_uv_inverse(rng):
    ss = rng.uniform(0, 1, 5000)
    assert np.abs(s2.uv_to_st(s2.st_to_uv(ss)) - ss).max() < 1e-12
    uu = rng.uniform(-1, 1, 5000)
    assert np.abs(s2.st_to_uv(s2.uv_to_st(uu)) - uu).max() < 1e-12


@pytest.mark.parametrize("level", [1, 4, 11, 19, 30])
def test_face_ij_cell_roundtrip(rng, level):
    n = 1 << level
    face = rng.integers(0, 6, 800)
    i = rng.integers(0, n, 800)
    j = rng.integers(0, n, 800)
    cid = s2.cell_from_face_ij(face, i, j, level)
    assert (s2.cell_level(cid) == level).all()
    f2, i2, j2, l2 = s2.cell_to_face_ij(cid)
    assert (f2 == face).all() and (l2 == level).all()
    assert (i2 == i).all() and (j2 == j).all()


def test_leaf_center_and_parent_containment(rng):
    lat = rng.uniform(-88, 88, 2000)
    lng = rng.uniform(-180, 180, 2000)
    leaf = s2.cell_from_latlng(lat, lng, 30)
    clat, clng = s2.cell_center_latlng(leaf)
    dlng = (clng - lng + 180.0) % 360.0 - 180.0
    assert np.abs(clat - lat).max() < 1e-5
    assert np.abs(dlng).max() < 1e-4  # lng resolution shrinks near poles
    for lv in (2, 9, 16, 24):
        assert (
            s2.cell_parent(leaf, lv) == s2.cell_from_latlng(lat, lng, lv)
        ).all()


@pytest.mark.parametrize("level", [1, 3, 7])
def test_hilbert_curve_continuity(level):
    # consecutive curve positions within a face must be edge-adjacent —
    # breaks if any traversal/orientation table entry is wrong
    npos = min(1 << (2 * level), 4096)
    pos = np.arange(npos, dtype=np.uint64)
    shift = np.uint64(60 - 2 * level + 1)
    lsb = np.uint64(1) << np.uint64(60 - 2 * level)
    for face in range(6):
        cid = (np.uint64(face) << np.uint64(61)) | (pos << shift) | lsb
        _, i, j, _ = s2.cell_to_face_ij(cid)
        step = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert (step == 1).all()


def test_children_contiguous_and_nested(rng):
    for _ in range(50):
        lv = int(rng.integers(0, 29))
        cid = s2.cell_from_latlng(
            rng.uniform(-80, 80), rng.uniform(-180, 180), lv
        )
        kids = s2.cell_children(int(cid))
        assert len(kids) == 4 and sorted(kids) == kids
        for k in kids:
            assert int(s2.cell_level(np.asarray([k], np.uint64))[0]) == lv + 1
            assert s2.cell_parent(np.asarray([k], np.uint64), lv)[0] == cid


def test_cell_token_roundtrip():
    cid = s2.cell_from_latlng(
        np.asarray([12.5]), np.asarray([-70.25]), 12
    )[0]
    tok = s2.cell_token(cid)
    assert tok == tok.rstrip("0") and len(tok) <= 16
    assert int(tok.ljust(16, "0"), 16) == int(cid)


def test_rect_covering_completeness(rng):
    # the ONE property the joins rely on: a covering never misses a cell
    # that contains a point of the rect
    for _ in range(40):
        la0 = rng.uniform(-80, 72)
        lo0 = rng.uniform(-175, 150)
        la1 = la0 + rng.uniform(0.05, 15)
        lo1 = lo0 + rng.uniform(0.05, 24)
        level = int(rng.integers(1, 9))
        cov = set(s2.rect_covering(la0, la1, lo0, lo1, level))
        pl = rng.uniform(la0, la1, 64)
        pg = rng.uniform(lo0, lo1, 64)
        cells = s2.cell_from_latlng(pl, pg, level)
        assert all(int(c) in cov for c in cells)


def test_rect_coverings_matches_singles(rng):
    la0 = rng.uniform(-60, 50, 20)
    la1 = la0 + rng.uniform(0.5, 8, 20)
    lo0 = rng.uniform(-150, 120, 20)
    lo1 = lo0 + rng.uniform(0.5, 12, 20)
    ridx, cells = s2.rect_coverings(la0, la1, lo0, lo1, 6)
    for k in range(20):
        single = set(s2.rect_covering(la0[k], la1[k], lo0[k], lo1[k], 6))
        joint = set(int(c) for c in cells[ridx == k])
        assert joint == single


def _brute_pairs(half_lat, half_lng):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    lng, lat = emb[:, 0] * 400.0, emb[:, 1] * 120.0
    ok = (np.abs(lat[:, None] - lat[None, :]) <= half_lat) & (
        np.abs(lng[:, None] - lng[None, :]) <= half_lng
    )
    np.fill_diagonal(ok, False)
    ai, bi = np.nonzero(ok)
    return sorted(zip(ids[ai].tolist(), ids[bi].tolist()))


@pytest.mark.parametrize("level", [3, 5, 7])
def test_s2_rect_join_vs_brute_force(ray_session, level):
    pts = latlng_points(f"{SF_DIR}/embeddings.parquet")
    out = s2_rect_join(pts, 1.0, 1.5, level=level).sort(
        ["a_id", "b_id"]).take_all()
    got = [(r["a_id"], r["b_id"]) for r in out]
    assert got == _brute_pairs(1.0, 1.5)


def test_s2_cell_census(ray_session):
    pts = latlng_points(f"{SF_DIR}/embeddings.parquet")
    rows = s2_cell_census(pts, level=3).take_all()
    assert sum(r["n_points"] for r in rows) == 500
    toks = [r["cell_token"] for r in rows]
    assert len(set(toks)) == len(toks)
    # census keys must agree with direct vectorized assignment
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["embedding"])
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    cells = s2.cell_from_latlng(emb[:, 1] * 120.0, emb[:, 0] * 400.0, 3)
    assert set(toks) == {s2.cell_token(c) for c in cells}


def _geo_catalog(tmp_path, n=9, size=48, lon0=150.0, lat0=-30.0):
    """Explicit-meta catalog of overlapping images in EPSG:4326 degrees."""
    import os

    import pyarrow.parquet as pq

    from moaray import codecs

    pix = 0.01
    rows = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "gt",
                            "crs", "nullval", "seq")}
    rng = np.random.default_rng(7)
    for k in range(n):
        ramp = np.full((size, size), k + 1, dtype=np.uint16)
        # scatter with overlap around (lon0, lat0)
        x0 = lon0 + float(rng.uniform(0, 0.8))
        y0 = lat0 - float(rng.uniform(0, 0.8))
        rows["image_id"].append(f"img{k:02d}")
        rows["bytes"].append(codecs.encode(ramp, "z16"))
        rows["w"].append(size)
        rows["h"].append(size)
        rows["fmt"].append("z16")
        rows["gt"].append([x0, pix, 0.0, y0, 0.0, -pix])
        rows["crs"].append("EPSG:4326")
        rows["nullval"].append(0.0)
        rows["seq"].append(k)
    import pyarrow as pa

    tbl = pa.table({
        "image_id": pa.array(rows["image_id"], pa.string()),
        "bytes": pa.array(rows["bytes"], pa.binary()),
        "w": pa.array(rows["w"], pa.int32()),
        "h": pa.array(rows["h"], pa.int32()),
        "fmt": pa.array(rows["fmt"], pa.string()),
        "gt": pa.array(rows["gt"], pa.list_(pa.float64(), 6)),
        "crs": pa.array(rows["crs"], pa.string()),
        "nullval": pa.array(rows["nullval"], pa.float64()),
        "seq": pa.array(rows["seq"], pa.int64()),
    })
    path = str(tmp_path / "geocat")
    os.makedirs(path)
    pq.write_table(tbl, os.path.join(path, "p.parquet"))
    return path


def _plan_rows(path, strategy, **cfg_kw):
    from moaray import MosaicConfig
    from moaray.pipelines.mosaic import plan_assignments

    cfg = MosaicConfig(blocksize=32, join_strategy=strategy,
                       do_pyramids=False, do_stats=False, **cfg_kw)
    rows = plan_assignments(path, cfg).take_all()
    key = lambda r: (r["tile_id"], r["image_id"])
    return sorted(
        ({k: r[k] for k in ("tile_id", "image_id", "seq", "out_top",
                            "out_left", "out_xsize", "out_ysize", "in_top",
                            "in_left", "in_xsize", "in_ysize")}
         for r in rows),
        key=key,
    )


def test_assign_cell_join_s2_matches_direct(ray_session, tmp_path):
    path = _geo_catalog(tmp_path)
    direct = _plan_rows(path, "direct")
    s2_rows = _plan_rows(path, "cell_join_s2")
    assert len(direct) > 20
    assert s2_rows == direct
    # explicit level override agrees too (finer cells than auto)
    s2_fine = _plan_rows(path, "cell_join_s2", s2_level=12)
    assert s2_fine == direct


@pytest.mark.parametrize("lon0,lat0", [
    (-90.0, 10.0),    # face 4: cell ids have the top bit set -> negative int64
    (-60.0, -85.0),   # face 5 (south polar cap), also negative int64 ids
])
def test_assign_cell_join_s2_negative_faces(ray_session, tmp_path, lon0,
                                            lat0):
    """Faces 4/5 produce S2 ids with the top bit set; the joined int64
    cell_id must compare equal to the uint64 ref cell (signed reinterpret)
    or the refine dedup silently drops every pair (round-4 advice)."""
    path = _geo_catalog(tmp_path, lon0=lon0, lat0=lat0)
    direct = _plan_rows(path, "direct")
    s2_rows = _plan_rows(path, "cell_join_s2")
    assert len(direct) > 20
    assert s2_rows == direct


def test_assign_cell_join_s2_rejects_projected_grids(ray_session):
    from moaray import Layout, MosaicConfig
    from moaray.pipelines.mosaic import plan_assignments
    from moaray.testgen import images_path as _ipath

    layout = Layout("grid3x3", 9, 32)
    path = _ipath(layout)
    cfg = MosaicConfig(layout=layout, blocksize=32,
                       join_strategy="cell_join_s2",
                       do_pyramids=False, do_stats=False)
    with pytest.raises(ValueError, match="geographic grid"):
        plan_assignments(path, cfg).take_all()


def test_analytic_coverer_targeted_regions(rng):
    """Face boundaries, poles, equator crossings, wide rects — the places
    the per-face (u,v) box math can go wrong."""
    cases = [
        (80, 90, -180, 180, 4),      # north-pole cap
        (-90, -80, -180, 180, 3),    # south-pole cap
        (-5, 5, 40, 50, 6),          # equator crossing
        (40, 50, 40, 50, 6),         # face corner region
        (44, 46, 89, 91, 8),         # face-1/face-2 edge
        (-46, -44, 178, 180, 7),     # antimeridian-adjacent, south
        (-1, 1, -91, -89, 8),        # face-4/face-0 edge on the equator
        (30, 60, -170, -100, 3),     # wide northern band
    ]
    for (a0, a1, o0, o1, level) in cases:
        cov = set(s2.rect_covering(a0, a1, o0, o1, level))
        pl = rng.uniform(a0, a1, 400)
        pg = rng.uniform(o0, o1, 400)
        pl = np.concatenate([pl, [a0, a0, a1, a1]])
        pg = np.concatenate([pg, [o0, o1, o0, o1]])
        cells = s2.cell_from_latlng(pl, pg, level)
        assert all(int(c) in cov for c in cells), (a0, a1, o0, o1, level)


def test_polar_face_not_fanned_by_wide_equatorial_rect(rng):
    """A rect far from the pole with a wide longitude span produces an
    annular-sector bounding box; when the annulus's NEAR edge is beyond
    sqrt(2) it cannot touch the polar face square — without the gate the
    covering blew up with up to 4^level spurious polar cells (round-4
    advice). Completeness must survive the pruning."""
    level = 9
    # lat band [5, 15]N, nearly full longitude span: r_lo = cot(15) ~ 3.7
    cov = s2.rect_covering(5.0, 15.0, -179.0, 179.0, level)
    faces = {int(c) >> 61 & 0x7 for c in np.asarray(cov, dtype=np.uint64)}
    assert 2 not in faces and 5 not in faces
    covs = set(
        int(c) for c in np.asarray(cov, dtype=np.uint64).view(np.int64))
    pl = rng.uniform(5.0, 15.0, 500)
    pg = rng.uniform(-179.0, 179.0, 500)
    cells = s2.cell_from_latlng(pl, pg, level).view(np.int64)
    assert all(int(c) in covs for c in cells)
    # a rect actually reaching toward the pole still covers polar cells
    cov_hi = s2.rect_covering(60.0, 88.0, -179.0, 179.0, 5)
    faces_hi = {int(c) >> 61 & 0x7
                for c in np.asarray(cov_hi, dtype=np.uint64)}
    assert 2 in faces_hi


def test_analytic_coverer_completeness_vs_bfs(rng):
    # both coverers are conservative supersets of the true intersecting
    # set; the analytic one must never miss a point-containing cell the
    # padded BFS reference catches
    for _ in range(50):
        la0 = rng.uniform(-85, 80)
        lo0 = rng.uniform(-180, 160)
        la1 = min(la0 + rng.uniform(0.02, 30), 90.0)
        lo1 = min(lo0 + rng.uniform(0.02, 45), 180.0)
        level = int(rng.integers(1, 13))
        cov = set(s2.rect_covering(la0, la1, lo0, lo1, level))
        pl = rng.uniform(la0, la1, 64)
        pg = rng.uniform(lo0, lo1, 64)
        cells = s2.cell_from_latlng(pl, pg, level)
        assert all(int(c) in cov for c in cells)


def test_s2_knn_join_vs_brute_force(ray_session):
    import pyarrow.parquet as pq

    from moaray.ops.s2join import _haversine_deg, s2_knn_join

    pts = latlng_points(f"{SF_DIR}/embeddings.parquet")
    K, R = 3, 2.0
    out = s2_knn_join(pts, k=K, max_radius_deg=R, level=6).sort(
        ["a_id", "rank"]).take_all()

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    emb = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    lng, lat = emb[:, 0] * 400.0, emb[:, 1] * 120.0
    d = _haversine_deg(lat[:, None], lng[:, None],
                       lat[None, :], lng[None, :])
    want = []
    for a in range(len(ids)):
        cand = sorted(
            (d[a, b], ids[b]) for b in range(len(ids))
            if b != a and d[a, b] <= R
        )
        for rk, (dd, bid) in enumerate(cand[:K], 1):
            want.append((ids[a], bid, rk, round(dd, 9)))
    got = [(r["a_id"], r["b_id"], r["rank"], r["dist_deg"]) for r in out]
    key = lambda r: (r[0], r[2])
    assert sorted(got, key=key) == sorted(want, key=key)


def test_s2_knn_join_polar_cap(ray_session):
    # points around the north pole: the cap->rect bound must go full-lng
    import pyarrow as _pa
    import ray.data as _rd

    from moaray.ops.s2join import _haversine_deg, s2_knn_join

    rng2 = np.random.default_rng(3)
    n = 60
    lat = 89.0 + rng2.uniform(0, 0.9, n)
    lng = rng2.uniform(-180, 180, n)
    ds = _rd.from_arrow(_pa.table({
        "id": _pa.array(np.arange(n, dtype=np.int64)),
        "lat": _pa.array(lat), "lng": _pa.array(lng),
    }))
    out = s2_knn_join(ds, k=2, max_radius_deg=1.5, level=4).sort(
        ["a_id", "rank"]).take_all()
    d = _haversine_deg(lat[:, None], lng[:, None],
                       lat[None, :], lng[None, :])
    want = []
    for a in range(n):
        cand = sorted((d[a, b], b) for b in range(n)
                      if b != a and d[a, b] <= 1.5)
        for rk, (dd, bid) in enumerate(cand[:2], 1):
            want.append((a, bid, rk, round(dd, 9)))
    got = [(r["a_id"], r["b_id"], r["rank"], r["dist_deg"]) for r in out]
    key = lambda r: (r[0], r[2])
    assert sorted(got, key=key) == sorted(want, key=key)


def test_s2_knn_join_antimeridian(ray_session):
    # neighbors straddling +/-180: the cap must cover both sides
    import pyarrow as _pa
    import ray.data as _rd

    from moaray.ops.s2join import _haversine_deg, s2_knn_join

    rng3 = np.random.default_rng(5)
    n = 50
    lat = rng3.uniform(-10, 10, n)
    lng = np.where(rng3.random(n) < 0.5,
                   rng3.uniform(179.0, 180.0, n),
                   rng3.uniform(-180.0, -179.0, n))
    ds = _rd.from_arrow(_pa.table({
        "id": _pa.array(np.arange(n, dtype=np.int64)),
        "lat": _pa.array(lat), "lng": _pa.array(lng),
    }))
    out = s2_knn_join(ds, k=2, max_radius_deg=1.5, level=6).take_all()
    d = _haversine_deg(lat[:, None], lng[:, None],
                       lat[None, :], lng[None, :])
    want = []
    for a in range(n):
        cand = sorted((d[a, b], b) for b in range(n)
                      if b != a and d[a, b] <= 1.5)
        for rk, (dd, bid) in enumerate(cand[:2], 1):
            want.append((a, bid, rk, round(dd, 9)))
    got = [(r["a_id"], r["b_id"], r["rank"], r["dist_deg"]) for r in out]
    key = lambda r: (r[0], r[2])
    assert sorted(got, key=key) == sorted(want, key=key)
    # the cross-seam pairs really exist in the fixture
    east = lng > 0
    cross = ((d <= 1.5) & east[:, None] & ~east[None, :]).sum()
    assert cross > 0
