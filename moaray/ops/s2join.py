"""S2-cell-keyed spatial joins over lat/lng point sets.

The spherical counterpart of the planar cell joins in ``ops.vector``: points
are keyed by their containing S2 cell at a chosen level (vectorized leaf
assignment, ``moaray.s2``), query rects are expanded to their S2 covering
(per-region, the same shape as a RegionCoverer — coverings are intrinsically
per-region), and the join is ONE groupby shuffle on the cell id. Because a
point lives in exactly one level-L cell and a rect's covering contains every
cell it intersects, each qualifying (rect, point) pair meets in exactly one
group — no pair dedup pass is needed.

Scale notes: cell ids are Hilbert-ordered 64-bit ints, so the groupby's sort
shuffle keeps spatially adjacent cells in the same blocks (locality). The
exact predicate re-tests every candidate pair inside the group, so the
covering only has to be complete, never tight.

No reference counterpart (moamosaic joins projected rects only,
reference mosaic.py:501-535); north-star component ("H3/S2-encoded").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import s2


def latlng_points(embeddings_path: str, lat_scale: float = 120.0,
                  lng_scale: float = 400.0):
    """(id, lat, lng) dataset from the embeddings' 2D projection: the
    first two embedding dims scaled onto the globe (float64 math from
    float32 storage so a DOUBLE-casting SQL oracle runs identical IEEE
    arithmetic — same convention as ops.vector.points_2d)."""
    import ray.data

    def extract(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"].combine_chunks()
        flat = emb.values.to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(batch)
        dim = flat.size // n if n else 1
        pts = flat.reshape(n, dim)
        return pa.table({
            "id": batch["vec_id"].cast(pa.int64()),
            "lng": pa.array(pts[:, 0] * lng_scale, pa.float64()),
            "lat": pa.array(pts[:, 1] * lat_scale, pa.float64()),
        })

    return ray.data.read_parquet(
        embeddings_path, columns=["vec_id", "embedding"]
    ).map_batches(extract, batch_format="pyarrow")


def _home_and_rect_pieces(level: int, half_lat: float, half_lng: float):
    """Stage 1: every point emits one home row (its level-L cell) plus one
    rect row per cell in the S2 covering of its query rect."""

    def pieces(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        lat = batch["lat"].to_numpy()
        lng = batch["lng"].to_numpy()
        home_cells = s2.cell_from_latlng(lat, lng, level).astype(np.int64)
        # joint vectorized covering of every rect in the batch (one
        # level-synchronous BFS — no per-rect Python)
        ridx, cov = s2.rect_coverings(
            lat - half_lat, lat + half_lat,
            np.maximum(lng - half_lng, -180.0),
            np.minimum(lng + half_lng, 180.0),
            level,
        )
        out_cell = np.concatenate([home_cells, cov.astype(np.int64)])
        out_id = np.concatenate([ids, ids[ridx]])
        out_lat = np.concatenate([lat, lat[ridx]])
        out_lng = np.concatenate([lng, lng[ridx]])
        out_home = np.concatenate(
            [np.ones(len(ids), dtype=bool), np.zeros(len(ridx), dtype=bool)]
        )
        return pa.table({
            "cell": pa.array(out_cell, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "lat": pa.array(out_lat, pa.float64()),
            "lng": pa.array(out_lng, pa.float64()),
            "home": pa.array(out_home, pa.bool_()),
        })

    return pieces


def s2_rect_join(pts_ds, half_lat: float, half_lng: float, level: int = 5):
    """Self rect-join: (a_id, b_id) for every pair where point b falls in
    the half_lat x half_lng rect centered on point a (a != b), distributed
    via one S2-cell groupby shuffle."""

    # cells group on a BOUNDED partition key (per-cell map_groups pays one
    # Python call per populated cell); the rect predicate evaluates over
    # ALL cells' rect-side x home-side candidate pairs in one vectorized
    # pair-index expansion
    n_partitions = 512

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["cell"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_cells(group: pa.Table) -> pa.Table:
        from .dedup import _pair_index_expansion

        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        cell = group["cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        ids = group["id"].to_numpy()[order]
        lat = group["lat"].to_numpy()[order]
        lng = group["lng"].to_numpy()[order]
        home = group["home"].to_numpy(zero_copy_only=False)[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(cell))[0] + 1))
        counts = np.diff(np.concatenate((starts, [cell.size])))
        ga, gb = _pair_index_expansion(counts)
        if ga.size == 0:
            return empty
        keep = home[ga] ^ home[gb]  # rect-side x home-side only
        if not keep.any():
            return empty
        ga, gb = ga[keep], gb[keep]
        # orient: a = the rect (query) piece, b = the home point
        flip = home[ga]
        ai = np.where(flip, gb, ga)
        bi = np.where(flip, ga, gb)
        ok = (
            (np.abs(lat[ai] - lat[bi]) <= half_lat)
            & (np.abs(lng[ai] - lng[bi]) <= half_lng)
            & (ids[ai] != ids[bi])
        )
        return pa.table({
            "a_id": pa.array(ids[ai[ok]], pa.int64()),
            "b_id": pa.array(ids[bi[ok]], pa.int64()),
        })

    pieces = pts_ds.map_batches(
        _home_and_rect_pieces(level, half_lat, half_lng),
        batch_format="pyarrow",
    )
    return (
        pieces.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_cells, batch_format="pyarrow")
    )


def s2_cell_census(pts_ds, level: int = 4):
    """Points per S2 cell at `level` (vectorized leaf keying + one
    groupby-count): the cell-density census for a global point corpus,
    with the cell's center lat/lng and hex token for downstream use."""
    import pyarrow.compute as pc

    def keyed(batch: pa.Table) -> pa.Table:
        cells = s2.cell_from_latlng(
            batch["lat"].to_numpy(), batch["lng"].to_numpy(), level
        )
        return pa.table({"cell": pa.array(cells.astype(np.int64), pa.int64())})

    counted = (
        pts_ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("cell")
        .count()
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cids = batch["cell"].to_numpy().astype(np.uint64)
        clat, clng = s2.cell_center_latlng(cids)
        return pa.table({
            "cell_token": pa.array([s2.cell_token(c) for c in cids],
                                   pa.string()),
            "n_points": pc.cast(batch["count()"], pa.int64()),
            "center_lat": pa.array(np.round(clat, 6), pa.float64()),
            "center_lng": pa.array(np.round(clng, 6), pa.float64()),
        })

    return counted.map_batches(finalize, batch_format="pyarrow")


def _haversine_deg(lat_a, lng_a, lat_b, lng_b):
    """Great-circle distance in DEGREES of arc (vectorized)."""
    la, lb = np.radians(lat_a), np.radians(lat_b)
    dlat = lb - la
    dlng = np.radians(lng_b - lng_a)
    h = (np.sin(dlat / 2.0) ** 2
         + np.cos(la) * np.cos(lb) * np.sin(dlng / 2.0) ** 2)
    return np.degrees(2.0 * np.arcsin(np.minimum(np.sqrt(h), 1.0)))


def s2_knn_join(pts_ds, k: int = 3, max_radius_deg: float = 1.0,
                level: int = 5):
    """Spherical kNN self-join: for every point a, its k nearest
    neighbors by GREAT-CIRCLE distance within ``max_radius_deg`` —
    the kNN overlap-resolution shape on the S2 index.

    Two stages: (1) candidate pairs via the rect-join machinery — each
    point's angular cap is bounded by the lat/lng rect
    [lat ± r, lng ± r*sec(lat)] (exact: a cap of angular radius r spans
    at most r in latitude and r/cos(lat_max_abs) in longitude), every
    candidate pair meets in exactly one cell group and is distance-
    filtered by haversine there; (2) one groupby(a_id) takes the local
    top-k (ties broken by b_id). Same output contract as the planar
    knn_join_2d (a_id, b_id, rank, dist_deg)."""

    def pieces_fn(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        lat = batch["lat"].to_numpy()
        lng = batch["lng"].to_numpy()
        home_cells = s2.cell_from_latlng(lat, lng, level).astype(np.int64)
        # cap -> bounding rect: lng halfwidth grows with |lat| (sec);
        # caps touching a pole need the full lng range
        alat = np.minimum(np.abs(lat) + max_radius_deg, 89.999999)
        half_lng = np.minimum(
            max_radius_deg / np.cos(np.radians(alat)), 180.0
        )
        near_pole = np.abs(lat) + max_radius_deg >= 89.999999
        lo_raw = np.where(near_pole, -180.0, lng - half_lng)
        hi_raw = np.where(near_pole, 180.0, lng + half_lng)
        lat_lo = np.maximum(lat - max_radius_deg, -90.0)
        lat_hi = np.minimum(lat + max_radius_deg, 90.0)
        # antimeridian: a cap crossing ±180 covers as TWO rects (the
        # haversine metric wraps; the rect clip must not lose neighbors)
        parts = [(np.arange(len(ids)),
                  np.maximum(lo_raw, -180.0), np.minimum(hi_raw, 180.0))]
        west = np.nonzero(lo_raw < -180.0)[0]
        if len(west):
            parts.append((west, lo_raw[west] + 360.0,
                          np.full(len(west), 180.0)))
        east = np.nonzero(hi_raw > 180.0)[0]
        if len(east):
            parts.append((east, np.full(len(east), -180.0),
                          hi_raw[east] - 360.0))
        ridx_l, cov_l = [], []
        for sub, lo, hi in parts:
            ri, cv = s2.rect_coverings(lat_lo[sub], lat_hi[sub], lo, hi,
                                       level)
            ridx_l.append(sub[ri])
            cov_l.append(cv)
        ridx = np.concatenate(ridx_l)
        cov = np.concatenate(cov_l)
        # re-dedup across the split parts (a cell can appear in both)
        pairk = np.empty((len(ridx), 2), dtype=np.uint64)
        pairk[:, 0] = ridx.astype(np.uint64)
        pairk[:, 1] = cov
        uniqk = np.unique(pairk, axis=0)
        ridx = uniqk[:, 0].astype(np.int64)
        cov = uniqk[:, 1]
        out_cell = np.concatenate([home_cells, cov.astype(np.int64)])
        out_id = np.concatenate([ids, ids[ridx]])
        out_lat = np.concatenate([lat, lat[ridx]])
        out_lng = np.concatenate([lng, lng[ridx]])
        out_home = np.concatenate(
            [np.ones(len(ids), dtype=bool), np.zeros(len(ridx), dtype=bool)]
        )
        return pa.table({
            "cell": pa.array(out_cell, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "lat": pa.array(out_lat, pa.float64()),
            "lng": pa.array(out_lng, pa.float64()),
            "home": pa.array(out_home, pa.bool_()),
        })

    # same bounded-partition discipline as s2_rect_join / knn_join_2d:
    # vectorized pair expansion across cells, then a partitioned per-point
    # top-k (per-cell / per-point map_groups pays one Python call per key)
    n_partitions = 512

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch["cell"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def per_cells(group: pa.Table) -> pa.Table:
        from .dedup import _pair_index_expansion

        empty = pa.table({"a_id": pa.array([], pa.int64()),
                          "b_id": pa.array([], pa.int64()),
                          "dist_deg": pa.array([], pa.float64())})
        if group.num_rows < 2:
            return empty
        cell = group["cell"].to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        ids = group["id"].to_numpy()[order]
        lat = group["lat"].to_numpy()[order]
        lng = group["lng"].to_numpy()[order]
        home = group["home"].to_numpy(zero_copy_only=False)[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(cell))[0] + 1))
        counts = np.diff(np.concatenate((starts, [cell.size])))
        ga, gb = _pair_index_expansion(counts)
        if ga.size == 0:
            return empty
        keep = home[ga] ^ home[gb]  # query-cap piece x home point only
        if not keep.any():
            return empty
        ga, gb = ga[keep], gb[keep]
        flip = home[ga]
        ai = np.where(flip, gb, ga)
        bi = np.where(flip, ga, gb)
        d = _haversine_deg(lat[ai], lng[ai], lat[bi], lng[bi])
        ok = (d <= max_radius_deg) & (ids[ai] != ids[bi])
        return pa.table({
            "a_id": pa.array(ids[ai[ok]], pa.int64()),
            "b_id": pa.array(ids[bi[ok]], pa.int64()),
            "dist_deg": pa.array(d[ok], pa.float64()),
        })

    def add_part_a(batch: pa.Table) -> pa.Table:
        part = batch["a_id"].to_numpy() % np.int64(n_partitions)
        return batch.append_column("part2", pa.array(part, pa.int64()))

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "a_id": pa.array([], pa.int64()),
            "b_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "dist_deg": pa.array([], pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        a = group["a_id"].to_numpy()
        b = group["b_id"].to_numpy()
        d = group["dist_deg"].to_numpy()
        order = np.lexsort((b, d, a))
        a, b, d = a[order], b[order], d[order]
        starts = np.concatenate(([0], np.nonzero(np.diff(a))[0] + 1))
        cnts = np.diff(np.concatenate((starts, [a.size])))
        rank = (
            np.arange(a.size, dtype=np.int64)
            - np.repeat(starts, cnts)
            + 1
        )
        kee = rank <= k
        return pa.table({
            "a_id": pa.array(a[kee], pa.int64()),
            "b_id": pa.array(b[kee], pa.int64()),
            "rank": pa.array(rank[kee], pa.int64()),
            "dist_deg": pa.array(np.round(d[kee], 9), pa.float64()),
        })

    pairs = (
        pts_ds.map_batches(pieces_fn, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_cells, batch_format="pyarrow")
    )
    return (
        pairs.map_batches(add_part_a, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(topk, batch_format="pyarrow")
    )
