"""kNN overlap resolution (north-rule operator; no reference counterpart).

For every output tile, rank the contributing images by distance from the
image-footprint centroid to the tile center (tie-break: phash-derived then
image_id, fully deterministic) and keep the k nearest. Used to bound how
many inputs a dense (hotspot) tile merges — the candidate set comes from the
same cell-keyed spatial join, so this is a map_groups over the assignment
shuffle, not a second join.

Design note (SURVEY.md §2.4): per-cell candidate sets + brute-force kNN
within the group is the scalable shape — groups are bounded by the join,
and the distance math is vectorized numpy per group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..testgen import phash_for


def knn_overlap_resolution(images_path: str, cfg, k: int = 3):
    """Returns (tile_id, image_id, rank, dist) of the k nearest contributing
    images per tile. ``cfg`` is a MosaicConfig (for layout/blocksize)."""
    from ..geo import apply_geotransform
    from ..pipelines.mosaic import grid_for, plan_assignments

    grid = grid_for(images_path, cfg)
    grid_gt = grid.transform
    assignments = plan_assignments(images_path, cfg, grid=grid)

    def knn_group(group: pa.Table) -> pa.Table:
        tile_id = group["tile_id"][0].as_py()
        top = group["out_top"][0].as_py()
        left = group["out_left"][0].as_py()
        ys = group["out_ysize"][0].as_py()
        xs = group["out_xsize"][0].as_py()
        ids = group["image_id"].to_pylist()
        # tile center and image centroids both in WORLD coordinates; the
        # centroids rode the assignment rows (works for explicit catalogs
        # and layout-derived metadata alike)
        cx, cy = apply_geotransform(grid_gt, left + xs / 2.0, top + ys / 2.0)
        dists = np.hypot(
            group["img_cx"].to_numpy() - cx, group["img_cy"].to_numpy() - cy
        )
        phashes = np.array([phash_for(i) for i in ids], dtype=np.int64)
        order = np.lexsort((np.array(ids), phashes, np.round(dists, 6)))[:k]
        n = len(order)
        return pa.table(
            {
                "tile_id": pa.array([tile_id] * n, pa.int64()),
                "image_id": pa.array([ids[int(j)] for j in order], pa.string()),
                "rank": pa.array(np.arange(1, n + 1), pa.int64()),
                "dist": pa.array(np.round(dists[order], 4), pa.float64()),
            }
        )

    return assignments.groupby("tile_id").map_groups(
        knn_group, batch_format="pyarrow"
    )
