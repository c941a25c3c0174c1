"""Global geographic workflow on the S2 cell index, end to end.

The north-star shape: a lat/lng catalog of image footprints is
"S2-encoded into a tile grid", a cell-keyed spatial join assigns every
image to output tiles, and the corpus's point geometry is censused and
hulled per cell — all from-scratch moaray.s2 (no geometry libraries).

Run: python examples/geographic_s2_pipeline.py
"""

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False)

from moaray import MosaicConfig  # noqa: E402
from moaray.ops.s2join import (  # noqa: E402
    latlng_points,
    s2_cell_census,
    s2_rect_join,
)
from moaray.ops.vector import coverage_hulls  # noqa: E402
from moaray.pipelines.mosaic import plan_assignments  # noqa: E402
from moaray.testgen import geo_images_path  # noqa: E402

# 1) S2-cell-keyed spatial join: EPSG:4326 footprints -> output tiles.
#    Identical assignments to the direct nested-loop plan; the cell join
#    is the shape that scales when neither side fits one node.
cat = geo_images_path(n=24)
cfg = MosaicConfig(blocksize=32, join_strategy="cell_join_s2",
                   do_pyramids=False, do_stats=False)
assigns = plan_assignments(cat, cfg)
n_assign = assigns.count()
n_tiles = len(set(r["tile_id"] for r in
                  assigns.select_columns(["tile_id"]).take_all()))
print(f"S2 cell join: {n_assign} (image, tile) assignments over "
      f"{n_tiles} tiles")

# 2) Point-set operations on the globe: census + rect self-join + hulls
#    over the embeddings' 2D projection mapped to lat/lng.
pts = latlng_points("/root/testdata/sf0.001/embeddings.parquet")
census = s2_cell_census(pts, level=3).take_all()
print(f"census: {len(census)} level-3 cells, "
      f"{sum(r['n_points'] for r in census)} points")

pairs = s2_rect_join(pts, half_lat=1.0, half_lng=1.5, level=5).count()
print(f"rect self-join (±1° lat, ±1.5° lng): {pairs} directed pairs")

hulls = coverage_hulls(pts, level=3).take_all()
biggest = max(hulls, key=lambda r: r["hull_area"])
print(f"coverage hulls: {len(hulls)} cells; largest footprint "
      f"{biggest['hull_area']:.3f} deg^2 in cell {biggest['cell_token']}")

ray.shutdown()
