"""Explicit catalog metadata: gt/crs/nullval/seq columns on the images table
replace the synthetic placement layout (the at-scale input shape; analog of
the reference's per-file ImageInfo probe, structures.py:11-34)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from moaray import MosaicConfig, do_mosaic
from moaray.pipelines.mosaic import mosaic_array
from moaray.testgen import Layout, gen_images_table
from moaray.testgen import images_path as images_path_mod

from test_mosaic_parity import oracle_mosaic, run_engine


def _write(tbl, tmp_path, name="imgs"):
    p = tmp_path / name
    p.mkdir()
    pq.write_table(tbl, str(p / "part-0.parquet"))
    return str(p)


def test_explicit_meta_matches_layout_derived(tmp_path):
    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    assert "gt" in tbl.schema.names and "crs" in tbl.schema.names
    path = _write(tbl, tmp_path)

    # layout=None: all metadata from the catalog columns
    res = do_mosaic(path, MosaicConfig(blocksize=64))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert (got == truth).all()


def test_explicit_seq_column_overrides_merge_order(tmp_path):
    """A seq column reverses merge order: last-non-null now favors the
    LOWEST image index (reversed ranks)."""
    layout = Layout("hotspot", 16, 64)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    n = tbl.num_rows
    rev = pa.array([n - 1 - i for i in range(n)], pa.int64())
    tbl = tbl.append_column("seq", rev)
    path = _write(tbl, tmp_path)

    res = do_mosaic(path, MosaicConfig(blocksize=64))
    got = mosaic_array(res.tiles_ds, res.grid)

    # oracle with reversed merge order
    from moaray import oracle
    from moaray.geo import make_output_grid
    from moaray.testgen import metas_for_layout, pixel_array

    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=64)
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    truth = oracle.build_mosaic(grid, list(reversed(metas)), arrays)
    assert (got == truth).all()


def test_explicit_meta_distributed_planning(tmp_path):
    """Force the fully-distributed planning path over the catalog columns."""
    layout = Layout("grid3x3", 9, 64)
    _grid, truth = oracle_mosaic(layout)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    path = _write(tbl, tmp_path)
    res = do_mosaic(path, MosaicConfig(blocksize=64, planning="distributed"))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert (got == truth).all()


def test_plan_assignments_explicit_catalog(tmp_path):
    """The standalone spatial-join operator must read the catalog's gt/crs
    columns (regression: static column pruning dropped them)."""
    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    path = _write(tbl, tmp_path)

    from moaray import plan_assignments

    df = plan_assignments(path, MosaicConfig(blocksize=64)).to_pandas()
    # compare against the layout-derived run
    df2 = plan_assignments(
        images_path_mod(layout), MosaicConfig(layout=layout, blocksize=64)
    ).to_pandas()
    key = ["tile_id", "image_id"]
    assert sorted(map(tuple, df[key].values.tolist())) == sorted(
        map(tuple, df2[key].values.tolist())
    )


def test_distributed_planning_salted_matches_driver_plan(tmp_path):
    """Distributed plan with driver-free salting: only over-threshold tiles
    reach the driver (round-2 verdict #4); pixels must equal the
    driver-planned salted run exactly."""
    layout = Layout("hotspot", 16, 64)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    path = _write(tbl, tmp_path)
    kw = dict(blocksize=64, salt_threshold=4, inputs_per_salt=2)
    res_d = do_mosaic(path, MosaicConfig(planning="distributed", plan_collect_limit=0, **kw))
    got_d = mosaic_array(res_d.tiles_ds, res_d.grid)
    res_v = do_mosaic(path, MosaicConfig(planning="driver", **kw))
    got_v = mosaic_array(res_v.tiles_ds, res_v.grid)
    assert np.array_equal(got_d, got_v)


def test_distributed_planning_sparse_empty_tiles(tmp_path):
    """Distributed plan over a gappy layout: the empty-tile anti-join runs
    as a bucket groupby against the assigned-id DATASET (no driver set, no
    broadcast id array) and must still emit every all-null tile."""
    layout = Layout("sparse_gap", 4, 64)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    path = _write(tbl, tmp_path)
    res_d = do_mosaic(path, MosaicConfig(blocksize=64, planning="distributed", plan_collect_limit=0))
    res_v = do_mosaic(path, MosaicConfig(blocksize=64, planning="driver"))
    assert res_d.tiles_ds.count() == res_d.grid.num_tiles
    assert res_d.tiles_ds.count() == res_v.tiles_ds.count()
    got_d = mosaic_array(res_d.tiles_ds, res_d.grid)
    got_v = mosaic_array(res_v.tiles_ds, res_v.grid)
    assert np.array_equal(got_d, got_v)
    # the gap region is genuinely null
    empt = res_d.tiles_ds.select_columns(["n_inputs"]).take_all()
    assert any(r["n_inputs"] == 0 for r in empt)


def test_layer_type_passthrough(tmp_path):
    """The catalog's LAYER_TYPE band metadata (thematic/athematic, ref
    structures.py:31-34) flows catalog -> grid -> grid.json -> GeoTIFF
    GDAL_METADATA tag (ref mosaic.py:627-633)."""
    import pyarrow as pa

    from moaray.sinks.gtiff import export_gtiff, read_layer_type
    from moaray.state.manifest import load_grid_meta

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("raw16",), explicit_meta=True)
    tbl = tbl.append_column(
        "layer_type", pa.array(["thematic"] * tbl.num_rows, pa.string())
    )
    path = _write(tbl, tmp_path)
    out = str(tmp_path / "out")
    res = do_mosaic(
        path, MosaicConfig(blocksize=64, do_pyramids=False, do_stats=False),
        out_dir=out,
    )
    assert res.grid.layer_type == "thematic"
    grid2, _n, _b = load_grid_meta(out)
    assert grid2.layer_type == "thematic"
    tif = str(tmp_path / "m.tif")
    export_gtiff(res, tif)
    assert read_layer_type(tif) == "thematic"
