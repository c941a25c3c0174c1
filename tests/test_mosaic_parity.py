"""End-to-end parity: engine output vs the reference-semantics numpy oracle.

Mirrors the reference's single golden test (tests.py:63-177) across the
FIXTURES.md layouts: exact pixel equality for lossless fmts, PSNR>=40dB for
the lossy path, join-assignment parity vs the nested-loop oracle, stats and
pyramid parity, caption passthrough.
"""

import numpy as np
import pytest

from moaray import MosaicConfig, do_mosaic, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import (
    grid_for,
    mosaic_array,
    overview_array,
    plan_assignments,
)
from moaray.testgen import (
    Layout,
    gen_images_table,
    images_path,
    metas_for_layout,
    pixel_array,
)


def oracle_mosaic(layout, fmts=("raw16",), blocksize=64, decode_lossy=False):
    metas = metas_for_layout(layout, fmts)
    grid = make_output_grid(metas, blocksize=blocksize)
    arrays = {}
    from moaray import codecs

    for i, m in enumerate(metas):
        arr = pixel_array(i, layout)
        if decode_lossy:
            arr = codecs.decode(codecs.encode(arr, m.fmt), m.fmt)
        arrays[m.image_id] = arr
    return grid, oracle.build_mosaic(grid, metas, arrays)


def run_engine(layout, fmts=("raw16",), blocksize=64, **cfg_kw):
    path = images_path(layout, fmts)
    cfg = MosaicConfig(layout=layout, blocksize=blocksize, **cfg_kw)
    res = do_mosaic(path, cfg)
    return res, mosaic_array(res.tiles_ds, res.grid)


def test_pair_overlap_exact():
    """The reference's own golden scenario (tests.py:69-106) at 64px."""
    layout = Layout("pair_overlap", 2, 64)
    grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout)
    assert res.grid.ncols == grid.ncols and res.grid.nrows == grid.nrows
    assert (got == truth).all()
    # overlap columns are 62,63 (= image2 cols 0,1). Image2's null col 0 must
    # NOT overwrite image1 (tests.py:92-94) -> col 62 keeps image1's 62;
    # image2's non-null col 1 DOES overwrite -> col 63 becomes 1.
    assert got[0, 62] == 62 and got[0, 63] == 1


def test_grid3x3_exact_and_stats_pyramids():
    layout = Layout("grid3x3", 9, 64)
    grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout, min_overview_size=16)
    assert (got == truth).all()

    # stats parity (tests.py:117-132 semantics)
    tmin, tmax, tmean, tstd, tcount = oracle.stats(truth, grid.nullval)
    s = res.stats
    assert s["min"] == tmin and s["max"] == tmax
    assert s["mean"] == pytest.approx(tmean)
    assert s["stddev"] == pytest.approx(tstd)
    assert s["count"] == tcount

    # pyramid parity (tests.py:134-177 semantics)
    levels = res.grid.overview_levels(16)
    assert levels, "expected at least one overview level"
    for lvl in levels:
        true_ov = oracle.overview(truth, lvl)
        got_ov = overview_array(res.pyramids_ds, res.grid, lvl)
        r = min(true_ov.shape[0], got_ov.shape[0])
        c = min(true_ov.shape[1], got_ov.shape[1])
        assert abs(true_ov.shape[0] - got_ov.shape[0]) <= lvl
        assert abs(true_ov.shape[1] - got_ov.shape[1]) <= lvl
        assert (true_ov[:r, :c] == got_ov[:r, :c]).all(), f"lvl={lvl}"


def test_hotspot_merge_order_exact():
    """16 fully-overlapping images: last-non-null must follow seq order."""
    layout = Layout("hotspot", 16, 64)
    grid, truth = oracle_mosaic(layout)
    _res, got = run_engine(layout)
    assert (got == truth).all()
    # last image in seq order (idx 15 is a ring image; hot stack is 0..7) —
    # sanity: the hot-extent pixels carry the highest-seq hot image's offset.
    assert got.shape == truth.shape


def test_hotspot_salted_two_level_merge_exact():
    """Force the salted (tile_id, salt) two-level merge on a skewed layout;
    result must be bit-identical to the unsalted/oracle semantics."""
    layout = Layout("hotspot", 16, 64)
    grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout, salt_threshold=4, inputs_per_salt=2)
    assert (got == truth).all()
    # stats must also match through the salted path
    tmin, tmax, tmean, tstd, tcount = oracle.stats(truth, grid.nullval)
    assert res.stats["min"] == tmin and res.stats["max"] == tmax
    assert res.stats["mean"] == pytest.approx(tmean)
    assert res.stats["count"] == tcount


def test_sparse_gap_empty_tiles():
    layout = Layout("sparse_gap", 4, 64)
    grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout)
    assert (got == truth).all()
    # the gap region must be all-null and must have produced empty tile rows
    tiles = res.tiles_ds.select_columns(["tile_id", "n_inputs"]).take_all()
    assert any(t["n_inputs"] == 0 for t in tiles)
    assert len(tiles) == res.grid.num_tiles


def test_lossless_z16_and_lossy_q12():
    layout = Layout("grid3x3", 9, 64)
    # z16 is lossless: exact parity
    _grid, truth = oracle_mosaic(layout, fmts=("z16",))
    _res, got = run_engine(layout, fmts=("z16",))
    assert (got == truth).all()
    # q12 is lossy: engine output must equal oracle built from decoded-lossy
    # arrays exactly, and be within PSNR>=40dB of the pristine mosaic.
    _grid, truth_lossy = oracle_mosaic(layout, fmts=("q12",), decode_lossy=True)
    _res2, got2 = run_engine(layout, fmts=("q12",))
    assert (got2 == truth_lossy).all()
    _grid, truth_clean = oracle_mosaic(layout, fmts=("raw16",))
    from moaray import codecs

    assert codecs.psnr(truth_clean, got2) >= 40.0


def test_mixed_blocksize_sliver_interaction():
    """Non-divisible blocksize so the 25% sliver rule fires mid-grid."""
    layout = Layout("grid3x3", 9, 64)  # grid is 186x186 px
    for bs in (48, 100, 128):
        grid, truth = oracle_mosaic(layout, blocksize=bs)
        _res, got = run_engine(layout, blocksize=bs)
        assert (got == truth).all(), f"blocksize={bs}"


def assignments_set(ds):
    rows = ds.take_all()
    return {
        (
            r["tile_id"], r["image_id"], r["in_top"], r["in_left"],
            r["in_xsize"], r["in_ysize"],
        )
        for r in rows
    }


@pytest.mark.parametrize("strategy", ["direct", "cell_join"])
def test_join_assignment_parity(strategy):
    """Engine spatial join == nested-loop reference semantics, both ways."""
    layout = Layout("grid3x3", 9, 64)
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=64)
    truth = {
        (tid, image_id, w[0], w[1], w[2], w[3])
        for tid, _b, image_id, w in oracle.find_inputs_per_block(grid, metas)
    }
    path = images_path(layout)
    cfg = MosaicConfig(layout=layout, blocksize=64, join_strategy=strategy)
    got = assignments_set(plan_assignments(path, cfg))
    assert got == truth
    # row-count parity too (no dupes from multi-cell candidates)
    assert len(got) == len(truth)


def test_caption_passthrough_byte_equal():
    layout = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(layout)
    caps = tbl["caption"].to_pylist()
    assert caps == [
        "synthetic tile img00000000 seed42",
        "synthetic tile img00000001 seed42",
    ]


def test_feather_merge_shape_and_nulls():
    """Extended feather kernel: same null geography, blended overlaps."""
    layout = Layout("pair_overlap", 2, 64)
    grid, truth = oracle_mosaic(layout)
    _res, got = run_engine(layout, merge="feather")
    assert got.shape == truth.shape
    # identical null mask; non-overlap regions identical to last-merge
    assert ((got == 0) == (truth == 0)).all()
    assert (got[:, :62] == truth[:, :62]).all()
    assert (got[:, 64:] == truth[:, 64:]).all()


def test_feather_salted_matches_unsalted():
    """Salted (num/den partial) feather == single-level feather. The blend
    is a weighted sum, so partial-sum regrouping must not change results
    beyond float addition reordering (tolerance 1 after rint)."""
    import numpy as np

    layout = Layout("hotspot", 16, 64)
    _res, plain = run_engine(layout, merge="feather", salt_threshold=None)
    _res2, salted = run_engine(
        layout, merge="feather", salt_threshold=4, inputs_per_salt=2
    )
    assert salted.shape == plain.shape
    diff = np.abs(salted.astype(np.int64) - plain.astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001


def test_nullval_override():
    """cfg.nullval overrides the first input's null value (ref
    mosaic.py:184-185): with nullval=65535 the ramp's zero column is DATA
    and later images overwrite earlier ones everywhere they overlap."""
    import numpy as np

    from moaray.testgen import metas_for_layout, pixel_array

    layout = Layout("pair_overlap", 2, 64)
    metas = metas_for_layout(layout)
    for m in metas:
        m.nullval = 65535.0
    grid = make_output_grid(metas, blocksize=64, nullval=65535.0)
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    truth = oracle.build_mosaic(grid, metas, arrays)
    res, got = run_engine(layout, nullval=65535.0)
    assert res.grid.nullval == 65535.0
    assert (got == truth).all()
    # the overlap columns now take image2's values INCLUDING its zero col
    assert got[0, 62] == 0 and got[0, 63] == 1


def test_reference_golden_scale_5000px():
    """The reference's own golden scenario at its LITERAL scale
    (tests.py:69-106: two 5000x5000 uint16 rasters, 2-px overlap, 10 m
    pixels, nullval 0): exact pixel, stats, and pyramid parity."""
    layout = Layout("pair_overlap", 2, 5000)
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=1024)
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    truth = oracle.build_mosaic(grid, metas, arrays)

    res, got = run_engine(layout, blocksize=1024)
    assert got.shape == (5000, 9998)
    assert (got == truth).all()

    tmin, tmax, tmean, tstd, tcount = oracle.stats(truth, 0.0)
    s = res.stats
    assert s["min"] == tmin and s["max"] == tmax and s["count"] == tcount
    assert abs(s["mean"] - tmean) < 1e-6 and abs(s["stddev"] - tstd) < 1e-6

    levels = res.grid.overview_levels(1024)
    assert levels == [4, 8]  # ref K4 semantics at this size
    for lvl in levels:
        ov = overview_array(res.pyramids_ds, res.grid, lvl)
        tov = oracle.overview(truth, lvl)
        r = min(ov.shape[0], tov.shape[0])
        c = min(ov.shape[1], tov.shape[1])
        assert (ov[:r, :c] == tov[:r, :c]).all(), f"overview {lvl}"


def test_aggregatefn_stats_path():
    """The custom-AggregateFn stats path (decodes tile payloads) agrees with
    the manifest-partial path and the oracle."""
    from moaray.stages.stats import compute_stats

    layout = Layout("grid3x3", 9, 64)
    grid, truth = oracle_mosaic(layout)
    res, _got = run_engine(layout)
    s = compute_stats(res.tiles_ds, res.grid.nullval, res.grid.dtype)
    tmin, tmax, tmean, tstd, tcount = oracle.stats(truth, grid.nullval)
    assert s["min"] == tmin and s["max"] == tmax and s["count"] == tcount
    assert abs(s["mean"] - tmean) < 1e-9
    assert s == res.stats or abs(s["stddev"] - res.stats["stddev"]) < 1e-9


def test_actor_pool_decode_path():
    """decode_concurrency=(min,max) switches the decode stage to an actor
    pool (the GdalObjCache-analog state path); results identical."""
    layout = Layout("grid3x3", 4, 64)
    _grid, truth = oracle_mosaic(layout)
    _res, got = run_engine(layout, decode_concurrency=(1, 2))
    assert (got == truth).all()


def test_frame_sample_compressed_gate_contract():
    """mvid frame sampling AND mp4 container parsing run for real
    (tests/test_ops.py, tests/test_mp4.py); containers the engine cannot
    parse remain declared NotImplementedError gates (no pyav/ffmpeg)."""
    import pyarrow as pa
    import pytest as _pytest

    from moaray.ops.multimodal import FrameSample

    with _pytest.raises(ValueError, match="corrupt box|no moov"):
        FrameSample()(
            pa.table({"video_id": ["v0"], "bytes": [b"x" * 16],
                      "fmt": ["mp4"]})
        )
    with _pytest.raises(NotImplementedError, match="mvid"):
        FrameSample()(
            pa.table({"video_id": ["v0"], "bytes": [b"x"], "fmt": ["mkv"]})
        )


def test_lossy_jpeg_uint8():
    """Real JPEG-encoded uint8 inputs through the from-scratch baseline
    decoder (moaray/jpeg.py): engine mosaic must EXACTLY equal the oracle
    built from decode(encode(...)) arrays (same lossy pixels -> same merge
    decisions), and sit above the PSNR>=40dB gate vs the pristine mosaic
    (the reference's any-GDAL-format capability, ref mosaic.py:16)."""
    from dataclasses import replace

    from moaray import codecs
    from moaray.testgen import images_path as _ipath

    layout = Layout("grid3x3", 9, 64)
    path = _ipath(layout, fmts=("jpeg",), explicit_meta=True, dtype="uint8")
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64))
    got = mosaic_array(res.tiles_ds, res.grid)
    assert got.dtype == np.uint8

    metas = [
        replace(m, dtype="uint8", fmt="jpeg") for m in metas_for_layout(layout)
    ]
    grid = make_output_grid(metas, blocksize=64)
    lossy = {}
    clean = {}
    for i, m in enumerate(metas):
        arr = pixel_array(i, layout, dtype="uint8")
        clean[m.image_id] = arr
        lossy[m.image_id] = codecs.decode(codecs.encode(arr, "jpeg"))
    truth_lossy = oracle.build_mosaic(grid, metas, lossy)
    assert (got == truth_lossy).all()
    truth_clean = oracle.build_mosaic(grid, metas, clean)
    assert codecs.psnr(truth_clean, got, peak=255.0) >= 40.0


def test_lineage_capped_on_hot_tiles(monkeypatch):
    """Shuffled tile rows carry bounded lineage: n_inputs stays exact while
    input_ids keeps at most LINEAGE_CAP ids (first/last of the merge
    sequence) — round-2 verdict #5. Cap shrunk to 4 so the hotspot stack
    (8 inputs/tile) actually truncates; pixels must be unaffected."""
    import moaray.stages.assemble as asm

    monkeypatch.setattr(asm, "LINEAGE_CAP", 4)
    layout = Layout("hotspot", 16, 64)
    _grid, truth = oracle_mosaic(layout)
    res, got = run_engine(layout, salt_threshold=4, inputs_per_salt=2)
    assert (got == truth).all()
    rows = res.tiles_ds.select_columns(["n_inputs", "input_ids"]).take_all()
    assert all(len(r["input_ids"]) <= 4 for r in rows)
    # exact counts survive the salted two-level merge even when lists cap
    assert max(r["n_inputs"] for r in rows) == 8
    trunc = [r for r in rows if r["n_inputs"] > len(r["input_ids"])]
    assert trunc


def test_caption_passthrough_through_engine(ray_session):
    """North-star invariant: captions survive the engine BYTE-EQUAL — both
    through the pruned catalog scan and attached per tile-assignment."""
    from moaray.pipelines.mosaic import read_images, tile_caption_manifest

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    tbl = gen_images_table(layout)
    truth = dict(
        zip(tbl["image_id"].to_pylist(), tbl["caption"].to_pylist())
    )
    # 1) engine scan passthrough
    rows = read_images(path, ["image_id", "caption"]).take_all()
    assert {r["image_id"]: r["caption"] for r in rows} == truth
    # 2) per-tile caption manifest: every assignment row carries its
    # image's exact caption
    cfg = MosaicConfig(layout=layout, blocksize=64)
    man = tile_caption_manifest(path, cfg).take_all()
    assert len(man) > 0
    for r in man:
        assert r["caption"] == truth[r["image_id"]]


def test_on_decode_error_skip(ray_session, tmp_path):
    """A corrupt payload in the catalog: default config fails the job
    (strict parity); on_decode_error='skip' drops ONLY that image — the
    result equals the oracle built without it (missing pixels fall
    through to lower-seq inputs or null). The operational posture for
    10^12-object corpora where corrupt objects are a certainty."""
    import pyarrow.parquet as pq

    from moaray.testgen import gen_images_table

    layout = Layout("grid3x3", 9, 64)
    tbl = gen_images_table(layout, ("z16",), explicit_meta=True)
    blobs = tbl.column("bytes").to_pylist()
    blobs[4] = b"MRAYgarbage-not-a-real-payload"  # corrupt the center image
    import pyarrow as pa

    tbl = tbl.set_column(tbl.schema.get_field_index("bytes"), "bytes",
                         pa.array(blobs, pa.binary()))
    path = tmp_path / "imgs"
    path.mkdir()
    pq.write_table(tbl, str(path / "part-00000.parquet"), row_group_size=4)

    with pytest.raises(Exception):
        res = do_mosaic(str(path), MosaicConfig(layout=layout, blocksize=64))
        mosaic_array(res.tiles_ds, res.grid)  # force execution

    res = do_mosaic(
        str(path),
        MosaicConfig(layout=layout, blocksize=64, on_decode_error="skip"),
    )
    got = mosaic_array(res.tiles_ds, res.grid)
    # oracle: same catalog without image 4
    metas = [m for i, m in enumerate(metas_for_layout(layout)) if i != 4]
    grid = make_output_grid(metas_for_layout(layout), blocksize=64)
    arrays = {m.image_id: pixel_array(int(m.image_id[3:]), layout)
              for m in metas}
    truth = oracle.build_mosaic(grid, metas, arrays)
    assert np.array_equal(got, truth)
