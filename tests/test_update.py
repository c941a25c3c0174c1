"""Incremental mosaic update (pipelines/update.py): folding new images into
a committed output must equal a full rebuild with the concatenated input
list, rewrite only affected tiles, and be idempotent."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from moaray import MosaicConfig, do_mosaic, oracle
from moaray.geo import make_output_grid
from moaray.pipelines.mosaic import mosaic_array
from moaray.pipelines.update import update_mosaic
from moaray.state.manifest import read_committed_tiles, winning_commits
from moaray.testgen import (
    Layout,
    gen_images_table,
    metas_for_layout,
    pixel_array,
)

LAYOUT = Layout("grid3x3", 9, 96)
# base = every image except the center one (so the base grid already spans
# the full extent — an update cannot extend the stored grid); the update
# appends the center image, which overlaps all its neighbours
BASE_IDX = [0, 1, 2, 3, 5, 6, 7, 8]
UPD_IDX = [4]


@pytest.fixture()
def split_catalogs(tmp_path):
    import pyarrow as pa

    tbl = gen_images_table(LAYOUT)
    base = str(tmp_path / "base")
    upd = str(tmp_path / "update")
    os.makedirs(base)
    os.makedirs(upd)
    pq.write_table(
        tbl.take(pa.array(BASE_IDX)), os.path.join(base, "part-0.parquet")
    )
    pq.write_table(
        tbl.take(pa.array(UPD_IDX)), os.path.join(upd, "part-0.parquet")
    )
    return base, upd


def _truth():
    """Full-rebuild oracle with the APPEND input order: base images in
    catalog order, then the update images — update semantics are exactly
    'extend the input list'."""
    metas = metas_for_layout(LAYOUT)
    grid = make_output_grid([metas[i] for i in BASE_IDX], 64)
    ordered = [metas[i] for i in BASE_IDX] + [metas[i] for i in UPD_IDX]
    arrays = {
        m.image_id: pixel_array(i, LAYOUT) for i, m in enumerate(metas)
    }
    return grid, oracle.build_mosaic(grid, ordered, arrays)


def test_update_equals_full_rebuild(ray_session, tmp_path, split_catalogs):
    base, upd = split_catalogs
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False)

    res_base = do_mosaic(base, cfg, out_dir=out)
    n_records_base = len(
        [n for n in os.listdir(os.path.join(out, "manifest"))
         if n.endswith(".json")]
    )

    res = update_mosaic(upd, cfg, out)
    grid, truth = _truth()
    got = mosaic_array(res.tiles_ds, grid)
    assert np.array_equal(got, truth)

    # stats recomputed over winning generations must match the oracle
    omin, omax, omean, ostd, ocount = oracle.stats(truth, grid.nullval)
    s = res.stats
    assert s["count"] == ocount and s["min"] == omin and s["max"] == omax
    assert abs(s["mean"] - omean) < 1e-9 and abs(s["stddev"] - ostd) < 1e-9

    # only affected tiles gained a new generation; unaffected tiles keep
    # exactly one committed generation
    winners = winning_commits(out)
    assert len(winners) == grid.num_tiles
    n_records_after = len(
        [n for n in os.listdir(os.path.join(out, "manifest"))
         if n.endswith(".json")]
    )
    assert n_records_after > n_records_base  # new generation appended
    # the base generation is still on disk (append-only update)
    assert res_base.manifest.num_rows <= n_records_after


def test_update_idempotent(ray_session, tmp_path, split_catalogs):
    base, upd = split_catalogs
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)
    update_mosaic(upd, cfg, out)
    first = mosaic_array(read_committed_tiles(out), _truth()[0])
    # a crashed-and-rerun update converges: same content, newer generation
    update_mosaic(upd, cfg, out)
    second = mosaic_array(read_committed_tiles(out), _truth()[0])
    assert np.array_equal(first, second)


def test_update_disjoint_noop(ray_session, tmp_path):
    # an update whose footprints touch nothing (empty catalog intersection)
    # must leave the output untouched
    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    os.makedirs(base)
    pq.write_table(tbl, os.path.join(base, "part-0.parquet"))
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)
    before = winning_commits(out)

    far = str(tmp_path / "far")
    os.makedirs(far)
    # second catalog placed far outside the grid: reuse image 1 bytes but
    # with an explicit geotransform 100 km east
    import pyarrow as pa

    row = tbl.slice(0, 1)
    gt = [400000.0 + 1e5, 10.0, 0.0, 7000000.0, 0.0, -10.0]
    row = row.append_column("gt", pa.array([gt], pa.list_(pa.float64(), 6)))
    row = row.append_column("crs", pa.array(["EPSG:32756"], pa.string()))
    row = row.append_column("nullval", pa.array([0.0], pa.float64()))
    row = row.append_column("seq", pa.array([0], pa.int64()))
    pq.write_table(row, os.path.join(far, "part-0.parquet"))

    res = update_mosaic(far, cfg, out)
    assert winning_commits(out) == before
    assert res.tiles_ds.count() == len(before)


def test_update_multiband(ray_session, tmp_path):
    """Multiband incremental update: both bands of the affected tiles merge
    the new image; unaffected tiles keep one generation per band."""
    import pyarrow as pa

    from moaray.testgen import band_pixel_array

    tbl = gen_images_table(LAYOUT, nbands=2)
    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    os.makedirs(base)
    os.makedirs(upd)
    # rows are (image, band) pairs: image i occupies rows 2i, 2i+1
    base_rows = [r for i in BASE_IDX for r in (2 * i, 2 * i + 1)]
    upd_rows = [r for i in UPD_IDX for r in (2 * i, 2 * i + 1)]
    pq.write_table(tbl.take(pa.array(base_rows)), os.path.join(base, "p.parquet"))
    pq.write_table(tbl.take(pa.array(upd_rows)), os.path.join(upd, "p.parquet"))
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False)
    do_mosaic(base, cfg, out_dir=out)
    res = update_mosaic(upd, cfg, out)

    metas = metas_for_layout(LAYOUT)
    grid = make_output_grid([metas[i] for i in BASE_IDX], 64)
    ordered = [metas[i] for i in BASE_IDX] + [metas[i] for i in UPD_IDX]
    for band in (0, 1):
        arrays = {
            m.image_id: band_pixel_array(i, LAYOUT, band)
            for i, m in enumerate(metas)
        }
        truth = oracle.build_mosaic(grid, ordered, arrays)
        got = mosaic_array(read_committed_tiles(out), grid, band=band)
        assert np.array_equal(got, truth), f"band {band}"
    assert res.stats_by_band.keys() == {0, 1}


def test_update_rejects_crs_mismatch(ray_session, tmp_path):
    import pyarrow as pa

    from moaray.crs import ProjectionError

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    os.makedirs(base)
    pq.write_table(tbl, os.path.join(base, "p.parquet"))
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)

    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    row = tbl.slice(0, 1)
    row = row.append_column(
        "gt", pa.array([[300000.0, 10.0, 0.0, 7000000.0, 0.0, -10.0]],
                       pa.list_(pa.float64(), 6))
    )
    row = row.append_column("crs", pa.array(["AFFINE:0,2,0,0,0,2"]))
    row = row.append_column("nullval", pa.array([0.0], pa.float64()))
    row = row.append_column("seq", pa.array([0], pa.int64()))
    pq.write_table(row, os.path.join(bad, "p.parquet"))
    with pytest.raises(ProjectionError, match="set out_crs"):
        update_mosaic(bad, cfg, out)


def test_update_explicit_sparse_seq(ray_session, tmp_path):
    """Non-dense explicit seq columns: the persisted high-water mark must be
    max(seq)+1, not the image count, or a second update hands out seqs BELOW
    the first update's and last-non-null precedence inverts vs the
    append-order full rebuild (round-2 ADVICE, pipelines/update.py)."""
    from dataclasses import replace

    import pyarrow as pa

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay, explicit_meta=True)
    base = str(tmp_path / "base")
    upd1 = str(tmp_path / "u1")
    upd2 = str(tmp_path / "u2")
    for d in (base, upd1, upd2):
        os.makedirs(d)
    # base: image 0 alone, at explicit SPARSE seq 10 (HWM must become 11)
    r0 = tbl.slice(0, 1).append_column("seq", pa.array([10], pa.int64()))
    pq.write_table(r0, os.path.join(base, "p.parquet"))
    # update 1: image 1 at explicit seq 5
    r1 = tbl.slice(1, 1).append_column("seq", pa.array([5], pa.int64()))
    pq.write_table(r1, os.path.join(upd1, "p.parquet"))
    # update 2: image 0's pixels under a NEW id at explicit seq 0 — must
    # land ABOVE update 1's image in merge order (append semantics)
    r2 = tbl.slice(0, 1).append_column("seq", pa.array([0], pa.int64()))
    idx = r2.schema.get_field_index("image_id")
    r2 = r2.set_column(idx, "image_id", pa.array(["img0b"], pa.string()))
    pq.write_table(r2, os.path.join(upd2, "p.parquet"))

    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)
    update_mosaic(upd1, cfg, out)
    update_mosaic(upd2, cfg, out)

    metas = metas_for_layout(lay)
    grid = make_output_grid([metas[0]], 64)
    m0b = replace(metas[0], image_id="img0b")
    arrays = {
        metas[0].image_id: pixel_array(0, lay),
        metas[1].image_id: pixel_array(1, lay),
        "img0b": pixel_array(0, lay),
    }
    truth = oracle.build_mosaic(grid, [metas[0], metas[1], m0b], arrays)
    got = mosaic_array(read_committed_tiles(out), grid)
    assert np.array_equal(got, truth)


def test_read_committed_pruned_columns_resolves_generations(
    ray_session, tmp_path, split_catalogs
):
    """A pruned column list omitting committed_at/tile_id/band must still
    filter superseded generations (round-2 ADVICE, manifest.py): the resolve
    columns are force-included in the read and dropped after."""
    base, upd = split_catalogs
    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)
    update_mosaic(upd, cfg, out)  # leaves superseded generations on disk

    n_keys = len(winning_commits(out))
    pruned = read_committed_tiles(out, columns=["pixels", "pixels_codec"])
    rows = pruned.count()
    assert rows == n_keys  # superseded rows filtered, one row per key
    assert set(pruned.schema().names) == {"pixels", "pixels_codec"}


def _ext_catalog(tmp_path, name, base_idx, gt):
    """One-image extension catalog: image ``base_idx``'s pixels at an
    explicit grid-aligned geotransform."""
    import pyarrow as pa

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    row = tbl.slice(base_idx, 1)
    row = row.append_column("gt", pa.array([list(gt)], pa.list_(pa.float64(), 6)))
    row = row.append_column("crs", pa.array(["EPSG:32756"], pa.string()))
    row = row.append_column("nullval", pa.array([0.0], pa.float64()))
    row = row.append_column("seq", pa.array([0], pa.int64()))
    d = str(tmp_path / name)
    os.makedirs(d)
    pq.write_table(row, os.path.join(d, "p.parquet"))
    return d


def _extend_truth(new_gt):
    """Full-rebuild oracle over [image0 at its layout slot, image1 at
    new_gt] with append order."""
    from dataclasses import replace

    from moaray.geo import make_output_grid

    lay = Layout("pair_overlap", 2, 64)
    metas = metas_for_layout(lay)
    m_new = replace(metas[1], transform=tuple(new_gt))
    grid = make_output_grid([metas[0], m_new], 64)
    arrays = {
        metas[0].image_id: pixel_array(0, lay),
        m_new.image_id: pixel_array(1, lay),
    }
    return grid, oracle.build_mosaic(grid, [metas[0], m_new], arrays)


@pytest.mark.parametrize(
    "new_gt",
    [
        # growth right+down, with a gap (empty tiles in between)
        (300000.0 + 96 * 10.0, 10.0, 0.0, 7000000.0 - 96 * 10.0, 0.0, -10.0),
        # growth left+up
        (300000.0 - 64 * 10.0, 10.0, 0.0, 7000000.0 + 64 * 10.0, 0.0, -10.0),
        # growth right only, overlapping the old edge
        (300000.0 + 32 * 10.0, 10.0, 0.0, 7000000.0, 0.0, -10.0),
    ],
)
def test_extend_mosaic_matches_full_rebuild(ray_session, tmp_path, new_gt):
    """Grid extension: committed pixels migrate as base windows onto the
    union-extent grid; the result must equal a full rebuild over the
    concatenated catalog (append order), including empty-gap tiles."""
    from moaray.pipelines.update import extend_mosaic

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    os.makedirs(base)
    import pyarrow as pa

    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    ext = _ext_catalog(tmp_path, "ext", 1, new_gt)

    out = str(tmp_path / "out")
    new_out = str(tmp_path / "out2")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False)
    do_mosaic(base, cfg, out_dir=out)
    res = extend_mosaic(ext, cfg, out, new_out)

    grid_t, truth = _extend_truth(new_gt)
    assert (res.grid.ncols, res.grid.nrows) == (grid_t.ncols, grid_t.nrows)
    assert res.grid.transform == grid_t.transform
    got = mosaic_array(res.tiles_ds, res.grid)
    assert np.array_equal(got, truth)
    # full-extent parity: every tile of the new grid committed
    assert res.tiles_ds.count() == res.grid.num_tiles
    # stats over the extended output match the oracle
    omin, omax, omean, ostd, ocount = oracle.stats(truth, grid_t.nullval)
    s = res.stats
    assert s["count"] == ocount and s["min"] == omin and s["max"] == omax
    assert abs(s["mean"] - omean) < 1e-9


def test_extend_mosaic_multiband(ray_session, tmp_path):
    """Grid growth with a 2-band committed mosaic: both bands migrate and
    merge; per-band stats recompute over the extended output."""
    import pyarrow as pa

    from moaray.pipelines.update import extend_mosaic
    from moaray.testgen import band_pixel_array

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay, nbands=2)
    base = str(tmp_path / "base")
    ext = str(tmp_path / "ext")
    os.makedirs(base)
    os.makedirs(ext)
    # rows are (image, band) pairs: image 0 = rows 0,1; image 1 = rows 2,3
    pq.write_table(tbl.take(pa.array([0, 1])), os.path.join(base, "p.parquet"))
    new_gt = (300000.0 + 96 * 10.0, 10.0, 0.0, 7000000.0 - 96 * 10.0, 0.0, -10.0)
    rows = tbl.take(pa.array([2, 3]))  # image 1, bands 0+1
    rows = rows.append_column(
        "gt", pa.array([list(new_gt)] * 2, pa.list_(pa.float64(), 6))
    )
    rows = rows.append_column("crs", pa.array(["EPSG:32756"] * 2, pa.string()))
    rows = rows.append_column("nullval", pa.array([0.0] * 2, pa.float64()))
    rows = rows.append_column("seq", pa.array([0, 0], pa.int64()))
    pq.write_table(rows, os.path.join(ext, "p.parquet"))

    out = str(tmp_path / "out")
    new_out = str(tmp_path / "out2")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False)
    do_mosaic(base, cfg, out_dir=out)
    res = extend_mosaic(ext, cfg, out, new_out)

    from dataclasses import replace

    metas = metas_for_layout(lay)
    m_new = replace(metas[1], transform=new_gt)
    # base mosaic holds image 0 ONLY (rows 0,1 are its two bands)
    grid_t = make_output_grid([metas[0], m_new], 64)
    for band in (0, 1):
        arrays = {
            metas[0].image_id: band_pixel_array(0, lay, band),
            m_new.image_id: band_pixel_array(1, lay, band),
        }
        truth = oracle.build_mosaic(grid_t, [metas[0], m_new], arrays)
        got = mosaic_array(res.tiles_ds, res.grid, band=band)
        assert np.array_equal(got, truth), f"band {band}"
    assert res.stats_by_band.keys() == {0, 1}


def test_extend_mosaic_rerun_converges(ray_session, tmp_path):
    """A crashed-and-rerun extension converges: the target directory is
    rebuilt whole (old out_dir untouched), so rerunning yields identical
    content and the source mosaic still reads."""
    from moaray.pipelines.update import extend_mosaic

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    import pyarrow as pa

    base = str(tmp_path / "base")
    os.makedirs(base)
    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    new_gt = (300000.0 + 960.0, 10.0, 0.0, 7000000.0 - 960.0, 0.0, -10.0)
    ext = _ext_catalog(tmp_path, "ext", 1, new_gt)
    out = str(tmp_path / "out")
    new_out = str(tmp_path / "out2")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                       do_stats=False)
    do_mosaic(base, cfg, out_dir=out)
    before = winning_commits(out)

    res1 = extend_mosaic(ext, cfg, out, new_out)
    grid = res1.grid
    first = mosaic_array(read_committed_tiles(new_out), grid)
    res2 = extend_mosaic(ext, cfg, out, new_out)
    second = mosaic_array(read_committed_tiles(new_out), grid)
    assert np.array_equal(first, second)
    # the source mosaic is untouched
    assert winning_commits(out) == before


def test_extend_mosaic_sliver_edges(ray_session, tmp_path):
    """Grid growth with a blocksize that doesn't divide the extent: the old
    grid's sliver-merged edge tiles re-split across the extended grid's
    regular tiles — migration windows clip at the NEW tile boundaries."""
    from moaray.pipelines.update import extend_mosaic

    lay = Layout("pair_overlap", 2, 64)
    tbl = gen_images_table(lay)
    import pyarrow as pa

    base = str(tmp_path / "base")
    os.makedirs(base)
    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    new_gt = (300000.0 + 96 * 10.0, 10.0, 0.0, 7000000.0 - 96 * 10.0, 0.0, -10.0)
    ext = _ext_catalog(tmp_path, "ext", 1, new_gt)
    out = str(tmp_path / "out")
    new_out = str(tmp_path / "out2")
    # blocksize 48: 64-px base grid -> edges engage the 25%-sliver rule
    cfg = MosaicConfig(layout=lay, blocksize=48, do_pyramids=False)
    do_mosaic(base, cfg, out_dir=out)
    res = extend_mosaic(ext, cfg, out, new_out)

    from dataclasses import replace

    metas = metas_for_layout(lay)
    m_new = replace(metas[1], transform=new_gt)
    grid_t = make_output_grid([metas[0], m_new], 48)
    truth = oracle.build_mosaic(
        grid_t,
        [metas[0], m_new],
        {
            metas[0].image_id: pixel_array(0, lay),
            m_new.image_id: pixel_array(1, lay),
        },
    )
    got = mosaic_array(res.tiles_ds, res.grid)
    assert got.shape == truth.shape
    assert np.array_equal(got, truth)
    assert res.tiles_ds.count() == res.grid.num_tiles


# ---------------------------------------------------------------------------
# Feather (weighted-blend) incremental update: persisted num/den partials


def _full_feather(tmp_path, do_pyramids=False):
    """Full-rebuild feather mosaic over the complete catalog (engine truth;
    the feather kernel has no nested-loop oracle — the salted/unsalted
    equivalence test pins its semantics)."""
    cat = str(tmp_path / "full_cat")
    os.makedirs(cat, exist_ok=True)
    pq.write_table(gen_images_table(LAYOUT), os.path.join(cat, "part-0.parquet"))
    res = do_mosaic(
        cat,
        MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather",
                     do_pyramids=do_pyramids),
    )
    return mosaic_array(res.tiles_ds, res.grid)


def test_feather_update_equals_full_rebuild(ray_session, tmp_path, split_catalogs):
    """update_mosaic(merge='feather') over a feather_partials base ==
    full feather rebuild over the concatenated catalog, within one code
    value (float-sum reassociation — the same bound the salted/unsalted
    feather equivalence carries). The updated output persists fresh
    partials, so a SECOND update chains without re-reading sources."""
    base, upd = split_catalogs
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather",
                       feather_partials=True, do_pyramids=False)
    out = str(tmp_path / "out")
    res0 = do_mosaic(base, cfg, out_dir=out)
    row = res0.tiles_ds.take(1)[0]
    assert row.get("num") is not None and row.get("den") is not None

    res1 = update_mosaic(upd, cfg, out)
    got = mosaic_array(res1.tiles_ds, res1.grid)
    truth = _full_feather(tmp_path)
    diff = np.abs(got.astype(np.int64) - truth.astype(np.int64))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.001
    # updated generation still carries partials for the next update
    row1 = res1.tiles_ds.take(1)[0]
    assert row1.get("num") is not None


def test_feather_update_rerun_is_noop(ray_session, tmp_path, split_catalogs):
    """Re-adding a delta would DOUBLE its blend weight; the applied_updates
    content-id guard makes a completed update's rerun a no-op."""
    base, upd = split_catalogs
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather",
                       feather_partials=True, do_pyramids=False)
    out = str(tmp_path / "out")
    do_mosaic(base, cfg, out_dir=out)
    res1 = update_mosaic(upd, cfg, out)
    got1 = mosaic_array(res1.tiles_ds, res1.grid)
    res2 = update_mosaic(upd, cfg, out)
    got2 = mosaic_array(res2.tiles_ds, res2.grid)
    assert (got1 == got2).all()


def test_update_content_id_folds_payload_bytes(tmp_path):
    """The applied_updates guard keys on CONTENT, not just (image_id, seq):
    a second, genuinely different delta that reuses image_ids (corrected
    imagery re-delivered under the same ids) must hash differently so it
    is applied rather than silently no-op'd; a byte-identical rerun (even
    rewritten to a different parquet file) must hash the same."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray.pipelines.update import _update_content_id

    def cat(path, payloads, ids=("a", "b"), seqs=(0, 1)):
        pq.write_table(
            pa.table({
                "image_id": pa.array(list(ids), pa.string()),
                "seq": pa.array(list(seqs), pa.int64()),
                "bytes": pa.array(list(payloads), pa.binary()),
            }),
            str(path),
        )
        return str(path)

    p1 = cat(tmp_path / "d1.parquet", [b"\x01\x02", b"\x03\x04"])
    p2 = cat(tmp_path / "d2.parquet", [b"\x01\x02", b"\x03\x04"])
    p3 = cat(tmp_path / "d3.parquet", [b"\x01\x02", b"\xff\xff"])
    assert _update_content_id(p1) == _update_content_id(p2)
    assert _update_content_id(p1) != _update_content_id(p3)
    # row order must not matter (merge order is carried by seq)
    p4 = cat(tmp_path / "d4.parquet", [b"\x03\x04", b"\x01\x02"],
             ids=("b", "a"), seqs=(1, 0))
    assert _update_content_id(p1) == _update_content_id(p4)


def test_feather_update_without_partials_rejected(
    ray_session, tmp_path, split_catalogs
):
    base, upd = split_catalogs
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather",
                       do_pyramids=False)  # no feather_partials
    out = str(tmp_path / "out")
    do_mosaic(base, cfg, out_dir=out)
    with pytest.raises(ValueError, match="feather_partials"):
        update_mosaic(upd, cfg, out)


def test_feather_update_killed_attempt_retry(
    ray_session, tmp_path, split_catalogs
):
    """A killed update leaves SOME new-generation partitions committed but
    no gen_hwm advance; the retry's base read pins to the old barrier, so
    those partial commits are ignored (no double-add) and the retry's
    rewrite supersedes them by timestamp."""
    import glob
    import json

    base, upd = split_catalogs
    cfg = MosaicConfig(layout=LAYOUT, blocksize=64, merge="feather",
                       feather_partials=True, do_pyramids=False)
    out = str(tmp_path / "out")
    do_mosaic(base, cfg, out_dir=out)
    with open(os.path.join(out, "grid.json")) as f:
        meta_before = json.load(f)

    # run the update fully, then SIMULATE the kill: roll grid.json back to
    # the pre-update state (as if the run died after committing every
    # partition but before the barrier advanced — the worst partial state)
    update_mosaic(upd, cfg, out)
    with open(os.path.join(out, "grid.json"), "w") as f:
        json.dump(meta_before, f)

    res = update_mosaic(upd, cfg, out)  # the retry
    got = mosaic_array(res.tiles_ds, res.grid)
    truth = _full_feather(tmp_path)
    diff = np.abs(got.astype(np.int64) - truth.astype(np.int64))
    assert diff.max() <= 1


def test_update_delta_size_guard():
    # a delta past driver_plan_limit is a rebuild, not an update: refuse
    # fast (metadata-only row count, before touching the committed dir)
    from moaray.pipelines.mosaic import MosaicConfig
    from moaray.pipelines.update import update_mosaic
    from moaray.testgen import Layout, images_path

    layout = Layout("grid3x3", 9, 64)
    cfg = MosaicConfig(layout=layout, blocksize=64, driver_plan_limit=3)
    with pytest.raises(ValueError, match="rebuild, not an update"):
        update_mosaic(images_path(layout), cfg, "/tmp/never_exists_out")


def test_update_with_warp_equals_rebuild(ray_session, tmp_path):
    """Warp-on-read deltas (closes the 'updates cannot warp' restriction):
    the stored grid is native-CRS; the delta lives in a scaled CRS
    (AFFINE:0,2). With out_crs == the stored CRS the delta warps onto the
    committed lattice (WarpSpec anchored at the stored origin); within the
    stored extent the result equals a full warp rebuild over the
    concatenated catalog (append order), bit-exact."""
    import pyarrow as pa

    from moaray.crs import ProjectionError

    lay = Layout("mixed_crs", 3, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    full = str(tmp_path / "full")
    for d in (base, upd, full):
        os.makedirs(d)
    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    pq.write_table(tbl.take(pa.array([1, 2])), os.path.join(upd, "p.parquet"))
    pq.write_table(tbl, os.path.join(full, "p.parquet"))

    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False)
    res_base = do_mosaic(base, cfg, out_dir=out)
    # materialize the base pixels NOW — tiles_ds is a lazy view of out_dir
    # and would re-read the post-update winning generations
    base_arr = mosaic_array(res_base.tiles_ds, res_base.grid)

    # without a warp the heterogeneous delta must still fail validation
    with pytest.raises(ProjectionError, match="warp"):
        update_mosaic(upd, cfg, out)
    # and out_crs may only name the STORED CRS
    bad = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                       out_crs="AFFINE:0,1,0,0,0,1")
    with pytest.raises(ValueError, match="stored grid CRS"):
        update_mosaic(upd, bad, out)

    wcfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                        out_crs=res_base.grid.crs)
    res = update_mosaic(upd, wcfg, out)
    got = mosaic_array(res.tiles_ds, res.grid)

    # oracle: full rebuild with the same warp at the stored resolution;
    # the update only sees the stored extent, so crop the rebuild to it
    rcfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                        out_crs=res_base.grid.crs,
                        out_xres=10.0, out_yres=10.0)
    rres = do_mosaic(full, rcfg, out_dir=str(tmp_path / "rebuild"))
    rall = mosaic_array(rres.tiles_ds, rres.grid)
    assert rres.grid.transform[0] == res.grid.transform[0]
    assert rres.grid.transform[3] == res.grid.transform[3]
    crop = rall[: res.grid.nrows, : res.grid.ncols]
    assert got.shape == crop.shape
    assert np.array_equal(got, crop)
    # the warped delta really landed inside the stored extent
    assert np.any(got != base_arr)


def test_extend_with_warp_equals_rebuild(ray_session, tmp_path):
    """Grid growth with a warped delta: the union extent comes from the
    anchored warped metas, committed pixels migrate, and the whole output
    equals a full warp rebuild (same grid, same pixels)."""
    import pyarrow as pa

    from moaray.pipelines.update import extend_mosaic

    lay = Layout("mixed_crs", 3, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    ext = str(tmp_path / "ext")
    full = str(tmp_path / "full")
    for d in (base, ext, full):
        os.makedirs(d)
    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    pq.write_table(tbl.take(pa.array([1, 2])), os.path.join(ext, "p.parquet"))
    pq.write_table(tbl, os.path.join(full, "p.parquet"))

    out = str(tmp_path / "out")
    new_out = str(tmp_path / "out2")
    cfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False)
    res_base = do_mosaic(base, cfg, out_dir=out)

    wcfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                        out_crs=res_base.grid.crs)
    res = extend_mosaic(ext, wcfg, out, new_out)

    rcfg = MosaicConfig(layout=lay, blocksize=64, do_pyramids=False,
                        out_crs=res_base.grid.crs,
                        out_xres=10.0, out_yres=10.0)
    rres = do_mosaic(full, rcfg, out_dir=str(tmp_path / "rebuild"))
    assert res.grid.transform == rres.grid.transform
    assert (res.grid.ncols, res.grid.nrows) == (rres.grid.ncols, rres.grid.nrows)
    got = mosaic_array(res.tiles_ds, res.grid)
    truth = mosaic_array(rres.tiles_ds, rres.grid)
    assert np.array_equal(got, truth)


def test_feather_update_with_warp(ray_session, tmp_path):
    """Warped delta through the feather kernel: base persists num/den
    partials; the scaled-CRS delta warps on read and folds into the
    weighted sums. Truth = full feather rebuild with the same warp,
    within one code value (float-sum reassociation bound)."""
    import pyarrow as pa

    lay = Layout("mixed_crs", 3, 64)
    tbl = gen_images_table(lay)
    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    full = str(tmp_path / "full")
    for d in (base, upd, full):
        os.makedirs(d)
    pq.write_table(tbl.take(pa.array([0])), os.path.join(base, "p.parquet"))
    pq.write_table(tbl.take(pa.array([1, 2])), os.path.join(upd, "p.parquet"))
    pq.write_table(tbl, os.path.join(full, "p.parquet"))

    out = str(tmp_path / "out")
    cfg = MosaicConfig(layout=lay, blocksize=64, merge="feather",
                       feather_partials=True, do_pyramids=False)
    res_base = do_mosaic(base, cfg, out_dir=out)

    wcfg = MosaicConfig(layout=lay, blocksize=64, merge="feather",
                        feather_partials=True, do_pyramids=False,
                        out_crs=res_base.grid.crs)
    res = update_mosaic(upd, wcfg, out)
    got = mosaic_array(res.tiles_ds, res.grid)

    rcfg = MosaicConfig(layout=lay, blocksize=64, merge="feather",
                        do_pyramids=False, out_crs=res_base.grid.crs,
                        out_xres=10.0, out_yres=10.0)
    rres = do_mosaic(full, rcfg, out_dir=str(tmp_path / "rebuild"))
    rall = mosaic_array(rres.tiles_ds, rres.grid)
    crop = rall[: res.grid.nrows, : res.grid.ncols]
    assert got.shape == crop.shape
    diff = np.abs(got.astype(np.int64) - crop.astype(np.int64))
    assert diff.max() <= 1
