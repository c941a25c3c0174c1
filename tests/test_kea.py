"""KEA driver (moaray/sinks/kea.py) on the from-scratch minimal HDF5
container (moaray/hdf5.py): the fifth output driver and the reference's
DEFAULT test driver (ref tests.py:15, mosaic.py:30-35).

The HDF5 reader is exercised two ways: against the writer (round trips)
and against a HAND-ASSEMBLED byte fixture built straight from the HDF5
File Format Specification with a different block order than the writer
emits — so reader and writer can't share a layout bug.
"""

import os
import struct

import numpy as np
import pytest

from moaray import Layout, MosaicConfig, do_mosaic
from moaray.hdf5 import SIGNATURE, UNDEF, MiniHdf5Writer, h5_open
from moaray.pipelines.mosaic import mosaic_array
from moaray.sinks.kea import export_kea, parse_kea_bytes, read_kea
from moaray.testgen import gen_images_table, images_path


# ------------------------------------------------------------- container

def _manual_h5() -> bytes:
    """A tiny HDF5 file assembled by hand from the spec: root group with
    one contiguous int32 dataset 'x' of shape (2, 3).  Metadata comes
    FIRST and raw data LAST — the opposite of MiniHdf5Writer's layout —
    so parsing it proves the reader follows addresses, not conventions."""
    blob = bytearray(b"\0" * 96)          # superblock patched at the end

    def add(b: bytes) -> int:
        addr = len(blob)
        blob.extend(b)
        return addr

    def msg(mtype: int, body: bytes) -> bytes:
        body = body + b"\0" * ((-len(body)) % 8)
        return struct.pack("<HHB3x", mtype, len(body), 0) + body

    # dataset object header (layout message patched once data lands)
    sp = struct.pack("<BBB5xQQ", 1, 2, 0, 2, 3)           # dataspace 2x3
    dt = (struct.pack("<B3BI", 0x10, 0x08, 0, 0, 4)       # int32 LE signed
          + struct.pack("<HH", 0, 32))
    layout_body = struct.pack("<BBQQ", 3, 1, 0, 24)       # addr patched
    msgs = msg(0x0001, sp) + msg(0x0003, dt) + msg(0x0008, layout_body)
    ds_hdr = (struct.pack("<BxHII", 1, 3, 1, len(msgs)) + b"\0" * 4 + msgs)
    ds_addr = add(ds_hdr)
    layout_addr_field = ds_addr + 16 + len(msg(0x0001, sp)) \
        + len(msg(0x0003, dt)) + 8 + 2                     # 'addr' offset

    # local heap: data segment then header
    heap_data = bytearray(b"\0" * 8)
    name_off = len(heap_data)
    heap_data.extend(b"x\0" + b"\0" * 6)
    hd_addr = add(bytes(heap_data))
    heap_addr = add(b"HEAP" + struct.pack("<B3xQQQ", 0, len(heap_data),
                                          UNDEF, hd_addr))
    # SNOD with the single entry, then the group B-tree over it
    snod = (b"SNOD" + struct.pack("<BBH", 1, 0, 1)
            + struct.pack("<QQII16x", name_off, ds_addr, 0, 0))
    snod_addr = add(snod)
    bt = (b"TREE" + struct.pack("<BBHQQ", 0, 0, 1, UNDEF, UNDEF)
          + struct.pack("<QQQ", 0, snod_addr, name_off))
    bt_addr = add(bt)
    # root group object header
    st = msg(0x0011, struct.pack("<QQ", bt_addr, heap_addr))
    root_hdr = struct.pack("<BxHII", 1, 1, 1, len(st)) + b"\0" * 4 + st
    root_addr = add(root_hdr)
    # raw data LAST; patch the layout message's address field
    data_addr = add(np.arange(6, dtype="<i4").tobytes())
    blob[layout_addr_field:layout_addr_field + 8] = struct.pack(
        "<Q", data_addr)

    sb = (SIGNATURE
          + struct.pack("<8B", 0, 0, 0, 0, 0, 8, 8, 0)
          + struct.pack("<HHI", 4, 16, 0)
          + struct.pack("<QQQQ", 0, UNDEF, len(blob), UNDEF)
          + struct.pack("<QQII16x", 0, root_addr, 0, 0))
    blob[0:96] = sb
    return bytes(blob)


def test_reader_parses_hand_assembled_spec_fixture():
    h5 = h5_open(_manual_h5())
    root = h5.root()
    assert root.keys() == ["x"]
    x = root["x"]
    assert x.shape == (2, 3) and x.dtype == np.dtype("<i4")
    assert x.read().tolist() == [[0, 1, 2], [3, 4, 5]]


def test_container_roundtrip_groups_chunks_attrs(tmp_path):
    p = str(tmp_path / "t.h5")
    rng = np.random.default_rng(5)
    truth = rng.integers(0, 60000, (90, 130)).astype(np.uint16)
    with open(p, "wb") as f:
        w = MiniHdf5Writer(f)
        # 117 chunks -> multi-level chunk B-tree; 23 names -> 3 SNODs
        w.create_chunked("G/DATA", truth.shape, np.uint16, (10, 10),
                         attrs={"CLASS": "IMAGE", "N": np.int32(7)})
        for r in range(0, 90, 10):
            for c in range(0, 130, 10):
                w.write_chunk("G/DATA", (r, c), truth[r:r + 10, c:c + 10])
        for i in range(23):
            w.create_array(f"MANY/d{i:02d}", np.array([i], np.int64))
        w.create_array("S", "hello world")
        w.create_array("F", np.array([3.5, -1.25], np.float64))
        w.close()
    h5 = h5_open(open(p, "rb").read())
    d = h5["G/DATA"]
    assert (d.read() == truth).all()
    assert d.attrs["CLASS"] == "IMAGE" and d.attrs["N"] == 7
    assert len(h5["MANY"].keys()) == 23
    assert h5["MANY/d22"].read_scalar() == 22
    assert h5["S"].read_scalar() == "hello world"
    assert h5["F"].read().tolist() == [3.5, -1.25]


def test_container_rejects_bad_signature():
    with pytest.raises(ValueError, match="signature"):
        h5_open(b"NOT AN HDF5 FILE" + b"\0" * 96)


# ---------------------------------------------------------------- driver

def test_export_kea_roundtrip_single_band(ray_session, tmp_path):
    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "m.kea")
    export_kea(res, out, blocksize=64)
    arr, gt, nullval, crs = read_kea(out)
    assert arr.dtype == truth.dtype
    assert np.array_equal(arr, truth)
    assert gt == pytest.approx(tuple(res.grid.transform))
    assert nullval == res.grid.nullval
    assert crs == res.grid.crs
    # the seam row survives the chunked stream (merge-order witness)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]
    assert open(out, "rb").read(8) == SIGNATURE


def test_export_kea_multiband(ray_session, tmp_path):
    import pyarrow.parquet as pq

    layout = Layout("grid3x3", 9, 48)
    tbl = gen_images_table(layout, nbands=3)
    cat = str(tmp_path / "cat")
    os.makedirs(cat)
    pq.write_table(tbl, os.path.join(cat, "p.parquet"))
    res = do_mosaic(cat, MosaicConfig(layout=layout, blocksize=48,
                                      do_pyramids=False))
    out = str(tmp_path / "mb.kea")
    export_kea(res, out, band="all", blocksize=48)
    arr, gt, nullval, crs = read_kea(out)
    assert arr.shape[0] == 3
    for b in range(3):
        truth = mosaic_array(res.tiles_ds, res.grid, band=b)
        assert np.array_equal(arr[b], truth), b
    # header NUMBANDS drives the read, and per-band groups exist
    h5 = h5_open(open(out, "rb").read())
    assert int(h5["HEADER/NUMBANDS"].read_scalar()) == 3
    assert h5["BAND3/DATA"].attrs["CLASS"] == "IMAGE"
    assert int(h5["BAND1/DATATYPE"].read_scalar()) == 6  # kea_16uint


def test_kea_float32_nan_null_and_sparse(ray_session, tmp_path):
    """float32 + NaN nodata + a sparse layout: untouched chunks are
    ABSENT from the file and read back as NaN."""
    import pyarrow.parquet as pq

    layout = Layout("sparse_gap", 4, 64)
    tbl = gen_images_table(layout, explicit_meta=True, dtype="float32",
                           nullval=float("nan"))
    cat = str(tmp_path / "cat")
    os.makedirs(cat)
    pq.write_table(tbl, os.path.join(cat, "p.parquet"))
    res = do_mosaic(cat, MosaicConfig(blocksize=64, do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "s.kea")
    export_kea(res, out, blocksize=32)
    arr, gt, nullval, crs = read_kea(out)
    assert arr.dtype == np.float32
    assert np.isnan(nullval)
    assert np.array_equal(arr, truth, equal_nan=True)
    # sparse: fewer stored chunks than grid positions
    h5 = h5_open(open(out, "rb").read())
    nbx = -(-res.grid.ncols // 32)
    nby = -(-res.grid.nrows // 32)
    body = None
    for t, b in h5.read_object_header(
            h5["BAND1"]._entries["DATA"]):  # noqa: SLF001 (test probe)
        if t == 0x0008:
            body = b
    (bt,) = struct.unpack_from("<Q", body, 3)
    stored = sum(1 for _ in h5.walk_chunk_btree(bt, 2))
    assert 0 < stored < nbx * nby


def test_cli_kea_driver(ray_session, tmp_path):
    from moaray.cli import main_cmd

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    out = str(tmp_path / "cli.kea")
    assert main_cmd(["-i", path, "-o", out, "--layout", "grid3x3,9,64",
                     "--blocksize", "64", "-d", "KEA"]) == 0
    arr, gt, nullval, crs = read_kea(out)
    assert arr[0, 60:66].tolist() == [60, 61, 62, 1, 2, 3]


def test_kea_full_circle_ingest(ray_session, tmp_path):
    """export_kea -> catalog_from_files ingest of the .kea -> re-mosaic
    bit-exact (same contract as the HFA/GTiff/ENVI full circles)."""
    from moaray.sources.files import catalog_from_files

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    d = str(tmp_path / "loose")
    os.makedirs(d)
    export_kea(res, os.path.join(d, "m.kea"), blocksize=64)
    cat = catalog_from_files(d, str(tmp_path / "cat"))
    res2 = do_mosaic(cat, MosaicConfig(blocksize=64, do_pyramids=False))
    arr2 = mosaic_array(res2.tiles_ds, res2.grid)
    assert arr2.dtype == truth.dtype
    assert np.array_equal(arr2, truth)
    assert res2.grid.crs == res.grid.crs


def test_kea_rejects_wrong_shape_header(tmp_path):
    p = str(tmp_path / "bad.kea")
    with open(p, "wb") as f:
        w = MiniHdf5Writer(f)
        w.create_array("HEADER/SIZE", np.array([5, 4], np.uint64))
        w.create_array("HEADER/TL", np.array([0.0, 0.0]))
        w.create_array("HEADER/RES", np.array([1.0, -1.0]))
        w.create_array("HEADER/ROT", np.array([0.0, 0.0]))
        w.create_array("HEADER/NUMBANDS", np.array([1], np.uint16))
        w.create_chunked("BAND1/DATA", (3, 3), np.uint16, (3, 3))
        w.write_chunk("BAND1/DATA", (0, 0), np.zeros((3, 3), np.uint16))
        w.close()
    with pytest.raises(ValueError, match="shape"):
        read_kea(p)


def test_parse_kea_requires_header_group():
    import io

    f = io.BytesIO()
    w = MiniHdf5Writer(f)
    w.create_array("x", np.array([1], np.int32))
    w.close()
    with pytest.raises(ValueError, match="HEADER"):
        parse_kea_bytes(f.getvalue())


def test_kea_overviews_and_stats_metadata(ray_session, tmp_path):
    """OVERVIEW<k> datasets equal the exact strided oracle (lvl//2 offset,
    reference rule) and STATISTICS_* metadata round-trips."""
    from moaray import oracle
    from moaray.sinks.kea import read_kea_full

    layout = Layout("grid3x3", 9, 64)
    path = images_path(layout)
    res = do_mosaic(path, MosaicConfig(layout=layout, blocksize=64,
                                       do_pyramids=False))
    truth = mosaic_array(res.tiles_ds, res.grid)
    out = str(tmp_path / "ov.kea")
    export_kea(res, out, blocksize=32, min_overview_size=16)
    plane, ovs, gt, nullval, crs, stats = read_kea_full(out)
    assert np.array_equal(plane, truth)
    assert len(ovs) >= 2  # 188px long axis, min 16 -> levels 4 and 8
    for li, ov in enumerate(ovs):
        lvl = 2 ** (li + 2)
        assert np.array_equal(ov, oracle.overview(truth, lvl)), lvl
    assert float(stats["min"]) == res.stats["min"]
    assert float(stats["max"]) == res.stats["max"]
    assert int(float(stats["count"])) == res.stats["count"]
