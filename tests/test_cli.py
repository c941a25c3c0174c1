"""CLI entry point (ref mainCmd/getCmdargs, mosaic.py:38-108)."""

import json

from moaray.cli import main_cmd
from moaray.testgen import Layout, images_path


def test_cli_end_to_end(tmp_path):
    path = images_path(Layout("grid3x3", 9, 64))
    out = tmp_path / "out"
    mon = tmp_path / "mon.json"
    rc = main_cmd([
        "-i", path, "-o", str(out),
        "--layout", "grid3x3,9,64", "--blocksize", "64",
        "--monitorjson", str(mon),
    ])
    assert rc == 0
    rec = json.loads(mon.read_text())
    assert rec["grid"]["num_tiles"] == 9
    assert rec["stats"]["count"] == 35156
    assert (out / "manifest").is_dir() and (out / "tiles").is_dir()

    # resume over the committed output: everything skipped
    rc = main_cmd([
        "-i", path, "-o", str(out),
        "--layout", "grid3x3,9,64", "--blocksize", "64", "--resume",
        "--monitorjson", str(mon),
    ])
    assert rc == 0
    assert json.loads(mon.read_text())["skipped_tiles"] == 9


def test_cli_reproject(tmp_path):
    path = images_path(Layout("grid3x3", 9, 64))
    out = tmp_path / "out"
    rc = main_cmd([
        "-i", path, "-o", str(out),
        "--layout", "grid3x3,9,64", "--blocksize", "64",
        "--outprojcrs", "AFFINE:0,2,0,0,0,2",
        "--resamplemethod", "near", "--nopyramids",
    ])
    assert rc == 0
    assert (out / "manifest").is_dir()


def test_cli_polar_warp_with_geokey_export(ray_session, tmp_path):
    """CLI end-to-end over a curvilinear pair from the new projection
    registry: EPSG:4326 catalog -> NSIDC polar grid via --outprojepsg,
    single-file export stamped with the EPSG GeoKey."""
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray import codecs
    from moaray.sinks.gtiff import crs_from_geokeys, read_gtiff

    size = 64
    ramp = np.tile(np.arange(size, dtype=np.uint16), (size, 1))
    ramp[:, 0] = 0
    d = tmp_path / "llcat"
    d.mkdir()
    pq.write_table(
        pa.table({
            "image_id": pa.array(["x"], pa.string()),
            "bytes": pa.array([codecs.encode(ramp, "z16")], pa.binary()),
            "w": pa.array([size], pa.int32()),
            "h": pa.array([size], pa.int32()),
            "fmt": pa.array(["z16"], pa.string()),
            "gt": pa.array([[15.0, 0.01, 0.0, 78.5, 0.0, -0.002]],
                           pa.list_(pa.float64(), 6)),
            "crs": pa.array(["EPSG:4326"], pa.string()),
            "nullval": pa.array([0.0], pa.float64()),
            "seq": pa.array([0], pa.int64()),
        }),
        str(d / "p.parquet"),
    )
    tif = str(tmp_path / "polar.tif")
    r = subprocess.run(
        [sys.executable, "-m", "moaray", "-i", str(d),
         "-o", str(tmp_path / "out"), "--blocksize", "32",
         "--outprojepsg", "3413", "--xres", "100", "--yres", "100",
         "--gtiff", tif],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    arr, _t, _nd = read_gtiff(tif)
    assert (arr != 0).sum() > 500
    with open(tif, "rb") as f:
        assert crs_from_geokeys(f.read()) == "EPSG:3413"


def test_corpus_cli_lifecycle(ray_session, tmp_path, capsys):
    """init -> append (jsonl input) -> stats -> compact --gc through the
    corpus CLI; the CLI reuses the test session's Ray (owns_ray=False)."""
    import glob
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from moaray.corpus_cli import main_cmd as corpus_cmd

    docs = pa.table({
        "doc_id": pa.array(range(12), pa.int64()),
        "text": pa.array([f"doc {i % 10}" for i in range(12)],
                         pa.string()),  # 2 internal dups
    })
    pq.write_table(docs, str(tmp_path / "docs.parquet"))
    with open(tmp_path / "new.jsonl", "w") as f:
        for i, t in [(100, "doc 3"), (101, "fresh one"),
                     (102, "fresh two")]:
            f.write(_json.dumps({"doc_id": i, "text": t}) + "\n")
    out = str(tmp_path / "store")

    assert corpus_cmd(["init", out, "-i", str(tmp_path / "docs.parquet"),
                       "-n", "4"]) == 0
    r = _json.loads(capsys.readouterr().out.strip())
    assert r["rows"] == 10

    assert corpus_cmd(["append", out, "-i", str(tmp_path / "new.jsonl"),
                       "-g", "1", "-n", "4"]) == 0
    r = _json.loads(capsys.readouterr().out.strip())
    assert r["rows"] == 2  # "doc 3" dedups against the store

    assert corpus_cmd(["stats", out]) == 0
    st = _json.loads(capsys.readouterr().out)
    assert st["visible_rows"] == 12

    assert corpus_cmd(["compact", out, "-g", "9", "-n", "4",
                       "--gc"]) == 0
    r = _json.loads(capsys.readouterr().out.strip())
    assert r["rows"] == 12 and r["superseded"] == [0, 1]
    assert all("part-g0009-" in p
               for p in glob.glob(f"{out}/part-*.parquet"))

    # missing required flags -> exit code 2
    assert corpus_cmd(["append", out, "-i", "x.parquet"]) == 2
    capsys.readouterr()


def test_cli_outprojwkt_inline(tmp_path):
    """The reference trio's third member (ref mosaic.py:60-66 outprojwkt):
    an INLINE CRS/WKT string, equivalent to --outprojcrs."""
    import numpy as np

    from moaray.pipelines.mosaic import mosaic_array
    from moaray.state.manifest import load_grid_meta, read_committed_tiles

    path = images_path(Layout("grid3x3", 9, 64))
    out_a = tmp_path / "out_a"
    out_b = tmp_path / "out_b"
    for flag, out in (("--outprojcrs", out_a), ("--outprojwkt", out_b)):
        rc = main_cmd([
            "-i", path, "-o", str(out),
            "--layout", "grid3x3,9,64", "--blocksize", "64",
            flag, "AFFINE:0,2,0,0,0,2",
            "--resamplemethod", "near", "--nopyramids",
        ])
        assert rc == 0
    grid_a, _, _ = load_grid_meta(str(out_a))
    grid_b, _, _ = load_grid_meta(str(out_b))
    assert grid_a.transform == grid_b.transform
    assert (grid_a.ncols, grid_a.nrows) == (grid_b.ncols, grid_b.nrows)
    assert grid_a.crs == grid_b.crs
    a = mosaic_array(read_committed_tiles(str(out_a)), grid_a)
    b = mosaic_array(read_committed_tiles(str(out_b)), grid_b)
    assert np.array_equal(a, b)
