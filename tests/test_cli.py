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
