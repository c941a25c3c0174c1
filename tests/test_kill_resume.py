"""Checkpoint/resume under a REAL kill (north rule: a killed job resumes
from the last committed tile set).

A subprocess runs the mosaic with the committed sink and is SIGKILLed as
soon as the first manifest record lands; a resumed run in a fresh process
must skip the committed partitions and produce the exact oracle mosaic."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_CODE = """
import sys
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False)
from moaray import MosaicConfig, do_mosaic
from moaray.testgen import Layout, images_path
layout = Layout("grid", 36, 64)
path = images_path(layout)
cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                   tiles_per_file=1)
do_mosaic(path, cfg, out_dir=sys.argv[1],
          resume=(len(sys.argv) > 2 and sys.argv[2] == "resume"))
ray.shutdown()
print("RUN-DONE")
"""


def _spawn(out_dir, resume=False):
    args = [sys.executable, "-c", RUN_CODE, out_dir] + (
        ["resume"] if resume else []
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.Popen(
        args, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )


def test_multiband_empty_tile_band_resume(tmp_path):
    """Round-1 ADVICE (medium): a kill landing between the two partitions
    carrying one EMPTY tile's bands must re-emit the uncommitted band on
    resume — the resume filter keys on (tile_id, band), never tile_id alone.
    Simulated by deleting exactly one committed (empty-tile, band 1)
    partition from a finished multiband run."""
    import ray

    from moaray import MosaicConfig, do_mosaic
    from moaray.state.manifest import committed_keys, read_committed_tiles
    from moaray.testgen import Layout, images_path

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False)
    layout = Layout("sparse_gap", 4, 64)
    path = images_path(layout, explicit_meta=True, nbands=2)
    cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                       do_stats=False, tiles_per_file=1)
    out = str(tmp_path / "out")
    res = do_mosaic(path, cfg, out_dir=out)
    keys_full = committed_keys(out)
    assert keys_full == {
        (t, b) for t in range(res.grid.num_tiles) for b in (0, 1)
    }

    rows = read_committed_tiles(out).take_all()
    empty_b1 = next(
        r for r in rows if r["n_inputs"] == 0 and r["band"] == 1
    )
    tid = empty_b1["tile_id"]
    manifest = os.path.join(out, "manifest")
    removed = 0
    for name in list(os.listdir(manifest)):
        if not name.endswith(".json"):
            continue
        rec = json.load(open(os.path.join(manifest, name)))
        if rec["keys"] == [[tid, 1]]:
            os.remove(rec["path"])
            os.remove(os.path.join(manifest, name))
            removed += 1
    assert removed == 1
    assert (tid, 1) not in committed_keys(out)
    assert (tid, 0) in committed_keys(out)  # the trap: tile_id IS committed

    res2 = do_mosaic(path, cfg, out_dir=out, resume=True)
    keys_after = committed_keys(out)
    assert (tid, 1) in keys_after
    assert keys_after == keys_full
    rows_after = read_committed_tiles(out).take_all()
    assert len(rows_after) == len(rows)


def test_sigkill_mid_run_then_resume(tmp_path):
    out = str(tmp_path / "out")
    manifest = os.path.join(out, "manifest")

    proc = _spawn(out)
    # kill as soon as the first commit lands (or give up waiting: the run
    # may finish first on a fast box — then the resume path is a no-op
    # check, still valid)
    deadline = time.monotonic() + 180
    killed = False
    while time.monotonic() < deadline and proc.poll() is None:
        if os.path.isdir(manifest) and any(
            n.endswith(".json") for n in os.listdir(manifest)
        ):
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.05)
    proc.wait(timeout=180)

    from moaray.state.manifest import committed_keys

    committed_before = committed_keys(out)
    if killed:
        # every committed record must be complete (data file exists and has
        # the advertised size) — the atomicity claim. A SIGKILL can leave
        # *.json.tmp files behind; only .json files are commits.
        for name in os.listdir(manifest):
            if not name.endswith(".json"):
                continue
            rec = json.load(open(os.path.join(manifest, name)))
            assert os.path.isfile(rec["path"])
            assert os.path.getsize(rec["path"]) == rec["bytes"]

    proc2 = _spawn(out, resume=True)
    stdout, _ = proc2.communicate(timeout=300)
    assert proc2.returncode == 0 and b"RUN-DONE" in stdout

    committed_after = committed_keys(out)
    assert committed_before <= committed_after

    # full-parity check of the resumed output against the oracle
    import ray

    from moaray import oracle
    from moaray.geo import make_output_grid
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.state.manifest import read_committed_tiles
    from moaray.testgen import Layout, metas_for_layout, pixel_array

    layout = Layout("grid", 36, 64)
    metas = metas_for_layout(layout)
    grid = make_output_grid(metas, blocksize=64)
    assert len(committed_after) == grid.num_tiles
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    truth = oracle.build_mosaic(grid, metas, arrays)
    got = mosaic_array(read_committed_tiles(out), grid)
    assert (got == truth).all()


UPDATE_RUN_CODE = """
import os, sys
import pyarrow as pa, pyarrow.parquet as pq
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False)
from moaray import MosaicConfig, do_mosaic, update_mosaic
from moaray.testgen import Layout, gen_images_table
out = sys.argv[1]
stage = sys.argv[2]  # "base" | "update"
layout = Layout("grid", 36, 64)
tbl = gen_images_table(layout)
d = os.path.dirname(out)
base_dir, upd_dir = d + "/base_cat", d + "/upd_cat"
if not os.path.isdir(base_dir):
    os.makedirs(base_dir); os.makedirs(upd_dir)
    keep = [i for i in range(36) if i != 14]
    pq.write_table(tbl.take(pa.array(keep)), base_dir + "/p.parquet")
    pq.write_table(tbl.take(pa.array([14])), upd_dir + "/p.parquet")
cfg = MosaicConfig(layout=layout, blocksize=64, do_pyramids=False,
                   do_stats=False, tiles_per_file=1)
if stage == "base":
    do_mosaic(base_dir, cfg, out_dir=out)
else:
    update_mosaic(upd_dir, cfg, out)
ray.shutdown()
print("RUN-DONE")
"""


def test_sigkill_mid_update_then_rerun(tmp_path):
    """Append-only update under a real kill: SIGKILL once the first
    new-generation record commits; the output stays readable (old
    generation), and a rerun of the SAME update converges to the append-
    order oracle mosaic."""
    out = str(tmp_path / "out")
    manifest = os.path.join(out, "manifest")

    def spawn(stage):
        env = dict(os.environ, PYTHONPATH=REPO)
        return subprocess.Popen(
            [sys.executable, "-c", UPDATE_RUN_CODE, out, stage],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )

    p = spawn("base")
    stdout, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and b"RUN-DONE" in stdout
    base_records = {
        n for n in os.listdir(manifest) if n.endswith(".json")
    }

    p = spawn("update")
    deadline = time.monotonic() + 180
    killed = False
    while time.monotonic() < deadline and p.poll() is None:
        now = {n for n in os.listdir(manifest) if n.endswith(".json")}
        if now - base_records:
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.02)
    p.wait(timeout=180)

    from moaray.state.manifest import read_committed_tiles, winning_commits

    # output must be readable mid-crash: every key still resolves
    assert len(winning_commits(out)) > 0

    p = spawn("update")
    stdout, _ = p.communicate(timeout=300)
    assert p.returncode == 0 and b"RUN-DONE" in stdout

    # final content == append-order full rebuild oracle
    import numpy as np

    import ray as _ray

    from moaray import oracle
    from moaray.geo import make_output_grid
    from moaray.pipelines.mosaic import mosaic_array
    from moaray.testgen import Layout, metas_for_layout, pixel_array

    if not _ray.is_initialized():
        _ray.init(address="local", num_cpus=4, include_dashboard=False)
    layout = Layout("grid", 36, 64)
    metas = metas_for_layout(layout)
    keep = [i for i in range(36) if i != 14]
    grid = make_output_grid([metas[i] for i in keep], blocksize=64)
    ordered = [metas[i] for i in keep] + [metas[14]]
    arrays = {m.image_id: pixel_array(i, layout) for i, m in enumerate(metas)}
    truth = oracle.build_mosaic(grid, ordered, arrays)
    got = mosaic_array(read_committed_tiles(out), grid)
    assert np.array_equal(got, truth), f"killed={killed}"
