"""MP4 container parsing (ISO/IEC 14496-12): sample tables -> byte ranges.

The container layer is real (box walk, tkhd/mdhd/stsd, stts/stsc/stsz/
stco/stss resolution); codec-payload decode stays the declared gate.
"""

import numpy as np
import pyarrow as pa
import pytest

from moaray.mp4 import mp4_mux, mp4_parse


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.bytes(int(rng.randint(40, 400))) for _ in range(n)]


def test_mux_parse_roundtrip():
    frames = _frames(23)
    buf = mp4_mux(frames, 320, 240, fps=30, samples_per_chunk=5, sync_every=5)
    (t,) = mp4_parse(buf)
    assert (t.codec, t.handler, t.width, t.height) == ("avc1", "vide", 320, 240)
    assert t.timescale == 3000 and t.track_id == 1
    for i, (off, sz) in enumerate(zip(t.offsets, t.sizes)):
        assert buf[off : off + sz] == frames[i], i
    assert t.timestamps == [i * 100 for i in range(23)]
    assert [i for i, s in enumerate(t.sync) if s] == [0, 5, 10, 15, 20]


@pytest.mark.parametrize("n,spc", [(1, 1), (7, 3), (30, 30)])
def test_chunking_shapes(n, spc):
    frames = _frames(n, seed=n)
    buf = mp4_mux(frames, 64, 48, samples_per_chunk=spc)
    (t,) = mp4_parse(buf)
    assert len(t.offsets) == n
    for i, (off, sz) in enumerate(zip(t.offsets, t.sizes)):
        assert buf[off : off + sz] == frames[i]


def test_garbage_rejected():
    with pytest.raises(ValueError, match="no moov"):
        mp4_parse(b"\x00" * 64)


def test_frame_sample_mp4():
    from moaray.ops.multimodal import FrameSample

    frames = _frames(20, seed=3)
    buf = mp4_mux(frames, 128, 96, samples_per_chunk=4)
    batch = pa.table({
        "video_id": ["v0"],
        "bytes": [buf],
        "fmt": ["mp4"],
    })
    out = FrameSample(stride=5)(batch)
    assert out.num_rows == 4
    assert out["frame_idx"].to_pylist() == [0, 5, 10, 15]
    assert out["fmt"].to_pylist() == ["avc1"] * 4
    assert out["w"][0].as_py() == 128 and out["h"][0].as_py() == 96
    for row, k in zip(out["bytes"].to_pylist(), (0, 5, 10, 15)):
        assert row == frames[k]  # exact encoded sample bytes
