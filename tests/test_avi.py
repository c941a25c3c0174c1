"""AVI (RIFF) container parsing + Motion-JPEG end-to-end decode.

The container layer is real (hdrl/strh/strf, movi walk, idx1 keyframes);
MJPEG payloads decode through the from-scratch moaray/jpeg.py decoder, so
`fmt == "avi"` / MJPEG-in-MP4 video is a fully real path — only foreign
codecs (xvid/h264) stay behind the declared gate.
"""

import numpy as np
import pyarrow as pa
import pytest

from moaray.avi import avi_mux, avi_parse
from moaray.jpeg import jpeg_encode
from moaray.mp4 import mp4_mux
from moaray.ops.multimodal import FrameSample, VideoMetadata
from moaray import codecs


def _frames(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.bytes(int(rng.randint(40, 400))) for _ in range(n)]


def _gray_frames(n, h=48, w=64, seed=1):
    """Smooth per-frame gradients (JPEG-friendly, so PSNR is high)."""
    rng = np.random.RandomState(seed)
    out = []
    for k in range(n):
        base = np.linspace(0, 200, w, dtype=np.float64)[None, :]
        ramp = np.linspace(0, 50, h, dtype=np.float64)[:, None]
        arr = (base + ramp + 2.0 * k + rng.uniform(0, 1)) % 255
        out.append(arr.astype(np.uint8))
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_avi_mux_parse_roundtrip():
    frames = _frames(17, seed=2)
    buf = avi_mux(frames, 320, 240, fps=25, handler="MJPG", sync_every=4)
    (s,) = avi_parse(buf)
    assert (s.fcc_type, s.handler, s.codec) == ("vids", "MJPG", "MJPG")
    assert (s.width, s.height, s.fps) == (320, 240, 25.0)
    assert len(s.sizes) == 17 and s.n_frames == 17
    for i, (off, sz) in enumerate(zip(s.offsets, s.sizes)):
        assert buf[off : off + sz] == frames[i], i
    assert [i for i, k in enumerate(s.sync) if k] == [0, 4, 8, 12, 16]


def test_avi_odd_sized_frames_pad_to_even():
    frames = [b"x" * 7, b"y" * 3, b"z" * 10]  # odd sizes force pad bytes
    buf = avi_mux(frames, 8, 8)
    (s,) = avi_parse(buf)
    for i, (off, sz) in enumerate(zip(s.offsets, s.sizes)):
        assert buf[off : off + sz] == frames[i]


def test_avi_garbage_rejected():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_parse(b"\x00" * 64)


def test_frame_sample_avi_mjpeg_decodes_for_real():
    src = _gray_frames(12)
    jpegs = [jpeg_encode(f, quality=92) for f in src]
    buf = avi_mux(jpegs, 64, 48, fps=10, handler="MJPG")
    batch = pa.table({
        "video_id": ["a0"], "bytes": [buf], "fmt": ["avi"],
    })
    out = FrameSample(stride=4)(batch)
    assert out["frame_idx"].to_pylist() == [0, 4, 8]
    assert out["fmt"].to_pylist() == ["raw16"] * 3
    for row, k in zip(range(out.num_rows), (0, 4, 8)):
        arr = codecs.decode(out["bytes"][row].as_py(), "raw16")
        assert arr.shape == (48, 64)
        assert _psnr(arr, src[k]) >= 35.0, k


def test_frame_sample_mp4_mjpeg_decodes_for_real():
    src = _gray_frames(10, seed=3)
    jpegs = [jpeg_encode(f, quality=92) for f in src]
    buf = mp4_mux(jpegs, 64, 48, codec="jpeg", samples_per_chunk=3)
    batch = pa.table({
        "video_id": ["m0"], "bytes": [buf], "fmt": ["mp4"],
    })
    out = FrameSample(stride=5)(batch)
    assert out["frame_idx"].to_pylist() == [0, 5]
    assert out["fmt"].to_pylist() == ["raw16"] * 2
    for row, k in zip(range(out.num_rows), (0, 5)):
        arr = codecs.decode(out["bytes"][row].as_py(), "raw16")
        assert _psnr(arr, src[k]) >= 35.0, k


def test_frame_sample_avi_foreign_codec_passes_through_encoded():
    frames = _frames(8, seed=5)
    buf = avi_mux(frames, 96, 64, handler="xvid")
    batch = pa.table({
        "video_id": ["x0"], "bytes": [buf], "fmt": ["avi"],
    })
    out = FrameSample(stride=3)(batch)
    assert out["fmt"].to_pylist() == ["xvid"] * 3
    assert out["w"].to_pylist() == [96] * 3
    for row, k in zip(range(out.num_rows), (0, 3, 6)):
        assert out["bytes"][row].as_py() == frames[k]


def test_frame_sample_sync_only_keyframes():
    # mp4: sync_every=5 over 20 samples -> keyframes 0,5,10,15; stride 2
    # over THOSE -> 0,10. avi: idx1 keyframes every 3 -> 0,3,6,9,12,15,18;
    # stride 3 -> 0,9,18.
    frames = _frames(20, seed=9)
    mp4_buf = mp4_mux(frames, 96, 64, samples_per_chunk=4, sync_every=5)
    avi_buf = avi_mux(frames, 96, 64, handler="xvid", sync_every=3)
    out = FrameSample(stride=2, sync_only=True)(pa.table({
        "video_id": ["m"], "bytes": [mp4_buf], "fmt": ["mp4"],
    }))
    assert out["frame_idx"].to_pylist() == [0, 10]
    assert out["bytes"][0].as_py() == frames[0]
    assert out["bytes"][1].as_py() == frames[10]
    out = FrameSample(stride=3, sync_only=True)(pa.table({
        "video_id": ["a"], "bytes": [avi_buf], "fmt": ["avi"],
    }))
    assert out["frame_idx"].to_pylist() == [0, 9, 18]


def test_gif_census_matches_decode():
    from moaray.gif import gif_census, gif_encode, gif_frames

    frames = [
        np.full((6, 9, 3), 30 * k, np.uint8) for k in range(4)
    ]
    buf = gif_encode(frames, delays_cs=[10, 20, 30, 40])
    info = gif_census(buf)
    assert (info["width"], info["height"]) == (9, 6)
    assert info["n_frames"] == sum(1 for _ in gif_frames(buf)) == 4
    assert info["duration_s"] == 1.0


def test_video_metadata_census_mixed_containers():
    from moaray.gif import gif_encode
    from moaray.ops.multimodal import mvid_encode

    src = _gray_frames(6)
    jpegs = [jpeg_encode(f, quality=90) for f in src]
    gif_buf = gif_encode(
        [np.full((5, 7, 3), 40 * k, np.uint8) for k in range(3)],
        delays_cs=[50, 50, 50],
    )
    mvid_buf = mvid_encode(
        [np.full((4, 4), k, np.uint16) for k in range(9)])
    batch = pa.table({
        "video_id": ["mp4-0", "avi-0", "gif-0", "mvid-0"],
        "bytes": [
            mp4_mux(jpegs, 64, 48, codec="jpeg", fps=30,
                    samples_per_chunk=2, sync_every=3),
            avi_mux(jpegs, 64, 48, fps=12, handler="MJPG", sync_every=2),
            gif_buf,
            mvid_buf,
        ],
        "fmt": ["mp4", "avi", "gif", "mvid"],
    })
    out = VideoMetadata()(batch)
    rec = {r["video_id"]: r for r in out.to_pylist()}
    m = rec["mp4-0"]
    assert (m["codec"], m["width"], m["height"]) == ("jpeg", 64, 48)
    assert m["n_frames"] == 6 and m["n_keyframes"] == 2  # sync 1,4 (0,3)
    assert m["fps"] == pytest.approx(30.0)
    a = rec["avi-0"]
    assert (a["codec"], a["n_frames"], a["fps"]) == ("MJPG", 6, 12.0)
    assert a["n_keyframes"] == 3 and a["duration_s"] == pytest.approx(0.5)
    g = rec["gif-0"]
    assert (g["codec"], g["n_frames"]) == ("gif-lzw", 3)
    assert g["duration_s"] == pytest.approx(1.5)
    v = rec["mvid-0"]
    assert (v["codec"], v["n_frames"], v["width"]) == ("mray-raw", 9, 4)


def test_video_metadata_skip_vs_raise():
    batch = pa.table({
        "video_id": ["bad"], "bytes": [b"\x00" * 32], "fmt": ["mp4"],
    })
    with pytest.raises(ValueError):
        VideoMetadata()(batch)
    out = VideoMetadata(errors="skip")(batch)
    assert out.num_rows == 0
    # declared gates still raise even under errors='skip'
    gated = pa.table({
        "video_id": ["g"], "bytes": [b"\x00" * 8], "fmt": ["webm"],
    })
    with pytest.raises(NotImplementedError):
        VideoMetadata(errors="skip")(gated)
