"""FLAC codec: lossless round trips + foreign-stream decoder paths.

The encoder is a subset (FIXED/equivalent-LPC, mid/side, partition order
0); the decoder handles what real FLAC encoders emit. Foreign-stream
tests hand-build frames with features our encoder never produces —
left/side and right/side decorrelation, VERBATIM subframes, partition
order > 0, escape (raw-bit) partitions, rice2 coding, wasted bits.
"""

import struct

import numpy as np
import pytest

from moaray.flac import (
    _MAGIC,
    _SYNC,
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_number,
    _zigzag,
    flac_decode,
    flac_encode,
)


@pytest.mark.parametrize("name,gen", [
    ("sine", lambda t: (np.sin(t / 30) * 8000).astype(np.int16)),
    ("noise", lambda t: np.random.RandomState(0)
        .randint(-32768, 32768, len(t)).astype(np.int16)),
    ("silence", lambda t: np.zeros(len(t), np.int16)),
    ("extremes", lambda t: np.resize(
        np.array([32767, -32768], np.int16), len(t))),
])
def test_mono_roundtrip(name, gen):
    x = gen(np.arange(9000))
    y, sr = flac_decode(flac_encode(x, 16000))
    assert sr == 16000
    assert np.array_equal(x, y), name


@pytest.mark.parametrize("n", [1, 3, 4095, 4096, 4097, 12000])
def test_block_boundaries(n):
    rng = np.random.RandomState(n)
    x = rng.randint(-2000, 2000, n).astype(np.int16)
    y, _ = flac_decode(flac_encode(x, 8000))
    assert np.array_equal(x, y)


def test_utf8_frame_number_boundaries():
    """Frame-number coding capacity: an nbytes UTF-8 sequence carries
    1 + 5*nbytes payload bits (NOT 6 + 4*nbytes — the old test let
    [2048, 16384) overflow the 2-byte lead, corrupting the header CRC
    for any stream with >= 2048 frames)."""
    from moaray.flac import _BitReader, _read_utf8_number

    for n in (0, 127, 128, 2047, 2048, 16383, 16384, 65535, 65536,
              (1 << 31) - 1, (1 << 36) - 1):
        b = _utf8_number(n)
        assert _read_utf8_number(_BitReader(b)) == n, n
    assert len(_utf8_number(2047)) == 2
    assert len(_utf8_number(2048)) == 3  # overflowed to 2 bytes pre-fix


def test_roundtrip_past_2048_frames():
    """Streams with >= 2048 frames (3+ min at 44.1 kHz/4096, or any long
    stream at small block sizes) hit 3-byte UTF-8 frame numbers; decode
    used to fail with a frame-header CRC-8 mismatch."""
    rng = np.random.RandomState(4)
    x = rng.randint(-3000, 3000, 2050 * 256).astype(np.int16)
    y, _ = flac_decode(flac_encode(x, 8000, block_size=256))
    assert np.array_equal(x, y)


def test_stereo_mid_side_roundtrip():
    t = np.arange(12000)
    st = np.stack([(np.sin(t / 25) * 9000).astype(np.int16),
                   (np.sin(t / 40 + 1) * 7000).astype(np.int16)], axis=1)
    y, sr = flac_decode(flac_encode(st, 44100))
    assert sr == 44100 and np.array_equal(st, y)
    rng = np.random.RandomState(1)
    sn = rng.randint(-32768, 32768, (8192, 2)).astype(np.int16)
    y, _ = flac_decode(flac_encode(sn, 8000))
    assert np.array_equal(sn, y)  # side channel spans 17 bits


# ---------------------------------------------------------------------------
# foreign streams
# ---------------------------------------------------------------------------

def _streaminfo(bs, rate, nch, bps, total):
    si = struct.pack(">HH", bs, bs) + b"\x00\x00\x00" * 2
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    si += packed.to_bytes(8, "big") + b"\x00" * 16
    return _MAGIC + bytes([0x80]) + len(si).to_bytes(3, "big") + si


def _verbatim(bw, x, bps):
    bw.write(0, 1)
    bw.write(1, 6)
    bw.write(0, 1)
    for v in x.tolist():
        bw.write(int(v), bps)


def _finish(header, bw):
    bw.align()
    frame = bytes(bw.out)
    return header + frame + struct.pack(">H", _crc16(frame))


def test_left_side_and_right_side():
    rng = np.random.RandomState(3)
    lr = rng.randint(-1000, 1000, (8, 2)).astype(np.int64)
    for ch_code in (8, 9):
        bw = _BitWriter()
        bw.write(_SYNC, 14)
        bw.write(0, 2)
        bw.write(6, 4)
        bw.write(0, 4)
        bw.write(ch_code, 4)
        bw.write(0b100, 3)
        bw.write(0, 1)
        bw.write(_utf8_number(0)[0], 8)
        bw.write(8 - 1, 8)  # blocksize-1
        bw.write(_crc8(bytes(bw.out)), 8)
        side = lr[:, 0] - lr[:, 1]
        if ch_code == 8:   # left/side
            _verbatim(bw, lr[:, 0], 16)
            _verbatim(bw, side, 17)
        else:              # right/side
            _verbatim(bw, side, 17)
            _verbatim(bw, lr[:, 1], 16)
        buf = _streaminfo(8, 8000, 2, 16, 8) + _finish(b"", bw)
        y, _ = flac_decode(buf)
        assert np.array_equal(y, lr.astype(np.int16)), ch_code


def test_partition_order_escape_and_rice2():
    # FIXED order 0, partition order 1: partition A rice2-coded, partition
    # B escape-coded raw 12-bit
    rng = np.random.RandomState(5)
    x = rng.randint(-1500, 1500, 16).astype(np.int64)
    bw = _BitWriter()
    bw.write(_SYNC, 14)
    bw.write(0, 2)
    bw.write(6, 4)   # 8-bit blocksize-1 at end
    bw.write(0, 4)
    bw.write(0, 4)   # mono
    bw.write(0b100, 3)
    bw.write(0, 1)
    bw.write(_utf8_number(0)[0], 8)
    bw.write(16 - 1, 8)
    bw.write(_crc8(bytes(bw.out)), 8)
    bw.write(0, 1)
    bw.write(0b001000, 6)  # FIXED order 0
    bw.write(0, 1)
    bw.write(1, 2)   # rice2 (5-bit params)
    bw.write(1, 4)   # partition order 1 -> two partitions of 8
    k = 6
    bw.write(k, 5)
    for u in _zigzag(x[:8]).tolist():
        bw.write_unary(u >> k)
        bw.write(u & ((1 << k) - 1), k)
    bw.write(31, 5)  # escape
    bw.write(12, 5)  # raw 12-bit residuals
    for v in x[8:].tolist():
        bw.write(int(v), 12)
    buf = _streaminfo(16, 8000, 1, 16, 16) + _finish(b"", bw)
    y, _ = flac_decode(buf)
    assert np.array_equal(y, x.astype(np.int16))


def test_wasted_bits():
    # samples all divisible by 4: encode with 2 wasted bits
    x = (np.arange(8, dtype=np.int64) - 4) * 4
    bw = _BitWriter()
    bw.write(_SYNC, 14)
    bw.write(0, 2)
    bw.write(6, 4)
    bw.write(0, 4)
    bw.write(0, 4)
    bw.write(0b100, 3)
    bw.write(0, 1)
    bw.write(_utf8_number(0)[0], 8)
    bw.write(8 - 1, 8)
    bw.write(_crc8(bytes(bw.out)), 8)
    bw.write(0, 1)
    bw.write(1, 6)          # VERBATIM
    bw.write(1, 1)          # wasted bits flag
    bw.write(1, 2)          # unary 1 -> wasted = 2
    for v in (x >> 2).tolist():
        bw.write(int(v), 14)  # bps - wasted
    buf = _streaminfo(8, 8000, 1, 16, 8) + _finish(b"", bw)
    y, _ = flac_decode(buf)
    assert np.array_equal(y, x.astype(np.int16))


def test_crc_rejection_and_garbage():
    x = np.arange(100, dtype=np.int16)
    buf = bytearray(flac_encode(x, 8000))
    buf[-1] ^= 0xFF  # corrupt the last frame's CRC-16
    with pytest.raises(ValueError, match="CRC-16"):
        flac_decode(bytes(buf))
    with pytest.raises(ValueError, match="not a FLAC"):
        flac_decode(b"AAAA")


def test_audio_features_flac():
    import pyarrow as pa

    from moaray.flac import flac_encode
    from moaray.ops.multimodal import AudioFeatures

    t = np.arange(16000)
    mono = (np.sin(t / 20) * 10000).astype(np.int16)
    stereo = np.stack([mono, -mono], axis=1)
    batch = pa.table({
        "clip_id": ["m", "s"],
        "bytes": [flac_encode(mono, 16000), flac_encode(stereo, 16000)],
        "fmt": ["flac", "flac"],
        "sample_rate": pa.array([16000, 16000], pa.int32()),
    })
    out = AudioFeatures()(batch)
    assert out.num_rows == 2
    assert out["duration_s"][0].as_py() == 1.0
    # stereo downmix of (x, -x) is ~silence
    assert out["rms"][1].as_py() < 0.001


def test_probes_and_audio_metadata():
    import pyarrow as pa

    from moaray.flac import flac_probe, mp3_probe
    from moaray.ops.multimodal import AudioMetadata, wav_encode

    t = np.arange(8000)
    x = (np.sin(t / 15) * 5000).astype(np.int16)
    fbuf = flac_encode(x, 8000)
    info = flac_probe(fbuf)
    assert info == {"sample_rate": 8000, "channels": 1, "bits": 16,
                    "n_samples": 8000, "duration_s": 1.0}
    # spec-framed mp3 (valid MPEG-1 Layer III headers, junk payloads)
    rng = np.random.RandomState(0)
    def mp3_frame(pad):
        h = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
             | (9 << 12) | (0 << 10) | (pad << 9))
        ln = 144 * 128 * 1000 // 44100 + pad
        return h.to_bytes(4, "big") + rng.bytes(ln - 4)
    mbuf = b"".join(mp3_frame(i % 2) for i in range(19))
    m = mp3_probe(mbuf)
    assert m["sample_rate"] == 44100 and m["n_frames"] == 19

    batch = pa.table({
        "clip_id": ["w", "f", "m", "p"],
        "bytes": [wav_encode(x, 8000), fbuf, mbuf, x.tobytes()],
        "fmt": ["wav", "flac", "mp3", "pcm16"],
        "sample_rate": pa.array([8000] * 4, pa.int32()),
    })
    out = AudioMetadata()(batch)
    assert out.num_rows == 4
    assert out["duration_s"].to_pylist()[:2] == [1.0, 1.0]
    assert out["sample_rate"].to_pylist() == [8000, 8000, 44100, 8000]


def test_metadata_census_true_channel_counts():
    """The census must report the CONTAINER's channel count from the
    fmt/COMM header, not the downmixed mono shape the decode paths
    produce (stereo WAV used to be reported as 1-channel)."""
    import pyarrow as pa

    from moaray.ops.multimodal import AudioMetadata, aiff_probe, wav_probe

    x = (np.sin(np.arange(4000) / 9) * 9000).astype(np.int16)
    inter = np.stack([x, -x], axis=1).reshape(-1)  # stereo interleave
    wbuf = _wav(1, 16, 8000, inter.astype("<i2").tobytes(), nch=2)
    abuf = _aiff(16, 8000, inter.astype(">i2").tobytes(), nch=2)
    assert wav_probe(wbuf) == {"sample_rate": 8000, "channels": 2,
                               "bits": 16, "fmt_code": 1,
                               "duration_s": 0.5}
    ap = aiff_probe(abuf)
    assert (ap["channels"], ap["sample_rate"], ap["duration_s"]) == (
        2, 8000, 0.5)
    out = AudioMetadata()(pa.table({
        "clip_id": ["w2", "a2"],
        "bytes": [wbuf, abuf],
        "fmt": ["wav", "aiff"],
        "sample_rate": pa.array([8000, 8000], pa.int32()),
    }))
    assert out["channels"].to_pylist() == [2, 2]
    assert out["duration_s"].to_pylist() == [0.5, 0.5]


def _wav(fmt_code, bits, sr, payload, nch=1, extensible_sub=None):
    import struct

    fmt = struct.pack("<HHIIHH", fmt_code, nch, sr, sr * nch * bits // 8,
                      nch * bits // 8, bits)
    if extensible_sub is not None:
        guid = (struct.pack("<H", extensible_sub) + b"\x00\x00"
                + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71")
        fmt += struct.pack("<HHI", 22, bits, 0) + guid
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_bit_depths_and_float():
    """Real-world WAV flavors: 8/16/24/32-bit integer PCM, IEEE float32,
    and the WAVE_FORMAT_EXTENSIBLE wrapper — all normalize to int16."""
    from moaray.ops.multimodal import wav_decode, wav_encode

    x = (np.sin(np.arange(2000) / 9) * 12000).astype(np.int16)
    assert np.array_equal(wav_decode(wav_encode(x, 8000))[0], x)
    # float32
    f = (x.astype(np.float32) / 32767.0).astype("<f4")
    pcm, sr = wav_decode(_wav(3, 32, 16000, f.tobytes()))
    assert sr == 16000 and np.abs(pcm.astype(int) - x.astype(int)).max() <= 1
    # 24-bit packed
    v = x.astype(np.int64) << 8
    u = np.where(v < 0, v + (1 << 24), v)
    raw = np.zeros((len(u), 3), np.uint8)
    raw[:, 0] = u & 0xFF
    raw[:, 1] = (u >> 8) & 0xFF
    raw[:, 2] = (u >> 16) & 0xFF
    assert np.array_equal(wav_decode(_wav(1, 24, 8000, raw.tobytes()))[0], x)
    # 8-bit unsigned (coarse) + 32-bit int (exact)
    e8 = ((x.astype(np.int64) // 256) + 128).astype(np.uint8)
    pcm, _ = wav_decode(_wav(1, 8, 8000, e8.tobytes()))
    assert np.abs(pcm.astype(int) - x.astype(int)).max() <= 256
    assert np.array_equal(
        wav_decode(_wav(1, 32, 8000, (x.astype("<i4") << 16).tobytes()))[0],
        x,
    )
    # EXTENSIBLE wrapper with float SubFormat
    pcm, _ = wav_decode(
        _wav(0xFFFE, 32, 8000, f.tobytes(), extensible_sub=3)
    )
    assert np.abs(pcm.astype(int) - x.astype(int)).max() <= 1
    # truly compressed stays gated (fmt 2/6/7/0x11 decode for real now —
    # GSM 6.10 is the remaining honest gate)
    with pytest.raises(NotImplementedError, match="compressed WAV"):
        wav_decode(_wav(0x31, 0, 8000, b"\x00" * 64))  # GSM 6.10


def test_24bit_flac_scales_to_int16():
    # hand-built 24-bit mono VERBATIM frame: samples scale down by 8 bits
    rng = np.random.RandomState(9)
    x24 = rng.randint(-(1 << 23), 1 << 23, 16).astype(np.int64)
    bw = _BitWriter()
    bw.write(_SYNC, 14)
    bw.write(0, 2)
    bw.write(6, 4)       # 8-bit blocksize-1 at end
    bw.write(0, 4)
    bw.write(0, 4)       # mono
    bw.write(0b110, 3)   # 24 bps
    bw.write(0, 1)
    bw.write(_utf8_number(0)[0], 8)
    bw.write(16 - 1, 8)
    bw.write(_crc8(bytes(bw.out)), 8)
    _verbatim(bw, x24, 24)
    buf = _streaminfo(16, 8000, 1, 24, 16) + _finish(b"", bw)
    y, sr = flac_decode(buf)
    assert sr == 8000
    assert np.array_equal(y.astype(np.int64), x24 >> 8)


def _aiff(bits, sr, payload, nch=1):
    import math
    import struct

    if sr:
        exp = int(math.floor(math.log2(sr)))
        mant = int(sr / 2.0 ** exp * (1 << 63))
        ext = struct.pack(">HQ", 16383 + exp, mant)
    else:
        ext = bytes(10)
    n_frames = len(payload) // (nch * max(bits // 8, 1))
    comm = struct.pack(">HIH", nch, n_frames, bits) + ext
    ssnd = struct.pack(">II", 0, 0) + payload
    body = (b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
            + b"SSND" + struct.pack(">I", len(ssnd)) + ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


def test_aiff_decode_and_stage():
    """AIFF (big-endian PCM, 80-bit extended-float sample rate): 16/24-bit
    decode, stereo downmix, and the audio stages accept fmt='aiff'."""
    import pyarrow as pa

    from moaray.ops.multimodal import AudioFeatures, AudioMetadata, aiff_decode

    x = (np.sin(np.arange(3000) / 7) * 9000).astype(np.int16)
    pcm, sr = aiff_decode(_aiff(16, 44100, x.astype(">i2").tobytes()))
    assert sr == 44100 and np.array_equal(pcm, x)
    v = x.astype(np.int64) << 8
    u = np.where(v < 0, v + (1 << 24), v)
    raw = np.zeros((len(u), 3), np.uint8)
    raw[:, 0] = (u >> 16) & 0xFF
    raw[:, 1] = (u >> 8) & 0xFF
    raw[:, 2] = u & 0xFF
    pcm, _ = aiff_decode(_aiff(24, 8000, raw.tobytes()))
    assert np.array_equal(pcm, x)
    batch = pa.table({
        "clip_id": ["a"],
        "bytes": [_aiff(16, 8000, x.astype(">i2").tobytes())],
        "fmt": ["aiff"],
        "sample_rate": pa.array([0], pa.int32()),
    })
    feats = AudioFeatures()(batch)
    assert feats["duration_s"][0].as_py() == round(len(x) / 8000, 4)
    meta = AudioMetadata()(batch)
    assert meta["sample_rate"][0].as_py() == 8000
