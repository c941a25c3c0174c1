"""G.711 mu-law/A-law + IMA ADPCM: table/segment exactness against scalar
reference implementations of the published algorithms, block independence,
and the wav_decode/wav_probe/census integration."""

import numpy as np
import pyarrow as pa
import pytest

from moaray import g711
from moaray.ops.multimodal import (
    AudioFeatures,
    AudioMetadata,
    wav_decode,
    wav_encode,
    wav_encode_compressed,
    wav_probe,
)


def _ulaw_ref(x: int) -> int:
    sign = 0x80 if x < 0 else 0
    if x < 0:
        x = -x
    x = min(x, 32635) + 0x84
    expo = max(0, min(7, x.bit_length() - 8))
    mant = (x >> (expo + 3)) & 0xF
    return (~(sign | (expo << 4) | mant)) & 0xFF


def _alaw_ref(x: int) -> int:
    seg_end = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
    x >>= 3
    if x >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        x = -x - 1
    seg = 8
    for i, e in enumerate(seg_end):
        if x <= e:
            seg = i
            break
    if seg >= 8:
        return (0x7F ^ mask) & 0xFF
    aval = seg << 4
    aval |= (x >> 1) & 0xF if seg < 2 else (x >> seg) & 0xF
    return (aval ^ mask) & 0xFF


def test_g711_encode_matches_scalar_reference_exhaustive():
    xs = np.arange(-32768, 32768, dtype=np.int32)
    ref_u = np.array([_ulaw_ref(int(v)) for v in xs], dtype=np.uint8)
    ref_a = np.array([_alaw_ref(int(v)) for v in xs], dtype=np.uint8)
    assert np.array_equal(g711.ulaw_encode(xs), ref_u)
    assert np.array_equal(g711.alaw_encode(xs), ref_a)


def test_g711_code_point_roundtrip():
    codes = np.arange(256, dtype=np.uint8)
    # A-law: every code survives encode(decode(c))
    assert np.array_equal(g711.alaw_encode(g711.alaw_decode(codes)), codes)
    # mu-law has TWO zero codes (0x7F and 0xFF both decode to 0; the
    # canonical encoder emits 0xFF) — decoded values always survive
    back = g711.ulaw_encode(g711.ulaw_decode(codes))
    diff = np.nonzero(back != codes)[0]
    assert diff.tolist() == [0x7F]
    assert np.array_equal(
        g711.ulaw_decode(back), g711.ulaw_decode(codes)
    )


def test_g711_quantization_error_bounds():
    xs = np.arange(-32768, 32768, dtype=np.int32)
    for enc, dec, seg7 in ((g711.ulaw_encode, g711.ulaw_decode, 1024),
                           (g711.alaw_encode, g711.alaw_decode, 1024)):
        err = np.abs(dec(enc(xs)).astype(np.int32) - xs)
        assert err.max() <= seg7  # half the top-segment step + clip zone
        small = np.arange(-256, 256, dtype=np.int32)
        assert np.abs(
            dec(enc(small)).astype(np.int32) - small
        ).max() <= 16


def _sig(n=16000, seed=5):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (6000 * np.sin(t / 20) + 2500 * np.sin(t / 7.3)
            + rng.normal(0, 150, n)).astype(np.int16)


def _snr(x, y):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    return 10 * np.log10(np.mean(x * x) / (np.mean((x - y) ** 2) + 1e-12))


@pytest.mark.parametrize("nch", [1, 2])
def test_ima_adpcm_roundtrip_snr(nch):
    x = _sig()
    if nch == 2:
        st = np.empty((len(x), 2), np.int16)
        st[:, 0] = x
        st[:, 1] = np.roll(x, 100)
        x = st.ravel()
    data, ba, spb = g711.ima_adpcm_encode(x, nch)
    y = g711.ima_adpcm_decode(data, nch, ba)[: x.size]
    assert _snr(x, y) >= 28.0


def test_ima_adpcm_blocks_independent():
    x = _sig(4096)
    data, ba, spb = g711.ima_adpcm_encode(x, 1)
    whole = g711.ima_adpcm_decode(data, 1, ba)
    parts = [
        g711.ima_adpcm_decode(data[k: k + ba], 1, ba)
        for k in range(0, len(data), ba)
    ]
    assert np.array_equal(whole, np.concatenate(parts))


@pytest.mark.parametrize("codec,code,min_snr", [
    ("ulaw", 7, 35.0), ("alaw", 6, 35.0), ("ima_adpcm", 0x11, 28.0),
])
def test_wav_decode_compressed(codec, code, min_snr):
    x = _sig(8000)
    buf = wav_encode_compressed(x, 8000, codec=codec)
    pcm, sr = wav_decode(buf)
    assert sr == 8000 and len(pcm) == len(x)
    assert _snr(x, pcm) >= min_snr
    info = wav_probe(buf)
    assert info["fmt_code"] == code and info["channels"] == 1
    assert info["duration_s"] == 1.0


def test_wav_decode_compressed_stereo_downmix():
    x = _sig(6000)
    st = np.empty((len(x), 2), np.int16)
    st[:, 0] = x
    st[:, 1] = x  # identical channels: downmix == mono signal
    for codec in ("ulaw", "alaw", "ima_adpcm"):
        buf = wav_encode_compressed(st.ravel(), 8000, codec=codec,
                                    n_channels=2)
        pcm, sr = wav_decode(buf)
        assert len(pcm) == len(x)
        assert _snr(x, pcm) >= 28.0
        assert wav_probe(buf)["channels"] == 2


def test_compressed_wav_through_feature_and_census_stages():
    x = _sig(8000)
    tbl = pa.table({
        "clip_id": pa.array(["u", "a", "i"], pa.string()),
        "bytes": pa.array(
            [wav_encode_compressed(x, 8000, codec=c)
             for c in ("ulaw", "alaw", "ima_adpcm")],
            pa.binary(),
        ),
        "sample_rate": pa.array([8000] * 3, pa.int32()),
        "fmt": pa.array(["wav"] * 3, pa.string()),
    })
    feats = AudioFeatures()(tbl)
    assert feats.num_rows == 3
    ref = AudioFeatures()(pa.table({
        "clip_id": pa.array(["p"], pa.string()),
        "bytes": pa.array([wav_encode(x, 8000)], pa.binary()),
        "sample_rate": pa.array([8000], pa.int32()),
        "fmt": pa.array(["wav"], pa.string()),
    }))
    # compressed features track the pristine ones closely
    for col in ("rms", "peak", "zcr"):
        if col in feats.column_names:
            got = feats[col].to_numpy(zero_copy_only=False)
            want = ref[col].to_numpy(zero_copy_only=False)[0]
            assert np.abs(got - want).max() <= abs(want) * 0.1 + 1e-6

    census = AudioMetadata()(tbl)
    assert census["duration_s"].to_pylist() == [1.0, 1.0, 1.0]
    assert census["channels"].to_pylist() == [1, 1, 1]


@pytest.mark.parametrize("nch", [1, 2])
def test_ms_adpcm_roundtrip_snr(nch):
    x = _sig()
    if nch == 2:
        st = np.empty((len(x), 2), np.int16)
        st[:, 0] = x
        st[:, 1] = np.roll(x, 77)
        x = st.ravel()
    data, ba, spb = g711.ms_adpcm_encode(x, nch)
    y = g711.ms_adpcm_decode(data, nch, ba)[: x.size]
    assert _snr(x, y) >= 28.0


def test_ms_adpcm_blocks_independent():
    x = _sig(4000)
    data, ba, spb = g711.ms_adpcm_encode(x, 1)
    whole = g711.ms_adpcm_decode(data, 1, ba)
    parts = [g711.ms_adpcm_decode(data[k: k + ba], 1, ba)
             for k in range(0, len(data), ba)]
    assert np.array_equal(whole, np.concatenate(parts))


def test_ms_adpcm_seed_samples_verbatim():
    # the two header seed samples come back bit-exact regardless of the
    # quantized tail
    x = _sig(1000)
    data, ba, spb = g711.ms_adpcm_encode(x, 1)
    y = g711.ms_adpcm_decode(data, 1, ba)
    assert y[0] == x[0] and y[1] == x[1]


def _ms_block(pred_idx, delta, s1, s2, nibbles):
    """Hand-build a mono MS ADPCM block (header + packed nibbles)."""
    import struct
    # mono header: predictor(1) delta(int16) sample1(int16) sample2(int16)
    hdr = bytes([pred_idx]) + struct.pack("<hhh", delta, s1, s2)
    payload = bytearray()
    for k in range(0, len(nibbles), 2):
        payload.append(((nibbles[k] & 0xF) << 4) | (nibbles[k + 1] & 0xF))
    return hdr + bytes(payload)


@pytest.mark.parametrize("pred_idx", [1, 5, 6])
def test_ms_adpcm_truncating_division_negative_coef2(pred_idx):
    """Predictors with negative coef2 make p1*coef1 + p2*coef2 go negative;
    the spec's reference decoder truncates toward zero — floor division is
    off by one and the error compounds through p1/p2 (round-4 advice).
    Compare against a scalar reference decoder with explicit C semantics."""
    coef1, coef2 = (int(g711.MSADPCM_COEFS[pred_idx, 0]),
                    int(g711.MSADPCM_COEFS[pred_idx, 1]))
    rng = np.random.default_rng(3)
    nibbles = rng.integers(0, 16, size=98).tolist()
    delta, s1, s2 = 64, -1200, 900
    block = _ms_block(pred_idx, delta, s1, s2, nibbles)
    got = g711.ms_adpcm_decode(block, 1, len(block))

    # independent scalar reference: C truncation toward zero
    ref = [s2, s1]
    p1, p2, d = s1, s2, delta
    for nib in nibbles:
        signed = nib - 16 if nib >= 8 else nib
        t = p1 * coef1 + p2 * coef2
        pred = (abs(t) // 256) * (1 if t >= 0 else -1) + signed * d
        pred = max(-32768, min(32767, pred))
        ref.append(pred)
        p2, p1 = p1, pred
        d = max((int(g711.MSADPCM_ADAPT[nib]) * d) // 256, 16)
    assert got.tolist() == ref
    # and the floor-division variant must actually differ for this input,
    # otherwise the test proves nothing
    floor_third = ((s1 * coef1 + s2 * coef2) // 256
                   + (nibbles[0] - 16 if nibbles[0] >= 8 else nibbles[0])
                   * delta)
    t0 = s1 * coef1 + s2 * coef2
    if t0 < 0 and t0 % 256 != 0:
        assert floor_third != ref[2]


def test_wav_decode_ms_adpcm():
    x = _sig(8000)
    buf = wav_encode_compressed(x, 8000, codec="ms_adpcm")
    pcm, sr = wav_decode(buf)
    assert sr == 8000 and len(pcm) == len(x)
    assert _snr(x, pcm) >= 28.0
    info = wav_probe(buf)
    assert info["fmt_code"] == 2 and info["duration_s"] == 1.0
    # stereo through the census + downmix
    st = np.empty((len(x), 2), np.int16)
    st[:, 0] = x
    st[:, 1] = x
    buf2 = wav_encode_compressed(st.ravel(), 8000, codec="ms_adpcm",
                                 n_channels=2)
    pcm2, _ = wav_decode(buf2)
    assert len(pcm2) == len(x) and _snr(x, pcm2) >= 28.0
    assert wav_probe(buf2)["channels"] == 2
