"""Property tests for the late-round-3 codecs: arbitrary inputs, hard
invariants (lossless round trips; progressive == baseline)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=4000))
def test_lzw_roundtrip_property(raw):
    from moaray.sinks.gtiff import _lzw_decode, _lzw_encode

    assert _lzw_decode(_lzw_encode(raw)) == raw


@settings(max_examples=30, deadline=None)
@given(st.binary(max_size=4000))
def test_packbits_roundtrip_property(raw):
    from moaray.sinks.gtiff import _packbits_decode, _packbits_encode

    assert _packbits_decode(_packbits_encode(raw)) == raw


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=5000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    stereo=st.booleans(),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_flac_roundtrip_property(n, seed, stereo, rate):
    from moaray.flac import flac_decode, flac_encode

    rng = np.random.RandomState(seed)
    shape = (n, 2) if stereo else (n,)
    x = rng.randint(-32768, 32768, shape).astype(np.int16)
    if n == 0:
        return  # empty streams carry no frames; nothing to assert
    y, sr = flac_decode(flac_encode(x, rate))
    assert sr == rate
    assert np.array_equal(x, y)


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    quality=st.sampled_from([30, 75, 95]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_progressive_equals_baseline_property(h, w, quality, seed):
    from moaray.jpeg import jpeg_decode, jpeg_encode
    from moaray.jpeg_progressive import jpeg_encode_progressive

    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w) * 255).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(img, quality=quality))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=quality))
    assert np.array_equal(base, prog)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    channels=st.sampled_from([1, 2, 3, 4]),
    bit16=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_adam7_decode_property(h, w, channels, bit16, seed):
    from tests.test_png_color import _adam7_png

    from moaray import codecs

    rng = np.random.RandomState(seed)
    dt = np.uint16 if bit16 else np.uint8
    peak = 65535 if bit16 else 255
    shape = (h, w, channels) if channels > 1 else (h, w)
    arr = (rng.rand(*shape) * peak).astype(dt)
    assert np.array_equal(codecs.png_decode(_adam7_png(arr)), arr)
