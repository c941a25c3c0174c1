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


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    n_colors=st.integers(min_value=1, max_value=256),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_colors, interlace, seed):
    from moaray.gif import gif_decode, gif_encode

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    img = palette[rng.randint(0, n_colors, (h, w))]
    assert np.array_equal(gif_decode(gif_encode(img, interlace=interlace)),
                          img)


@settings(max_examples=10, deadline=None)
@given(
    n_frames=st.integers(min_value=1, max_value=12),
    spc=st.integers(min_value=1, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_mp4_sample_table_property(n_frames, spc, seed):
    from moaray.mp4 import mp4_mux, mp4_parse

    rng = np.random.RandomState(seed)
    frames = [rng.bytes(int(rng.randint(1, 300))) for _ in range(n_frames)]
    buf = mp4_mux(frames, 64, 48, samples_per_chunk=spc)
    (t,) = mp4_parse(buf)
    assert len(t.offsets) == n_frames
    for i, (off, sz) in enumerate(zip(t.offsets, t.sizes)):
        assert buf[off : off + sz] == frames[i]


@settings(max_examples=12, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=20),
    w=st.integers(min_value=1, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_roundtrip_property(h, w, seed):
    from moaray.codecs import bmp_decode, bmp_encode

    rng = np.random.RandomState(seed)
    rgb = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb)


@settings(max_examples=10, deadline=None)
@given(
    nbands=st.integers(min_value=1, max_value=4),
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    comp=st.sampled_from([None, "deflate", "lzw"]),
    big=st.booleans(),
)
def test_gtiff_any_bands_roundtrip_property(nbands, h, w, seed, comp, big,
                                            tmp_path_factory):
    import os

    from moaray.sinks.gtiff import read_gtiff, write_gtiff

    rng = np.random.RandomState(seed)
    shape = (h, w) if nbands == 1 else (nbands, h, w)
    arr = (rng.rand(*shape) * 60000).astype(np.uint16)
    gt = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    p = os.path.join(str(tmp_path_factory.mktemp("g")), "x.tif")
    write_gtiff(p, arr, gt, compress=comp, bigtiff=big)
    back, t, _ = read_gtiff(p)
    assert np.array_equal(back, arr) and t == gt
