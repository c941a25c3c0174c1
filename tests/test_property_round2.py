"""Hypothesis property tests over the round-2 kernels (codecs, world
files, resample) — mirrors tests/test_property_geo.py's strategy for the
planning math."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from moaray import codecs
from moaray.sources.files import read_world_file
from moaray.stages.reproject import warp_window

DTYPES = ["uint8", "uint16", "int16", "int32", "uint32", "float32", "float64"]


@settings(max_examples=40, deadline=None)
@given(
    dtype=st.sampled_from(DTYPES),
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    fmt=st.sampled_from(["raw16", "z16"]),
)
def test_codec_roundtrip_property(dtype, h, w, seed, fmt):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(h, w) * 250).astype(dtype)
    back = codecs.decode(codecs.encode(arr, fmt))
    assert back.dtype == np.dtype(dtype)
    assert np.array_equal(back, arr)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
    bits=st.sampled_from([8, 16]),
)
def test_png_roundtrip_property(h, w, seed, bits):
    rng = np.random.RandomState(seed)
    dt = np.uint8 if bits == 8 else np.uint16
    arr = (rng.rand(h, w) * (2**bits - 1)).astype(dt)
    assert np.array_equal(codecs.decode(codecs.encode(arr, "png")), arr)


@settings(max_examples=30, deadline=None)
@given(
    top=st.integers(0, 20),
    left=st.integers(0, 20),
    ys=st.integers(1, 20),
    xs=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_raw_window_decode_property(top, left, ys, xs, seed):
    rng = np.random.RandomState(seed)
    arr = (rng.rand(48, 48) * 1000).astype(np.uint16)
    buf = codecs.encode(arr, "raw16")
    win = codecs.decode_window(buf, top, left, ys, xs)
    assert np.array_equal(win, arr[top : top + ys, left : left + xs])


@settings(max_examples=30, deadline=None)
@given(
    a=st.floats(0.5, 50.0),
    e=st.floats(-50.0, -0.5),
    cx=st.floats(-1e6, 1e6),
    cy=st.floats(-1e6, 1e6),
)
def test_world_file_center_to_corner_property(tmp_path_factory, a, e, cx, cy):
    """World files store the CENTER of the top-left pixel; the derived
    geotransform corner must sit exactly half a pixel step back."""
    p = tmp_path_factory.mktemp("wld") / "f.wld"
    p.write_text(f"{a!r}\n0.0\n0.0\n{e!r}\n{cx!r}\n{cy!r}\n")
    gt = read_world_file(str(p))
    assert gt[1] == a and gt[5] == e
    # corner + half-step == center again
    assert gt[0] + a / 2.0 == pytest.approx(cx, rel=0, abs=1e-9 * max(abs(cx), 1))
    assert gt[3] + e / 2.0 == pytest.approx(cy, rel=0, abs=1e-9 * max(abs(cy), 1))


@settings(max_examples=20, deadline=None)
@given(
    scale=st.sampled_from([2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_average_downsample_property(scale, seed):
    """k-fold axis-aligned average == independent k x k block mean for any
    integer factor that divides the source."""
    rng = np.random.RandomState(seed)
    h = w = scale * 8
    src = (rng.rand(h, w) * 1000 + 1).astype(np.float64)
    px_map = (0.0, float(scale), 0.0, 0.0, 0.0, float(scale))
    out = warp_window(
        src, px_map, 0, 0, h // scale, w // scale, float("nan"), "average"
    )
    expected = src.reshape(h // scale, scale, w // scale, scale).mean(axis=(1, 3))
    assert np.allclose(out, expected)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_cubic_identity_property(seed):
    rng = np.random.RandomState(seed)
    src = (rng.rand(20, 20) * 60000).astype(np.uint16)
    out = warp_window(
        src, (0.0, 1.0, 0.0, 0.0, 0.0, 1.0), 0, 0, 20, 20, np.uint16(0),
        "cubic",
    )
    assert np.array_equal(out[2:18, 2:18], src[2:18, 2:18])


# ---------------------------------------------------------------------------
# Transverse Mercator (round 3): property-based roundtrip
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    lat=st.floats(min_value=-84.0, max_value=84.0),
    lon_off=st.floats(min_value=-6.0, max_value=6.0),
    south=st.booleans(),
)
def test_tm_roundtrip_property(lat, lon_off, south):
    """inverse(forward(p)) == p to ~1e-9 deg for any point within +-6 deg of
    the central meridian across the UTM latitude band."""
    import numpy as np

    from moaray.tmerc import tm_forward, tm_inverse

    lon0 = 153.0
    fn = 1e7 if south else 0.0
    e, n = tm_forward(np.array([lat]), np.array([lon0 + lon_off]), lon0,
                      false_n=fn)
    la, lo = tm_inverse(e, n, lon0, false_n=fn)
    assert abs(la[0] - lat) < 1e-9
    assert abs(lo[0] - (lon0 + lon_off)) < 1e-9
