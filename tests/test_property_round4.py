"""Hypothesis properties for the round-4 continuation surfaces: S2 cell
index, G.711/ADPCM codecs, Douglas-Peucker, segment chaining."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from moaray import g711, s2


@settings(max_examples=40, deadline=None)
@given(
    lat=st.floats(-89.99, 89.99),
    lng=st.floats(-180.0, 180.0),
    level=st.integers(0, 30),
)
def test_s2_parent_of_leaf_is_cell_at_level(lat, lng, level):
    leaf = s2.cell_from_latlng(np.asarray([lat]), np.asarray([lng]), 30)
    direct = s2.cell_from_latlng(np.asarray([lat]), np.asarray([lng]), level)
    assert s2.cell_parent(leaf, level)[0] == direct[0]
    assert int(s2.cell_level(direct)[0]) == level


@settings(max_examples=30, deadline=None)
@given(
    face=st.integers(0, 5),
    level=st.integers(1, 30),
    data=st.data(),
)
def test_s2_face_ij_roundtrip_property(face, level, data):
    n = 1 << level
    i = data.draw(st.integers(0, n - 1))
    j = data.draw(st.integers(0, n - 1))
    cid = s2.cell_from_face_ij(
        np.asarray([face]), np.asarray([i]), np.asarray([j]), level
    )
    f2, i2, j2, l2 = s2.cell_to_face_ij(cid)
    assert (int(f2[0]), int(i2[0]), int(j2[0]), int(l2[0])) == (
        face, i, j, level
    )


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=500))
def test_g711_decoded_value_fixpoint(xs):
    x = np.asarray(xs, dtype=np.int32)
    for enc, dec in ((g711.ulaw_encode, g711.ulaw_decode),
                     (g711.alaw_encode, g711.alaw_decode)):
        once = dec(enc(x))
        twice = dec(enc(once))
        assert np.array_equal(once, twice)  # companding is idempotent


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(-30000, 30000), min_size=2, max_size=2500),
    st.sampled_from([1, 2]),
)
def test_ima_adpcm_decode_encode_decode_stable(xs, nch):
    x = np.asarray(xs[: len(xs) - len(xs) % nch], dtype=np.int16)
    if x.size < nch:
        x = np.zeros(nch, dtype=np.int16)
    data, ba, _ = g711.ima_adpcm_encode(x, nch, samples_per_block=65)
    y = g711.ima_adpcm_decode(data, nch, ba)
    data2, ba2, _ = g711.ima_adpcm_encode(y, nch, samples_per_block=65)
    z = g711.ima_adpcm_decode(data2, nch, ba2)
    # re-encoding a decodable signal stays close (quantizer fixpoint-ish)
    assert np.abs(y.astype(int) - z.astype(int)).mean() < 300


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(-100, 100, allow_nan=False),
                  st.floats(-100, 100, allow_nan=False)),
        min_size=2, max_size=120,
    ),
    st.floats(0.01, 10.0),
)
def test_dp_chord_invariant_property(pts, tol):
    from moaray.ops.vector import simplify_polyline

    arr = np.asarray(pts, dtype=np.float64)
    keep = simplify_polyline(arr, tol)
    assert keep[0] == 0 and keep[-1] == len(arr) - 1
    for k in range(len(keep) - 1):
        a, b = keep[k], keep[k + 1]
        d = arr[b] - arr[a]
        norm = np.hypot(d[0], d[1])
        for i in range(a + 1, b):
            if norm == 0.0:
                dist = float(np.hypot(*(arr[i] - arr[a])))
            else:
                dist = abs((arr[i, 0] - arr[a, 0]) * d[1]
                           - (arr[i, 1] - arr[a, 1]) * d[0]) / norm
            assert dist <= tol + 1e-9


@settings(max_examples=25, deadline=None)
@given(st.integers(3, 60), st.integers(0, 10_000))
def test_chain_segments_partition_property(n, seed):
    from moaray.ops.vector import chain_segments

    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.normal(0, 1, (n, 2)), axis=0)
    seg = np.concatenate([pts[:-1], pts[1:]], axis=1)
    perm = rng.permutation(len(seg))
    chains = chain_segments(seg[perm])
    # partition: total edges conserved; single open path -> one chain
    assert sum(len(c) - 1 for c in chains) == len(seg)
