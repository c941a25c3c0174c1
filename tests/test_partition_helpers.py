"""Property tests for the bounded-partition groupby helpers: the pair
index expansion behind every within-bucket pair op and the merged-sweep
right-counter behind the asof/range joins. References are brute-force
scalar Python, never the helpers themselves."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from moaray.ops.dedup import _pair_index_expansion, _pairs_from_sorted_groups
from moaray.ops.relational import _rights_before


@given(
    st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=12)
)
@settings(max_examples=200, deadline=None)
def test_pair_index_expansion_matches_bruteforce(counts_list):
    counts = np.array(counts_list, dtype=np.int64)
    ga, gb = _pair_index_expansion(counts)
    ref = []
    base = 0
    for c in counts_list:
        for j in range(c):
            for i in range(j):
                ref.append((base + i, base + j))
        base += c
    got = sorted(zip(ga.tolist(), gb.tolist()))
    assert got == sorted(ref)
    # every pair stays inside its group and a-index precedes b-index
    assert all(a < b for a, b in got)


@given(
    st.lists(st.integers(min_value=1, max_value=9), min_size=2, max_size=10)
)
@settings(max_examples=100, deadline=None)
def test_pairs_from_sorted_groups_pack(counts_list):
    counts = np.array(counts_list, dtype=np.int64)
    n = int(counts.sum())
    # strictly ascending ids within each group
    docs = np.concatenate(
        [np.sort(np.random.default_rng(i).choice(1000, c, replace=False))
         for i, c in enumerate(counts_list)]
    ).astype(np.int64)
    pk = _pairs_from_sorted_groups(docs, counts)
    a = pk >> np.int64(32)
    b = pk & np.int64(0xFFFFFFFF)
    assert (a < b).all()
    assert pk.size == int(sum(c * (c - 1) // 2 for c in counts_list))


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),  # right (uid, ts)
        min_size=0, max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),  # left (uid, bound)
        min_size=1, max_size=25,
    ),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_rights_before_matches_bruteforce(right, left, inclusive):
    r = sorted(right)
    r_uid = np.array([x[0] for x in r], dtype=np.int64)
    r_ts = np.array([x[1] for x in r], dtype=np.int64)
    l_uid = np.array([x[0] for x in left], dtype=np.int64)
    l_ts = np.array([x[1] for x in left], dtype=np.int64)
    got = _rights_before(r_uid, r_ts, l_uid, l_ts, inclusive=inclusive)
    for i, (u, t) in enumerate(left):
        if inclusive:
            ref = sum(1 for (ru, rt) in r if ru == u and rt <= t)
        else:
            ref = sum(1 for (ru, rt) in r if ru == u and rt < t)
        assert got[i] == ref, (u, t, inclusive)
