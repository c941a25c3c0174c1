import duckdb
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from moaray.ops.text import pii_redact_batch

_PII = st.sampled_from([
    "a.user+tag@mail-host.example.com", "x@y.io", "123-45-6789",
    "1234 5678 9012 3456", "1234-5678-9012-3456", "555-123-4567",
    "555.123.4567", "10.0.0.1", "192.168.255.254", "8.8.8.8",
])
_FILLER = st.text(
    alphabet=st.sampled_from(list("abcdefghijklmnopqrstuvwxyz .,0123456789-@")),
    min_size=0, max_size=24,
)
_DOC = st.lists(st.one_of(_PII, _FILLER), min_size=0, max_size=8).map(" ".join)


@settings(max_examples=120, deadline=None)
@given(texts=st.lists(_DOC, min_size=1, max_size=6))
def test_pii_redact_matches_duckdb_chain(texts):
    """Any mix of PII tokens and near-miss filler redacts identically in
    the Arrow kernel chain and the DuckDB regexp chain the driver runs."""
    import __ray_entry__ as entry

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = pii_redact_batch(t)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(entry.oracle_sql()["pii_redact"]).arrow()
    gs = got.sort_by("doc_id").to_pydict()
    ws = want.sort_by("doc_id").to_pydict()
    assert gs["clean_text"] == ws["clean_text"]
    assert gs["n_redactions"] == ws["n_redactions"]
