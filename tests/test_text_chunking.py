"""chunk_fixed invariants: dropping each chunk's first `overlap` chars
(except chunk 0) and concatenating reconstructs the document exactly;
chunk bounds respect size/stride."""

import pytest
from pyspark.sql import Row

from quake_vector_search_spark.operators.text import chunk_fixed


def test_chunk_reconstruction(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="abcdefghijklmnopqrstuvwxyz"),   # 26 chars
        Row(doc_id=2, text="x" * 10),                        # size of one chunk
        Row(doc_id=3, text="short"),
        Row(doc_id=4, text="y" * 11),                        # 1 past a chunk
    ])
    size, overlap, stride = 10, 4, 6
    out = chunk_fixed(docs, size=size, overlap=overlap).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_id)):
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    originals = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, chunks in by_doc.items():
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == originals[doc_id]
        assert all(len(c) <= size for c in chunks)
        # every chunk but the last is full-size; the last always
        # reaches the document end and exceeds the overlap
        assert all(len(c) == size for c in chunks[:-1])
        if len(originals[doc_id]) >= size:
            assert len(chunks[-1]) > overlap
    # 26 chars: last start = ceil((26-10)/6) = 3 → starts 0,6,12,18
    assert len(by_doc[1]) == 4
    assert len(by_doc[2]) == 1          # exactly one full chunk covers it
    assert len(by_doc[3]) == 1


def test_chunk_overlap_validation(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="abc")])
    with pytest.raises(ValueError):
        chunk_fixed(docs, size=10, overlap=10)


def test_kgram_fingerprints_rules(spark):
    """Winnow rule keeps exactly the forward-window minima; modp is a
    narrow transform keeping hash%w==0; short docs yield nothing;
    both deterministic."""
    from quake_vector_search_spark.operators.text import (
        kgram_fingerprints,
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "aaaaaaaaaaaaaaa"), (3, "tiny")],
        ["doc_id", "text"])
    fp = kgram_fingerprints(docs, k=8, w=4, method="winnow").collect()
    assert not [r for r in fp if r["doc_id"] == 3]
    # doc 2: all k-grams identical -> every forward-window min ties
    # with itself -> all positions selected
    n2 = len("aaaaaaaaaaaaaaa") - 8 + 1
    assert len([r for r in fp if r["doc_id"] == 2]) == n2
    # density: winnow keeps ~1/w of doc-1 positions (exact count is
    # data-dependent but must be strictly between 0 and all)
    d1 = [r for r in fp if r["doc_id"] == 1]
    norm_len = len("thequickbrownfoxjumpsoverthelazydog")
    assert 0 < len(d1) < norm_len - 8 + 1
    again = kgram_fingerprints(docs, k=8, w=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, fp))

    modp = kgram_fingerprints(docs, k=8, w=4, method="modp")
    assert all(r["fp_hash"] % 4 == 0 for r in modp.collect())
    # modp plans narrow: no exchange
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        modp.explain("formatted")
    assert "Exchange" not in buf.getvalue()
