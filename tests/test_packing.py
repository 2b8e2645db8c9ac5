"""pack_sequences vs a single-process packing twin + invariants."""

import pytest

from opentopodata_spark.operators.packing import pack_sequences


def _py_pack(rows, seq_len):
    """Reference packing: concatenate in doc_id order, cut every seq_len."""
    out = set()
    offset = 0
    for did, text in sorted(rows, key=lambda r: r[0]):
        n = len([t for t in text.split(" ") if t])
        if n == 0:
            continue
        pos = 0
        while pos < n:
            stream = offset + pos
            seq_id = stream // seq_len
            take = min(n - pos, (seq_id + 1) * seq_len - stream)
            out.add((seq_id, did, pos, pos + take - 1, stream - seq_id * seq_len))
            pos += take
        offset += n
    return out


def _run(spark, rows, seq_len, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.seq_id, r.doc_id, r.doc_from, r.doc_to, r.seq_from)
        for r in pack_sequences(df, seq_len, **kw).collect()
    }
    assert got == _py_pack(rows, seq_len)
    return got


def test_pack_basic_and_boundary_spans(spark):
    rows = [
        (1, "a b c"),          # 3 tokens
        (2, "d e f g h"),      # 5 -> spans the 4-boundary
        (3, "i"),              # 1
        (4, ""),               # dropped
        (5, "j k l m n o p q r s t u"),  # 12 -> spans 3 sequences
    ]
    got = _run(spark, rows, seq_len=4)
    # doc 2 starts at stream 3: slice (0,0) in seq 0 then (1,4) in seq 1
    assert (0, 2, 0, 0, 3) in got
    assert (1, 2, 1, 4, 0) in got
    assert not any(d == 4 for _, d, *_ in got)


def test_pack_exact_fit_and_long_doc(spark):
    rows = [(1, " ".join("x" * 1 for _ in range(8))), (2, "y " * 16)]
    _run(spark, rows, seq_len=8)  # doc1 fills seq 0 exactly; doc2 = seqs 1-2


def test_pack_multi_bucket_prefix_sum(spark):
    # bucket_shift=2 -> 4 ids per bucket: exercises driver cumsum + join
    rows = [(i, "t " * ((i * 7) % 5 + 1)) for i in range(1, 40)]
    _run(spark, rows, seq_len=10, bucket_shift=2)


def test_pack_sparse_and_negative_ids(spark):
    rows = [(-9, "a b"), (-1, "c"), (5, "d e f"), (10_000_019, "g h")]
    _run(spark, rows, seq_len=3, bucket_shift=3)


def test_pack_invariants(spark):
    rows = [(i, "w " * ((i * 13) % 9 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, 16, bucket_shift=4).collect()
    # every token of every doc assigned exactly once
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.doc_from, r.doc_to))
    for did, spans in per_doc.items():
        spans.sort()
        n = (did * 13) % 9 + 1
        assert spans[0][0] == 0 and spans[-1][1] == n - 1
        for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
            assert b0 == a1 + 1
    # every sequence except the last is completely full
    per_seq = {}
    for r in out:
        per_seq.setdefault(r.seq_id, 0)
        per_seq[r.seq_id] += r.doc_to - r.doc_from + 1
    last = max(per_seq)
    assert all(v == 16 for s, v in per_seq.items() if s != last)
    assert set(per_seq) == set(range(last + 1))


def test_pack_rejects_bad_seq_len(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(df, 0)


def test_pack_precomputed_token_counts(spark):
    # BPE-style: pack on a precomputed count column, not the whitespace rule
    rows = [(1, "ignored", 5), (2, "ignored", 3), (3, "ignored", 0), (4, "x", 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_bpe long")
    out = pack_sequences(df, 4, n_tok_col="n_bpe").collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, 0)
        per_doc[r.doc_id] += r.doc_to - r.doc_from + 1
    assert per_doc == {1: 5, 2: 3, 4: 9}  # doc 3 (0 tokens) dropped
    assert max(r.seq_id for r in out) == (5 + 3 + 9 - 1) // 4
