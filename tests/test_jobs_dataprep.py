"""Dataprep job CLI: filters, exact + near dedup, one-pass stats."""

import json
import os

import pytest
from pyspark.sql import functions as F

from opentopodata_spark.jobs import dataprep as job


@pytest.fixture()
def corpus_path(tmp_path, spark):
    """Tiny corpus with planted signal: junk, non-English, exact dups,
    near dups, and clean keepers."""
    near_a = "the cat sat on the mat and looked at the red door " * 3
    near_b = near_a + "extra tail words here"
    rows = [
        (1, "the quick brown fox is one of the animals seen in the park " * 2),
        (2, "%%% ### @@@ !!! ^^^ &&& *** ((( ))) ___"),          # symbol soup
        (3, "der hund ist ein tier und der vogel ist ein tier " * 2),  # de
        (4, "the quick brown fox is one of the animals seen in the park " * 2),  # dup of 1
        (5, near_a),
        (6, near_b),                                             # near-dup of 5
        (7, "tiny"),                                             # too short
        (8, "a second clean english document about the weather and the sea " * 2),
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    return p


def test_dataprep_end_to_end(tmp_path, corpus_path, spark, capsys):
    out = str(tmp_path / "clean")
    argv = [
        "--documents", corpus_path,
        "--out", out,
        "--min-quality", "0.3",
        "--langs", "en",
        "--min-tokens", "5",
        "--near-dup-threshold", "0.6",
        "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == 8
    # filters drop: 2 (symbol soup), 3 (German), 7 (too short)
    assert stats["after_filters"] == 5
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    # exact dedup drops 4 (dup of 1, canonical min id kept);
    # near-dup drops 6 (pair (5,6), greater id loses)
    assert kept == {1, 5, 8}
    assert stats["output_docs"] == 3
    # stats.json written next to the corpus
    disk = json.load(open(f"{out}/stats.json"))
    assert disk == stats

    # metrics survive into the cleaned corpus (schema contract)
    cols = set(spark.read.parquet(f"{out}/corpus").columns)
    assert {"doc_id", "text", "score", "pred_lang", "n_ws_tokens"} <= cols


def test_dataprep_near_dup_modes(tmp_path, spark, capsys):
    """pairs vs clusters semantics on a 'mutual neighbor' graph: docs 1
    and 2 are each near-dups of 3 but NOT of each other. pairs mode drops
    only 3 (the greater id of both pairs); clusters mode merges {1,2,3}
    into one component and keeps only its min."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "b c d e f g h i j"),
        (3, "a b c d e f g h i j"),
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    # jaccard(1,3) = 7/9 ≈ 0.78, jaccard(2,3) = 8/9 ≈ 0.89 (both verified
    # at 0.7); jaccard(1,2) = 6/9 ≈ 0.67 (candidate, fails verification)
    base = ["--documents", p, "--min-tokens", "0", "--cores", "4",
            "--near-dup-threshold", "0.7"]

    out_pairs = str(tmp_path / "pairs")
    assert job.main(base + ["--out", out_pairs]) == 0
    kept = {r.doc_id for r in spark.read.parquet(f"{out_pairs}/corpus").collect()}
    assert kept == {1, 2}

    out_cl = str(tmp_path / "clusters")
    assert job.main(base + ["--out", out_cl, "--near-dup-mode", "clusters"]) == 0
    kept = {r.doc_id for r in spark.read.parquet(f"{out_cl}/corpus").collect()}
    assert kept == {1}


def test_dataprep_no_filters_keeps_everything(tmp_path, corpus_path, spark, capsys):
    out = str(tmp_path / "all")
    argv = ["--documents", corpus_path, "--out", out,
            "--no-exact-dedup", "--cores", "4"]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == stats["after_filters"] == stats["output_docs"] == 8


def test_dataprep_repetition_filter(tmp_path, spark, capsys):
    rows = [
        (1, "the weather is fine and the sea is calm today in the north"),
        (2, "buy now buy now buy now buy now buy now buy now buy now"),  # spam
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    out = str(tmp_path / "clean")
    argv = ["--documents", p, "--out", out,
            "--max-dup-ngram-frac", "0.5", "--cores", "4"]
    assert job.main(argv) == 0
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == {1}  # doc 2: almost every trigram repeats an earlier one


def test_dataprep_sampling_stage(tmp_path, corpus_path, spark, capsys):
    """--sample-rates mixes deterministically after dedup: en kept at 1.0,
    everything else (default 0.0) dropped; sample_key is auditable."""
    out = str(tmp_path / "mixed")
    argv = ["--documents", corpus_path, "--out", out,
            "--sample-rates", "en=1.0", "--sample-default", "0.0",
            "--no-exact-dedup", "--cores", "4"]
    assert job.main(argv) == 0
    rows = spark.read.parquet(f"{out}/corpus").collect()
    assert rows and all(r.pred_lang == "en" for r in rows)
    assert all(len(r.sample_key) == 6 for r in rows)


def test_dataprep_empty_corpus(tmp_path, spark, capsys):
    """Zero input rows -> empty corpus + zero stats, not a TypeError
    (SUM over an empty relation is NULL)."""
    p = str(tmp_path / "empty.parquet")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(p)
    out = str(tmp_path / "clean")
    assert job.main(["--documents", p, "--out", out, "--cores", "4"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["input_docs"] == stats["after_filters"] == stats["output_docs"] == 0


def test_document_metrics_matches_per_family_ops(spark, corpus_path):
    """document_metrics must agree column-for-column with the per-family
    operators the driver queries pin (same expressions, one projection)."""
    from opentopodata_spark.operators import textops

    docs = spark.read.parquet(corpus_path)
    m = {
        r.doc_id: r
        for r in textops.document_metrics(docs, include_repetition=True).collect()
    }
    # default leaves the expensive repetition family out of the projection
    assert "dup_trigram_frac" not in textops.document_metrics(docs).columns
    for op, cols in (
        (textops.token_stats, ["n_chars", "n_ws_tokens", "n_bpe_tokens", "avg_token_len"]),
        (textops.quality_score, ["n_tokens", "n_stop", "n_punct", "score"]),
        (textops.lang_id, ["votes_en", "votes_de", "votes_fr", "votes_es", "pred_lang"]),
        (textops.repetition_stats, ["n_bigrams", "top_bigram_frac", "dup_bigram_frac",
                                    "n_trigrams", "top_trigram_frac", "dup_trigram_frac"]),
    ):
        for r in op(docs).collect():
            for c in cols:
                assert getattr(m[r.doc_id], c) == getattr(r, c), (c, r.doc_id)


def test_ann_index_build_and_search(tmp_path, spark, capsys):
    """jobs/ann.py end-to-end: build an IVF-PQ index over a clustered
    corpus, search it, and get same-cluster neighbors back."""
    import numpy as np

    from opentopodata_spark.jobs import ann

    rng = np.random.default_rng(1)
    centers = np.eye(8, dtype=np.float64)[:4]
    rows = [(i, [float(x) for x in centers[i % 4] + rng.normal(0, 0.05, 8)])
            for i in range(160)]
    emb_path = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(emb_path)

    idx = str(tmp_path / "idx")
    assert ann.main(["build-index", "--embeddings", emb_path, "--out", idx,
                     "--cells", "4", "--pq-m", "4", "--pq-ksub", "8",
                     "--cores", "4"]) == 0
    stats = __import__("json").loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["vectors"] == 160

    out = str(tmp_path / "res")
    q_path = str(tmp_path / "q.parquet")
    spark.createDataFrame(rows[:4], "vec_id long, embedding array<float>").write.parquet(q_path)
    assert ann.main(["search", "--index", idx, "--queries", q_path,
                     "--out", out, "--k", "3", "--n-probe", "1",
                     "--cores", "4"]) == 0
    res = spark.read.parquet(f"{out}/results").collect()
    assert len(res) == 4 * 3
    for r in res:
        assert r.neighbor_id % 4 == r.query_id % 4  # planted clusters


def test_dataprep_via_spark_submit(tmp_path, spark):
    """THE north-rule execution mode, end to end: `spark-submit
    --py-files <zip> <launcher>` in a fresh subprocess JVM with the
    package resolved ONLY from the --py-files archive (see
    conftest.run_via_spark_submit)."""
    from tests.conftest import run_via_spark_submit

    rows = [(1, "a b c d e f g h", "en", "s0"),
            (2, "a b c d e f g h", "en", "s0"),   # exact dup of 1
            (3, "k l m n o p q r", "en", "s1")]
    docs = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(docs)
    out = str(tmp_path / "clean")

    proc = run_via_spark_submit(
        tmp_path, "dataprep",
        ["--documents", docs, "--out", out, "--min-tokens", "0"],
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["input_docs"] == 3 and stats["output_docs"] == 2
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == {1, 3}


def test_dataprep_chunking_stage(tmp_path, spark, capsys):
    """--chunk-tokens emits a chunked corpus next to the cleaned one."""
    rows = [(1, "a b c d e f g"), (2, "x y")]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    out = str(tmp_path / "clean")
    argv = ["--documents", p, "--out", out, "--min-tokens", "0",
            "--chunk-tokens", "3", "--cores", "4"]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["output_docs"] == 2 and stats["output_chunks"] == 4
    ch = {(r.doc_id, r.chunk_idx): (r.chunk, r.n_tokens)
          for r in spark.read.parquet(f"{out}/chunks").collect()}
    assert ch[(1, 0)] == ("a b c", 3) and ch[(1, 2)] == ("g", 1)
    assert ch[(2, 0)] == ("x y", 2)


def test_dataprep_perplexity_filter(tmp_path, spark, capsys):
    # 9 mutually-similar docs + 1 oddball: self-trained LM gives the
    # oddball a much higher perplexity, --max-ppl drops exactly it
    rows = [
        (i, f"the cat sat on the mat near the door number {i % 3}")
        for i in range(1, 10)
    ] + [(10, "zygomorphic quasar bulldozers emit petrichor waltzes")]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)

    from opentopodata_spark.operators import lm as _lm

    docs = spark.read.parquet(p)
    scores = {
        r.doc_id: r.ppl
        for r in _lm.perplexity(docs, _lm.train_bigram_lm(docs)).collect()
    }
    cutoff = (max(v for k, v in scores.items() if k != 10) + scores[10]) / 2
    assert scores[10] > max(v for k, v in scores.items() if k != 10)

    out = str(tmp_path / "clean")
    argv = [
        "--documents", p, "--out", out,
        "--max-ppl", str(cutoff),
        "--no-exact-dedup",
        "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["after_ppl_filter"] == 9
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == set(range(1, 10))


def test_dataprep_perplexity_foreign_model(tmp_path, spark, capsys):
    # --lm-train: score against a trusted corpus instead of self-training
    trusted = [(i, "the weather at the sea is mild and the wind is calm")
               for i in range(1, 6)]
    crawl = [
        (1, "the weather at the sea is mild and the wind is calm today"),
        (2, "buy cheap pills online casino jackpot winner click here now"),
    ]
    tp = str(tmp_path / "trusted.parquet")
    cp = str(tmp_path / "crawl.parquet")
    spark.createDataFrame(trusted, "doc_id long, text string").write.parquet(tp)
    spark.createDataFrame(crawl, "doc_id long, text string").write.parquet(cp)

    from opentopodata_spark.operators import lm as _lm

    model = _lm.train_bigram_lm(spark.read.parquet(tp))
    scores = {
        r.doc_id: r.ppl
        for r in _lm.perplexity(spark.read.parquet(cp), model).collect()
    }
    cutoff = (scores[1] + scores[2]) / 2

    out = str(tmp_path / "clean")
    argv = [
        "--documents", cp, "--out", out,
        "--max-ppl", str(cutoff), "--lm-train", tp,
        "--no-exact-dedup", "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["after_ppl_filter"] == 1
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == {1}


def test_dataprep_url_front_door_and_packing(tmp_path, spark, capsys):
    rows = [
        (1, "the cat sat on the mat today", "http://www.example.com/a?utm_source=x"),
        (2, "the cat sat on the mat today", "http://example.com/a"),   # same page
        (3, "a different page about dogs and parks", "http://example.com/b"),
        (4, "spam spam spam buy now", "http://ads.bad-site.net/p"),
        (5, "another clean document about the weather", "https://News.co.uk:443/w/"),
    ]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string, url string").write.parquet(p)
    out = str(tmp_path / "clean")
    argv = [
        "--documents", p, "--out", out,
        "--url-col", "url", "--block-domains", "bad-site.net",
        "--pack-seq-len", "8",
        "--no-exact-dedup",
        "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # 4 dropped by blocklist, 2 dropped as URL-dup of 1
    assert stats["after_url_stage"] == 3
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert kept == {1, 3, 5}
    # packing emitted and covers every kept doc
    pk = spark.read.parquet(f"{out}/packing").collect()
    assert {r.doc_id for r in pk} == {1, 3, 5}
    assert stats["output_sequences"] >= 2


def test_dataprep_learned_quality_filter(tmp_path, spark, capsys):
    # trusted corpus and the crawl's clean half draw from the SAME
    # distribution (the learned-filter premise); the mash half doesn't
    trusted = [(i, f"the weather report for day {i} says mild wind and rain")
               for i in range(40)]
    crawl = (
        [(i, f"the weather report for day {i + 60} says mild wind and rain")
         for i in range(50)]
        + [(100 + i, "zx%q@@ 9#v!! jk$w## " * (2 + i % 3)) for i in range(50)]
    )
    tp = str(tmp_path / "trusted.parquet")
    cp = str(tmp_path / "crawl.parquet")
    spark.createDataFrame(trusted, "doc_id long, text string").write.parquet(tp)
    spark.createDataFrame(crawl, "doc_id long, text string").write.parquet(cp)
    out = str(tmp_path / "clean")
    argv = [
        "--documents", cp, "--out", out,
        "--quality-positive", tp, "--min-quality-prob", "0.5",
        "--quality-dim", "32", "--quality-iters", "30",
        "--no-exact-dedup", "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    # every clean doc kept, every mash dropped (they're linearly separable
    # in hashed char-3-gram space; negatives contain both classes but the
    # positive-only trusted set anchors the clean side)
    assert all(i in kept for i in range(50))
    assert stats["after_quality_classifier"] == len(kept)
    assert all(i not in kept for i in range(100, 150))


def test_dataprep_resume_skips_completed_stages(tmp_path, spark, capsys):
    rows = [(i, f"one two three four five six seven {i % 4}") for i in range(30)]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    out = str(tmp_path / "clean")
    base = ["--documents", p, "--out", out, "--no-exact-dedup", "--cores", "4"]

    # first run: corpus only
    assert job.main(base) == 0
    capsys.readouterr()
    corpus_mtime = os.path.getmtime(f"{out}/corpus/_SUCCESS")

    # resume run adds packing: corpus is NOT recomputed, packing appears
    assert job.main(base + ["--pack-seq-len", "8", "--resume"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats.get("resumed_corpus") is True
    assert os.path.getmtime(f"{out}/corpus/_SUCCESS") == corpus_mtime
    assert stats["output_sequences"] >= 1
    pk_mtime = os.path.getmtime(f"{out}/packing/_SUCCESS")

    # resume again: packing also skipped (only re-counted)
    assert job.main(base + ["--pack-seq-len", "8", "--resume"]) == 0
    stats2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.getmtime(f"{out}/packing/_SUCCESS") == pk_mtime
    assert stats2["output_sequences"] == stats["output_sequences"]

    # without --resume everything recomputes (overwrite semantics intact)
    assert job.main(base) == 0
    assert os.path.getmtime(f"{out}/corpus/_SUCCESS") > corpus_mtime


def test_dataprep_mix_alpha_stage(tmp_path, corpus_path, spark, capsys):
    """--mix-alpha derives per-language rates from kept token mass:
    alpha=0 equalizes expected tokens; realized rates are reported in
    stats and the minority language is kept in full."""
    out = str(tmp_path / "mixed")
    assert job.main([
        "--documents", corpus_path, "--out", out,
        "--mix-alpha", "0.0", "--cores", "2",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rates = stats["mix_rates"]
    # the corpus is en-dominated: the minority stratum keeps rate 1.0
    assert max(rates.values()) == 1.0
    assert min(rates.values()) < 1.0
    rows = spark.read.parquet(f"{out}/corpus").collect()
    assert rows and all(len(r.sample_key) == 6 for r in rows)


def test_dataprep_mix_alpha_conflicts_with_sample_rates(tmp_path, corpus_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        job.main([
            "--documents", corpus_path, "--out", str(tmp_path / "x"),
            "--mix-alpha", "0.0", "--sample-rates", "en=1.0",
        ])


def test_dataprep_mix_token_budget_requires_mix_alpha(tmp_path, corpus_path):
    """--mix-token-budget without --mix-alpha used to be silently
    ignored (the mixture branch only runs when mix_alpha is set)."""
    with pytest.raises(ValueError, match="requires --mix-alpha"):
        job.main([
            "--documents", corpus_path, "--out", str(tmp_path / "x"),
            "--mix-token-budget", "10000",
        ])


def test_dataprep_dsir_stage(tmp_path, spark, capsys):
    # raw: 12 terrain-ish + 12 finance-ish docs; target: terrain —
    # DSIR's top-8 must be all terrain docs
    raw = []
    for i in range(12):
        raw.append((i, f"elevation raster tile slope aspect dem {i}"))
        raw.append((100 + i, f"stock market bond yield report {i}"))
    rp = str(tmp_path / "raw.parquet")
    spark.createDataFrame(raw, "doc_id long, text string").write.parquet(rp)
    tp = str(tmp_path / "target.parquet")
    spark.createDataFrame(
        [(1000 + i, f"dem elevation slope raster contour {i}")
         for i in range(6)],
        "doc_id long, text string",
    ).write.parquet(tp)
    out = str(tmp_path / "sel")
    argv = [
        "--documents", rp, "--out", out, "--no-exact-dedup",
        "--dsir-target", tp, "--dsir-k", "8",
        "--dsir-buckets", "512", "--cores", "4",
    ]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["after_dsir"] == 8
    kept = {r.doc_id for r in spark.read.parquet(f"{out}/corpus").collect()}
    # Gumbel-top-k is a weighted SAMPLE, not argmax-by-weight: with a
    # ~2.5-nat gap a lucky finance doc can win a slot. The md5 seed is
    # fixed, so the outcome is deterministic — a strong terrain
    # majority is the invariant, not purity.
    assert len(kept) == 8 and sum(1 for d in kept if d < 100) >= 6


def test_dataprep_dsir_requires_k(tmp_path, spark):
    rp = str(tmp_path / "r2.parquet")
    spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    ).write.parquet(rp)
    with pytest.raises(ValueError, match="dsir-k"):
        job.run(job.build_parser().parse_args([
            "--documents", rp, "--out", str(tmp_path / "o2"),
            "--dsir-target", rp,
        ]), spark=spark)


def test_dataprep_geo_filter(tmp_path, spark, capsys):
    """--geo-filter keeps/drops documents by extracted-coordinate PIP
    against a polygon layer — exercised with a .gpkg layer end to end
    (round-4 vector front door)."""
    from opentopodata_spark import vector

    rows = [
        (1, "report from berlin at 52.52,13.40 about the weather today"),
        (2, "notes from sydney at -33.86,151.20 and nothing else here"),
        (3, "plain document with no coordinates mentioned anywhere at all"),
        (4, "two points 52.40,13.10 and -33.90,151.10 in one document"),
    ]
    docs = str(tmp_path / "geo_docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(docs)
    # box around Berlin only
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [
            [[12.0, 52.0], [14.0, 52.0], [14.0, 53.0], [12.0, 53.0],
             [12.0, 52.0]]]},
         "properties": {"polygon_id": "berlin_box"}},
    ]}
    gpk = str(tmp_path / "box.gpkg")
    vector.write_gpkg_features(gpk, fc, layer="box")

    out_keep = str(tmp_path / "keep")
    assert job.main([
        "--documents", docs, "--out", out_keep, "--no-exact-dedup",
        "--geo-filter", gpk, "--geo-mode", "keep", "--cores", "4",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = {r.doc_id for r in spark.read.parquet(f"{out_keep}/corpus").collect()}
    assert kept == {1, 4}            # berlin hit (4 has one inside point)
    assert stats["after_geo_filter"] == 2

    out_drop = str(tmp_path / "drop")
    assert job.main([
        "--documents", docs, "--out", out_drop, "--no-exact-dedup",
        "--geo-filter", gpk, "--geo-mode", "drop", "--cores", "4",
    ]) == 0
    capsys.readouterr()
    kept = {r.doc_id for r in spark.read.parquet(f"{out_drop}/corpus").collect()}
    assert kept == {2, 3}            # coordinate-less doc 3 survives drop

    # --geo-tag: two-region layer, most-frequent region wins, nulls kept
    fc2 = {"type": "FeatureCollection", "features": [
        fc["features"][0],
        {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [
            [[150.0, -34.5], [152.0, -34.5], [152.0, -33.0], [150.0, -33.0],
             [150.0, -34.5]]]},
         "properties": {"polygon_id": "sydney_box"}},
    ]}
    gpk2 = str(tmp_path / "boxes.gpkg")
    vector.write_gpkg_features(gpk2, fc2, layer="boxes")
    out_tag = str(tmp_path / "tagged")
    assert job.main([
        "--documents", docs, "--out", out_tag, "--no-exact-dedup",
        "--geo-tag", gpk2, "--cores", "4",
    ]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    rows_t = {r.doc_id: r.region_id
              for r in spark.read.parquet(f"{out_tag}/corpus").collect()}
    assert stats["geo_tagged_docs"] == 3
    assert rows_t[1] == "berlin_box"
    assert rows_t[2] == "sydney_box"
    assert rows_t[3] is None          # no coordinates -> null region
    assert rows_t[4] == "berlin_box"  # one hit in each box: tie -> min id


def test_dataprep_telemetry_stats(tmp_path, spark, capsys):
    """--stats-distinct-tokens / --stats-token-quantiles: HLL estimate
    and EXACT token-count order statistics of the written corpus,
    verified against direct python computation over the output."""
    import hashlib
    import math

    rows = [(i, " ".join(f"tok{(i * 17 + j) % 97}" for j in range(5 + i % 7)))
            for i in range(40)]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    out = str(tmp_path / "tele")
    argv = ["--documents", p, "--out", out, "--min-tokens", "0",
            "--no-exact-dedup", "--cores", "4",
            "--stats-distinct-tokens", "10",
            "--stats-token-quantiles", "0.5,0.9"]
    assert job.main(argv) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{out}/corpus").collect()}
    toks = [t for txt in docs.values() for t in txt.split(" ") if t]
    # HLL replay (same md5/register math as operators/sketch)
    q = 60 - 10
    regs: dict = {}
    for t in set(toks):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        idx, w = h >> q, h & ((1 << q) - 1)
        regs[idx] = max(regs.get(idx, 0),
                        q + 1 if w == 0 else q + 1 - w.bit_length())
    m, vz = 1 << 10, (1 << 10) - len(regs)
    s = sum(1 << (61 - 10 - r) for r in regs.values())
    alpha = 0.7213 / (1.0 + 1.079 / m)
    er = alpha * m * m * (1 << 51) / (s + vz * (1 << 51))
    want = round(m * math.log(m / vz)) if (er <= 2.5 * m and vz > 0) \
        else round(er)
    assert stats["distinct_tokens_est"] == want
    assert stats["distinct_tokens_p"] == 10
    counts = sorted(len([t for t in txt.split(" ") if t])
                    for txt in docs.values())
    for qq in (0.5, 0.9):
        k = int(math.floor(qq * (len(counts) - 1)))
        assert stats["token_quantiles"][repr(qq)] == counts[k]


def test_dataprep_cross_run_index_dedup(tmp_path, spark, capsys):
    """--exact-dedup-index: run 1 admits docs and commits their hashes;
    run 2 (different out dir) drops exact repeats of run 1's texts and
    adds only its new hashes; re-running run 2 (retry) is idempotent —
    it never anti-joins against its own partition, so output is
    unchanged."""
    idx = str(tmp_path / "hash_index")
    day1 = [(1, "alpha bravo charlie"), (2, "delta echo foxtrot")]
    day2 = [(10, "alpha bravo charlie"),   # repeat of day1 -> dropped
            (11, "golf hotel india")]      # new -> kept
    p1 = str(tmp_path / "d1.parquet")
    p2 = str(tmp_path / "d2.parquet")
    spark.createDataFrame(day1, "doc_id long, text string").write.parquet(p1)
    spark.createDataFrame(day2, "doc_id long, text string").write.parquet(p2)
    base = ["--min-tokens", "0", "--cores", "4",
            "--exact-dedup-index", idx]
    out1 = str(tmp_path / "run1")
    assert job.main(["--documents", p1, "--out", out1] + base) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["output_docs"] == 2 and s1["index_hashes_added"] == 2
    assert "before_index_dedup" not in s1  # first run: no prior index

    out2 = str(tmp_path / "run2")
    assert job.main(["--documents", p2, "--out", out2] + base) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["before_index_dedup"] == 2 and s2["after_index_dedup"] == 1
    kept = {r.doc_id for r in spark.read.parquet(f"{out2}/corpus").collect()}
    assert kept == {11}
    # index now holds 3 distinct hashes across two run partitions
    assert spark.read.parquet(idx).select("text_hash").distinct().count() == 3

    # retry of run 2: identical result, index unchanged
    assert job.main(["--documents", p2, "--out", out2] + base) == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3["after_index_dedup"] == 1 and s3["output_docs"] == 1
    assert spark.read.parquet(idx).select("text_hash").distinct().count() == 3


def test_dataprep_exact_substr_stage(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentopodata_spark.jobs import dataprep

    boiler = "subscribe to our newsletter for daily updates and offers"
    docs = str(tmp_path / "docs.parquet")
    rows = {
        "doc_id": ["a", "b", "c", "d"],
        "text": [
            f"unique alpha words here {boiler}",
            f"{boiler} and some other beta content",
            "completely independent gamma text with no repeats",
            boiler,  # pure boilerplate -> emptied -> dropped
        ],
    }
    pq.write_table(pa.table(rows), docs)
    out = str(tmp_path / "clean")
    ns = dataprep.build_parser().parse_args([
        "--documents", docs, "--out", out, "--exact-substr-len", "5",
    ])
    stats = dataprep.run(ns, spark=spark)
    got = {r.doc_id: r.text
           for r in spark.read.parquet(f"{out}/corpus").collect()}
    assert got["a"] == "unique alpha words here"
    assert got["b"] == "and some other beta content"
    assert got["c"] == "completely independent gamma text with no repeats"
    assert "d" not in got          # emptied by the removal
    assert stats["exact_substr_docs_rewritten"] == 3
    assert stats["output_docs"] == 3
