"""Training-corpus cleaning job: documents -> filtered, deduplicated corpus.

The spark-submit-able counterpart of jobs/elevation.py for the LLM-data
side of the engine: one script that runs identically under
``python -m opentopodata_spark.jobs.dataprep`` (local) and
``spark-submit --py-files otds.zip dataprep.py --master external``.

Pipeline (one metrics scan, one dedup shuffle, optional LSH near-dup):

    documents(doc_id, text[, url])
      -> optional URL front door (--url-col): normalize, blocklist
         (--block-domains), keep one doc per canonical URL — a
         projection + one agg BEFORE any text bytes move
      -> document_metrics: token stats + quality + language in ONE
         projection (operators/textops.document_metrics — no metric joins)
      -> filters: --min-quality, --langs, --min-tokens/--max-tokens,
         --max-dup-ngram-frac (Gopher repetition rule)
      -> optional perplexity filter (--max-ppl): bigram-LM scores
         (operators/lm, CCNet-style) against --lm-train or self-trained
      -> optional learned quality filter (--quality-positive): logreg
         over hashed features, trusted corpus vs md5-sampled crawl
         negatives (operators/classifier), keep >= --min-quality-prob
      -> exact dedup: keep each text-hash group's canonical (min) doc_id —
         one hash aggregation with map-side combine
      -> optional near-dup drop (--near-dup-threshold): MinHash -> LSH ->
         verified Jaccard (operators/dedup.verified_near_duplicates, the
         bucketed non-quadratic shape); --near-dup-mode picks the
         semantics — pairs (default): the higher doc_id of every verified
         pair drops; clusters: connected components over the pair graph
         keep one representative per component (union-find semantics,
         operators/dedup.dedup_corpus)
      -> optional deterministic stratified sampling (--sample-rates):
         per-language data mixing by md5(doc_id) threshold — layout- and
         engine-independent, auditable via the emitted sample_key column
      -> parquet corpus + one-line JSON stats (per-stage survivor counts
         from a single conditional aggregation — not one count() per stage)
      -> optional sequence packing (--pack-seq-len): {out}/packing holds
         the contiguous fixed-length training-sequence assignments
         (operators/packing.pack_sequences, distributed prefix sum)

Example:

    python -m opentopodata_spark.jobs.dataprep \
        --documents /root/testdata/sf0.01/documents.parquet \
        --out /tmp/clean --min-quality 0.4 --langs en \
        --near-dup-threshold 0.8
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import functions as F

from ..operators import dedup as _dedup
from ..operators import textops as _textops
from ..session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.dataprep",
        description="Filter + deduplicate a documents corpus for training.",
    )
    p.add_argument("--documents", required=True, help="parquet path of the corpus (doc_id, text)")
    p.add_argument("--out", required=True, help="output directory (corpus parquet + stats.json)")
    p.add_argument("--min-quality", type=float, default=None, help="drop docs with quality score below this")
    p.add_argument("--langs", default=None, help="comma-separated predicted languages to keep (e.g. en,de)")
    p.add_argument("--min-tokens", type=int, default=None)
    p.add_argument("--max-tokens", type=int, default=None)
    p.add_argument("--max-dup-ngram-frac", type=float, default=None,
                   help="drop docs whose duplicate word-trigram fraction exceeds "
                        "this (Gopher-style repetition rule)")
    p.add_argument("--sample-rates", default=None,
                   help="per-language keep rates 'en=1.0,de=0.3': deterministic "
                        "md5(doc_id) stratified sampling applied after dedup "
                        "(data mixing); languages not listed use --sample-default")
    p.add_argument("--sample-default", type=float, default=1.0)
    p.add_argument("--sample-seed", default="s1")
    p.add_argument("--mix-alpha", type=float, default=None,
                   help="temperature-based mixing: derive per-language "
                        "rates from token mass as p_i ~ n_i^alpha "
                        "(alpha=0 equal shares, alpha=1 natural mixture); "
                        "mutually exclusive with --sample-rates")
    p.add_argument("--mix-token-budget", type=float, default=None,
                   help="with --mix-alpha: water-fill rates so the kept "
                        "token mass is ~ this budget")
    p.add_argument("--chunk-tokens", type=int, default=None,
                   help="also emit a chunked corpus ({out}/chunks): fixed-"
                        "token windows over the cleaned corpus "
                        "(textops.chunk_documents)")
    p.add_argument("--chunk-stride", type=int, default=None,
                   help="window stride (default: --chunk-tokens, i.e. "
                        "non-overlapping)")
    p.add_argument("--with-repetition-metrics", action="store_true",
                   help="keep dup/top n-gram-fraction columns in the output "
                        "corpus even when --max-dup-ngram-frac is not set "
                        "(they cost an extra gram pass, so they are opt-in)")
    p.add_argument("--url-col", default=None,
                   help="input column holding each doc's URL: enables the "
                        "crawl front door — URL normalization, optional "
                        "domain blocklist, and URL-level dedup (keep the "
                        "min doc_id per canonical URL) BEFORE any text work")
    p.add_argument("--block-domains", default=None,
                   help="comma-separated registrable domains to drop "
                        "(requires --url-col)")
    p.add_argument("--pack-seq-len", type=int, default=None,
                   help="also emit {out}/packing: contiguous fixed-length "
                        "training-sequence assignments over the cleaned "
                        "corpus (operators/packing.pack_sequences)")
    p.add_argument("--max-ppl", type=float, default=None,
                   help="drop docs whose bigram-LM perplexity exceeds this "
                        "(CCNet-style quality filter; the LM self-trains on "
                        "the filtered corpus unless --lm-train is given)")
    p.add_argument("--lm-train", default=None,
                   help="parquet path of a trusted corpus (doc_id, text) to "
                        "train the perplexity LM on instead of self-training")
    p.add_argument("--lm-min-count", type=int, default=1,
                   help="prune LM bigrams below this count (the large-"
                        "trusted-corpus knob)")
    p.add_argument("--quality-positive", default=None,
                   help="parquet of trusted positive examples (doc_id, "
                        "text): train a logreg quality classifier against "
                        "md5-sampled negatives from this corpus and keep "
                        "docs scoring >= --min-quality-prob (GPT-3-style "
                        "learned filter; operators/classifier)")
    p.add_argument("--min-quality-prob", type=float, default=0.5)
    p.add_argument("--dsir-target", default=None,
                   help="parquet of target-domain docs (doc_id, text):"
                        " keep the --dsir-k docs DSIR importance"
                        " resampling picks (hashed-ngram log ratios +"
                        " Gumbel-top-k; arXiv:2302.03169)")
    p.add_argument("--dsir-k", type=int, default=None,
                   help="number of docs DSIR keeps (required with"
                        " --dsir-target)")
    p.add_argument("--dsir-buckets", type=int, default=8192)
    p.add_argument("--quality-dim", type=int, default=64,
                   help="hashing-trick feature width for the classifier")
    p.add_argument("--quality-iters", type=int, default=20)
    p.add_argument("--geo-filter", default=None,
                   help="polygon layer (GeoJSON/.shp/.gpkg): keep or "
                        "drop documents by whether any coordinate "
                        "extracted from their text falls inside a "
                        "polygon (region-scoped corpora)")
    p.add_argument("--geo-tag", default=None,
                   help="polygon layer (GeoJSON/.shp/.gpkg): annotate "
                        "surviving docs with region_id = the most-"
                        "frequent polygon containing their extracted "
                        "coordinates (ties: smallest id; coordinate-"
                        "less docs carry null) — the substrate for "
                        "region-stratified sampling/mixing")
    p.add_argument("--geo-mode", choices=("keep", "drop"),
                   default="keep",
                   help="keep = only docs with >=1 coordinate inside; "
                        "drop = remove those docs (coordinate-less "
                        "docs survive drop, are removed by keep)")
    p.add_argument("--no-exact-dedup", action="store_true", help="skip exact text dedup (kept on by default)")
    p.add_argument("--exact-dedup-index", default=None, metavar="DIR",
                   help="cross-run incremental dedup: drop docs whose "
                        "md5(text) is already in this persisted hash "
                        "index (earlier corpora are never rescanned), "
                        "then commit this run's admitted hashes as an "
                        "idempotent run_id partition")
    p.add_argument("--near-dup-threshold", type=float, default=None,
                   help="also drop LSH-verified near-duplicates at this Jaccard threshold")
    p.add_argument("--near-dup-mode", choices=("pairs", "clusters"),
                   default="pairs",
                   help="pairs: drop the larger id of every verified pair "
                        "(keeps both of two docs that only share a mutual "
                        "neighbor); clusters: connected components over the "
                        "pair graph, keep one representative per component "
                        "(the standard union-find corpus dedup — treats "
                        "near-duplication as transitive)")
    p.add_argument("--shingle-n", type=int, default=2)
    p.add_argument("--stats-distinct-tokens", type=int, default=None,
                   metavar="P",
                   help="report an HLL distinct-token estimate of the "
                        "OUTPUT corpus in stats.json (P = register "
                        "precision bits, e.g. 12; sketch.hll_distinct)")
    p.add_argument("--stats-token-quantiles", default=None,
                   metavar="QS",
                   help="comma list of quantiles (e.g. 0.5,0.9,0.99): "
                        "report EXACT per-doc whitespace-token-count "
                        "order statistics of the output corpus "
                        "(quantiles.exact_quantiles — distributed "
                        "selection, no global sort)")
    p.add_argument("--exact-substr-len", type=int, default=None,
                   help="TRUE ExactSubstr span dedup: strip every token "
                        "interval covered by a substring of >= L tokens "
                        "repeated anywhere in the corpus (suffix-array "
                        "prefix-doubling classes, O(log L) rounds); docs "
                        "emptied by the removal drop")
    p.add_argument("--corpus-format", choices=("parquet", "iceberg"),
                   default="parquet",
                   help="corpus table format: 'iceberg' commits the "
                        "cleaned corpus as a real Iceberg v2 table "
                        "(pure-Python metadata layer — snapshots, Avro "
                        "manifests, time travel via jobs/iceberg.py) "
                        "instead of a bare parquet directory")
    p.add_argument("--resume", action="store_true",
                   help="skip stages whose output already exists complete "
                        "(_SUCCESS marker): a crash between corpus, chunks "
                        "and packing redoes only the missing stages "
                        "(Spark's own overwrite keeps each single stage "
                        "atomic; local-filesystem marker check)")
    p.add_argument("--cores", type=int, default=None, help="local[] cores (ignored with --master external)")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None, help="Spark master; 'external' defers to spark-submit")
    return p


def run(ns: argparse.Namespace, spark=None) -> dict:
    if spark is None:
        spark = get_spark(
            app_name="otds-dataprep",
            cores=ns.cores,
            shuffle_partitions=ns.shuffle_partitions,
            master=ns.master,
        )
    if getattr(ns, "dsir_target", None) and ns.dsir_k is None:
        raise ValueError("--dsir-target requires --dsir-k")
    t0 = time.time()
    out_corpus = f"{ns.out}/corpus"
    corpus_fmt = getattr(ns, "corpus_format", "parquet")

    def _stage_done(path: str) -> bool:
        import os as _os

        if not getattr(ns, "resume", False):
            return False
        if path == out_corpus and corpus_fmt == "iceberg":
            from .. import iceberg as _ice

            return (_ice.table_exists(path)
                    and _ice.IcebergTable(path).current_snapshot_id()
                    is not None)
        return _os.path.exists(f"{path}/_SUCCESS")

    if _stage_done(out_corpus):
        # the whole corpus pipeline completed in a prior run: don't
        # recompute filters/dedup, just finish the derived stages
        stats: dict = {"job": "dataprep", "resumed_corpus": True}
        stats["output_docs"] = _read_corpus(spark, out_corpus,
                                            corpus_fmt).count()
        filtered = None
        return _derived_stages(spark, ns, stats, out_corpus, t0, filtered)

    raw = spark.read.parquet(ns.documents)
    url_stats = {}
    if getattr(ns, "url_col", None):
        from ..operators import urlops as _urlops

        raw = raw.select("doc_id", "text", ns.url_col)
        if ns.block_domains:
            blocked = [d.strip() for d in ns.block_domains.split(",") if d.strip()]
            raw = _urlops.blocklist_filter(raw, blocked, url_col=ns.url_col)
        # URL-level dedup first: two crawl records of one page normalize
        # to the same string; keep the min doc_id per canonical URL.
        # This runs BEFORE metrics/text dedup — it's the cheap front door
        # (a projection + one agg) that spares the text stages the bytes.
        raw = raw.withColumn(
            "_nurl", _urlops.normalize_url(F.col(ns.url_col))
        )
        keep_url = raw.groupBy("_nurl").agg(F.min("doc_id").alias("doc_id"))
        raw = raw.join(keep_url, ["_nurl", "doc_id"], "left_semi").drop("_nurl")
        url_stats["after_url_stage"] = raw.count()
    docs = raw.select("doc_id", "text")
    m = _textops.document_metrics(
        docs,
        include_repetition=(
            ns.max_dup_ngram_frac is not None
            or getattr(ns, "with_repetition_metrics", False)
        ),
    )

    keep = F.lit(True)
    if ns.min_quality is not None:
        keep = keep & (F.col("score") >= float(ns.min_quality))
    if ns.langs:
        langs = [s.strip() for s in ns.langs.split(",") if s.strip()]
        keep = keep & F.col("pred_lang").isin(langs)
    if ns.min_tokens is not None:
        keep = keep & (F.col("n_ws_tokens") >= int(ns.min_tokens))
    if ns.max_tokens is not None:
        keep = keep & (F.col("n_ws_tokens") <= int(ns.max_tokens))
    if ns.max_dup_ngram_frac is not None:
        keep = keep & (F.col("dup_trigram_frac") <= float(ns.max_dup_ngram_frac))

    filtered = m.where(keep)
    # the filtered metric frame feeds 2-3 consumers (dedup, near-dup,
    # final write) — persist so the corpus scan + metrics run once
    filtered = filtered.persist()

    stage_counts = m.select(
        F.count(F.lit(1)).alias("input_docs"),
        F.sum(keep.cast("long")).alias("after_filters"),
    ).collect()[0]
    stats: dict = {
        "job": "dataprep",
        **url_stats,
        "input_docs": int(stage_counts.input_docs),
        # SUM over zero rows is NULL — an empty corpus must produce empty
        # output + zero stats, not a TypeError
        "after_filters": int(stage_counts.after_filters or 0),
    }

    if getattr(ns, "max_ppl", None) is not None:
        from ..operators import lm as _lm

        if ns.lm_train:
            train_src = spark.read.parquet(ns.lm_train).select("doc_id", "text")
        else:
            # self-training: high-ppl docs are the corpus's own outliers
            train_src = filtered.select("doc_id", "text")
        model = _lm.train_bigram_lm(train_src, min_count=int(ns.lm_min_count))
        keep_ids = (
            _lm.perplexity(filtered.select("doc_id", "text"), model)
            .where(F.col("ppl") <= float(ns.max_ppl))
            .select("doc_id")
        )
        filtered = filtered.join(keep_ids, "doc_id", "left_semi")
        stats["after_ppl_filter"] = filtered.count()

    if getattr(ns, "quality_positive", None):
        from ..operators import classifier as _clf
        from ..operators import embeddings as _emb

        pos = (
            spark.read.parquet(ns.quality_positive)
            .select("text")
            .withColumn("doc_id", -1 - F.monotonically_increasing_id())
            .withColumn("label", F.lit(1).cast("long"))
        )
        n_pos = pos.count()
        n_corpus = filtered.count()
        # deterministic md5-threshold negative sample of ~n_pos crawl
        # docs (the GPT-3 recipe: trusted = positive, raw crawl =
        # negative) — layout-independent, no orderBy, no rand().
        # BALANCED classes (~1:1): an unbalanced base rate shifts every
        # probability away from the 0.5 threshold users reason about
        rate = min(1.0, float(n_pos) / max(n_corpus, 1))
        thr = int(rate * 0xFFFFFFFF)
        neg = (
            filtered.select("doc_id", "text")
            .where(
                F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("qneg"),
                       F.col("doc_id"))), 1, 8), 16, 10).cast("long") <= thr
            )
            .withColumn("label", F.lit(0).cast("long"))
        )
        train = pos.unionByName(neg.select("text", "doc_id", "label"))
        par = spark.sparkContext.defaultParallelism
        feats = _emb.text_embed(train, dim=ns.quality_dim, partitions=par).join(
            train.select("doc_id", "label"), "doc_id"
        )
        model = _clf.train_logreg(feats, n_iter=ns.quality_iters)
        corpus_feats = _emb.text_embed(
            filtered.select("doc_id", "text"), dim=ns.quality_dim, partitions=par
        )
        keep_ids = (
            _clf.predict_proba(corpus_feats, model)
            .where(F.col("prob") >= float(ns.min_quality_prob))
            .select("doc_id")
        )
        filtered = filtered.join(keep_ids, "doc_id", "left_semi")
        stats["after_quality_classifier"] = filtered.count()

    if getattr(ns, "dsir_target", None):
        from ..operators import dsir as _dsir

        keep_ids = (
            _dsir.dsir_sample(
                filtered.select(
                    F.col("doc_id").cast("string").alias("doc_id"),
                    "text",
                ),
                spark.read.parquet(ns.dsir_target).select(
                    F.col("doc_id").cast("string").alias("doc_id"),
                    "text",
                ),
                int(ns.dsir_k), n_buckets=int(ns.dsir_buckets),
            )
            .where(F.col("selected"))
            .select(F.col("doc_id"))
        )
        filtered = filtered.join(
            keep_ids,
            filtered["doc_id"].cast("string") == keep_ids["doc_id"],
            "left_semi",
        )
        stats["after_dsir"] = filtered.count()

    def _geo_points(current):
        """Coordinates extracted from the current survivors through the
        standard span front door (plain-text corpora wrap the text as
        one span) — shared by --geo-filter and --geo-tag."""
        from ..operators import extract as _extract

        if "spans" in raw.columns:
            spans_src = raw.select("doc_id", "spans").join(
                current.select("doc_id"), "doc_id", "left_semi")
        else:
            spans_src = current.select(
                "doc_id",
                F.array(F.struct(
                    F.lit("text").alias("kind"),
                    F.col("text").alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    F.lit(0).alias("offset"),
                )).alias("spans"),
            )
        return _extract.extract_points(spans_src).where(
            F.col("loc_error").isNull())

    if getattr(ns, "geo_filter", None):
        from ..operators import spatial as _spatial

        polys = _spatial.polygons_from_geojson(ns.geo_filter)
        hit_docs = _spatial.point_in_polygon_join(
            _geo_points(filtered), polys).select("doc_id")
        how = "left_semi" if ns.geo_mode == "keep" else "left_anti"
        filtered = filtered.join(hit_docs, "doc_id", how)
        stats["after_geo_filter"] = filtered.count()

    if getattr(ns, "geo_tag", None):
        from pyspark.sql import Window as _W

        from ..operators import spatial as _spatial

        polys = _spatial.polygons_from_geojson(ns.geo_tag)
        hits = _spatial.point_in_polygon_join(_geo_points(filtered), polys)
        # one region per doc: the most frequently hit polygon, ties to
        # the smallest polygon_id (deterministic); one narrow shuffle
        # on doc_id, then a broadcast-sized left join back
        tag = (
            hits.groupBy("doc_id", "polygon_id").count()
            .withColumn("_rk", F.row_number().over(
                _W.partitionBy("doc_id")
                .orderBy(F.desc("count"), F.asc("polygon_id"))))
            .where(F.col("_rk") == 1)
            .select("doc_id", F.col("polygon_id").alias("region_id"))
        )
        filtered = filtered.join(tag, "doc_id", "left")
        stats["geo_tagged_docs"] = filtered.where(
            F.col("region_id").isNotNull()).count()

    survivors = filtered
    if getattr(ns, "exact_dedup_index", None):
        # cross-RUN incremental dedup: drop docs whose text hash is in
        # the persisted index (yesterday's corpus is never rescanned —
        # only its hashes live there); this run's ADMITTED hashes are
        # committed after the corpus write as an idempotent run_id
        # partition keyed by the output path — the streaming-dedup
        # retry discipline in batch form (a retried run overwrites its
        # own partition and never anti-joins against itself).
        run_id = _dedup_index_run_id(ns.out)
        # Only a MISSING index means "first run".  Any other failure
        # (corrupt files, permissions, transient FS fault) must propagate:
        # silently skipping cross-run dedup would admit duplicates with no
        # signal, which is worse than failing the job.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(ns.exact_dedup_index)
        fs = jvm_path.getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        if fs.exists(jvm_path):
            prev = spark.read.parquet(ns.exact_dedup_index).where(
                F.col("run_id") != run_id
            ).select("text_hash")
        else:
            prev = None  # first run: no index yet
        if prev is not None:
            stats["before_index_dedup"] = filtered.count()
            h = filtered.withColumn("_th", F.md5("text"))
            filtered = h.join(
                prev, h["_th"] == prev["text_hash"], "left_anti"
            ).drop("_th")
            stats["after_index_dedup"] = filtered.count()
    if not ns.no_exact_dedup:
        canon = _dedup.exact_duplicates(filtered).select(
            F.col("canonical_id").alias("doc_id")
        )
        # canonical ids are one row per distinct text — a semi-join keyed
        # on doc_id; at corpus scale this is the standard dedup shuffle
        survivors = filtered.join(canon, "doc_id", "left_semi")

    if ns.near_dup_threshold is not None:
        pairs = _dedup.verified_near_duplicates(
            survivors.select("doc_id", "text"),
            shingle_n=ns.shingle_n,
            threshold=float(ns.near_dup_threshold),
        )
        if ns.near_dup_mode == "clusters":
            # transitive semantics: components over the verified-pair
            # graph, keep each component's min doc_id
            survivors = _dedup.dedup_corpus(survivors, pairs)
        else:
            # pairwise semantics: drop the larger id of every verified
            # pair. Keeps a doc that merely shares a near-dup neighbor
            # with another kept doc (e.g. edges 1-3, 2-3 keep 1 AND 2);
            # use clusters mode for the union-find keep-one behavior.
            losers = pairs.select(
                F.greatest("doc_a", "doc_b").alias("doc_id")
            ).distinct()
            survivors = survivors.join(losers, "doc_id", "left_anti")

    if getattr(ns, "exact_substr_len", None) is not None:
        # TRUE ExactSubstr span removal (dedup.exact_substr_spans):
        # strip every token interval covered by a substring of
        # >= L tokens repeated anywhere in the SURVIVING corpus; docs
        # whose text becomes empty drop (they were pure boilerplate)
        spans = _dedup.exact_substr_spans(
            survivors.select("doc_id", "text"),
            min_len=int(ns.exact_substr_len),
        )
        cleaned = _dedup.remove_exact_substr(
            survivors.select("doc_id", "text"), spans)
        stats["exact_substr_docs_rewritten"] = cleaned.where(
            F.col("n_spans_removed") > 0).count()
        survivors = (
            survivors.drop("text")
            .join(cleaned.select(
                "doc_id", F.col("clean").alias("text")), "doc_id")
            .where(F.col("text") != "")
        )

    if ns.sample_rates and ns.mix_alpha is not None:
        raise ValueError("--sample-rates and --mix-alpha are mutually "
                         "exclusive (explicit vs derived rates)")
    if ns.mix_token_budget is not None and ns.mix_alpha is None:
        raise ValueError("--mix-token-budget requires --mix-alpha "
                         "(the budget scales temperature-mixture rates; "
                         "alone it would be silently ignored)")
    if ns.mix_alpha is not None:
        from ..operators import sampling as _sampling

        survivors, mix_rates = _sampling.temperature_mixture(
            survivors,
            strata_col="pred_lang",
            alpha=float(ns.mix_alpha),
            token_budget=ns.mix_token_budget,
            weight_col="n_ws_tokens",
            id_col="doc_id",
            seed=ns.sample_seed,
        )
        stats["mix_rates"] = {k: round(v, 6) for k, v in mix_rates.items()}
    if ns.sample_rates:
        from ..operators import sampling as _sampling

        rates = {
            k.strip(): float(v)
            for k, v in (kv.split("=") for kv in ns.sample_rates.split(",") if kv)
        }
        # mixing runs LAST (on the deduped corpus) so the realized rates
        # are rates of unique documents, not of duplicate clusters
        survivors = _sampling.stratified_sample(
            survivors,
            rates,
            strata_col="pred_lang",
            id_col="doc_id",
            seed=ns.sample_seed,
            default_rate=float(ns.sample_default),
        )

    _write_corpus(survivors, out_corpus, corpus_fmt)
    stats["output_docs"] = _read_corpus(spark, out_corpus,
                                        corpus_fmt).count()
    if getattr(ns, "exact_dedup_index", None):
        run_id = _dedup_index_run_id(ns.out)
        hashes = (
            _read_corpus(spark, out_corpus, corpus_fmt)
            .select(F.md5("text").alias("text_hash"))
            .distinct()
        )
        hashes.write.mode("overwrite").parquet(
            f"{ns.exact_dedup_index}/run_id={run_id}"
        )
        stats["index_hashes_added"] = spark.read.parquet(
            f"{ns.exact_dedup_index}/run_id={run_id}"
        ).count()
    return _derived_stages(spark, ns, stats, out_corpus, t0, filtered)


def _write_corpus(survivors, out_corpus, corpus_fmt):
    if corpus_fmt == "iceberg":
        import shutil as _shutil

        from .. import iceberg as _ice

        if _ice.table_exists(out_corpus):
            _shutil.rmtree(out_corpus)  # overwrite semantics, like parquet
        t = _ice.IcebergTable.create(out_corpus, survivors.schema)
        _ice.append_dataframe(t, survivors)
    else:
        survivors.write.mode("overwrite").parquet(out_corpus)


def _read_corpus(spark, out_corpus, corpus_fmt):
    if corpus_fmt == "iceberg":
        from .. import iceberg as _ice

        return _ice.read_table(spark, out_corpus)
    return spark.read.parquet(out_corpus)


def _dedup_index_run_id(out_dir: str) -> str:
    import hashlib as _hashlib

    return _hashlib.md5(out_dir.encode()).hexdigest()[:16]


def _derived_stages(spark, ns, stats, out_corpus, t0, filtered):
    corpus_fmt = getattr(ns, "corpus_format", "parquet")
    """Chunking + packing over the WRITTEN corpus (fresh scans of the
    small cleaned output, not extra passes over the raw input); with
    --resume, a stage whose _SUCCESS marker exists is only re-counted."""
    import os as _os

    def _stage_done(path: str) -> bool:
        return getattr(ns, "resume", False) and _os.path.exists(
            f"{path}/_SUCCESS"
        )

    if ns.chunk_tokens is not None:
        chunks_out = f"{ns.out}/chunks"
        if not _stage_done(chunks_out):
            chunks = _textops.chunk_documents(
                _read_corpus(spark, out_corpus, corpus_fmt),
                chunk_tokens=ns.chunk_tokens,
                stride=ns.chunk_stride,
            )
            chunks.write.mode("overwrite").parquet(chunks_out)
        stats["output_chunks"] = spark.read.parquet(chunks_out).count()
    if getattr(ns, "pack_seq_len", None) is not None:
        from ..operators import packing as _packing

        pack_out = f"{ns.out}/packing"
        if not _stage_done(pack_out):
            pk = _packing.pack_sequences(
                _read_corpus(spark, out_corpus, corpus_fmt), seq_len=ns.pack_seq_len
            )
            pk.write.mode("overwrite").parquet(pack_out)
        stats["output_sequences"] = (
            spark.read.parquet(pack_out)
            .agg(F.countDistinct("seq_id"))
            .collect()[0][0]
        )
    if getattr(ns, "stats_distinct_tokens", None) is not None:
        from ..operators.exprutil import tokens as _tokens
        from ..operators.sketch import hll_distinct as _hll

        p_bits = int(ns.stats_distinct_tokens)
        toks = _read_corpus(spark, out_corpus, corpus_fmt).select(
            F.explode(_tokens("text")).alias("tok")
        )
        row = _hll(toks, "tok", p=p_bits).collect()[0]
        stats["distinct_tokens_est"] = int(row.est_distinct)
        stats["distinct_tokens_p"] = p_bits
    if getattr(ns, "stats_token_quantiles", None):
        from ..operators.exprutil import tokens as _tokens
        from ..operators.quantiles import exact_quantiles as _xq

        qs = [float(s) for s in ns.stats_token_quantiles.split(",") if s]
        counts = _read_corpus(spark, out_corpus, corpus_fmt).select(
            F.size(_tokens("text")).alias("n_toks")
        )
        rows = _xq(counts, "n_toks", qs).collect()
        stats["token_quantiles"] = {
            repr(r.q): int(r.value) for r in rows
        }
    stats["seconds"] = round(time.time() - t0, 3)
    if filtered is not None:
        filtered.unpersist()

    # local filesystem only — on an object store / HDFS the stats line is
    # still on stdout via main(); a production deploy would append it to
    # the lineage table instead
    if "://" not in ns.out:
        with open(f"{ns.out}/stats.json", "w") as fh:
            json.dump(stats, fh)
    return stats


def main(argv=None) -> int:
    ns = build_parser().parse_args(argv)
    stats = run(ns)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
