"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Every query is executed to completion through the noop sink (full plan
runs, nothing collected to the driver, no column-pruning shortcuts a
count() would allow). The flagship elevation pipeline also reports
coordinate throughput (coords/sec), the reference's headline metric.

Scaling-efficiency evidence (BASELINE.json north rule, N vs 4N):
    SPARK_GRAFT_CPUS=8 python bench.py
    SPARK_GRAFT_CPUS=32 python bench.py
and compare coords_per_sec / suite seconds (see docs/BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as contract  # noqa: E402
from opentopodata_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def run(make, warmup: bool = True) -> tuple[float, float, float]:
    """Steady-state timing: one untimed write (JIT/codegen, Python worker
    pool, page cache), then the median of N_RUNS timed writes — local-mode
    runs carry multi-second GC / worker-pool spikes that a single sample
    reports as query regressions, and round-over-round comparisons of
    single samples alias host weather into phantom regressions (measured
    1.1-3.5x swings on untouched code). Returns (median, min, max) so the
    recorded spread distinguishes a stable number from a noisy one.
    ``make`` is a factory: each rep builds the DataFrame fresh INSIDE the
    timed region, so operators that materialize during construction
    (iterative algorithms checkpointing per round, e.g. dedup_clusters)
    are fully timed, and nothing is reused across actions (a re-written
    identical DataFrame would skip its computed shuffle stages)."""
    if not callable(make):
        df, make = make, lambda: df
    if warmup:
        make().write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(N_RUNS):
        t0 = time.time()
        make().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return sorted(times)[len(times) // 2], min(times), max(times)


_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _proc_tree_cpu() -> float:
    """user+system CPU seconds consumed so far by this process and every
    live descendant (the local-mode JVM and its reused Python workers).
    Round-over-round wall-clock on a shared VM aliases host weather into
    phantom regressions; CPU-per-coord is the day-invariant twin."""
    try:
        pids = {}
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat", "rb") as f:
                    raw = f.read().decode("latin-1")
            except OSError:
                continue
            # comm may contain spaces/parens: split after the LAST ')'
            rest = raw.rsplit(")", 1)[1].split()
            ppid = int(rest[1])
            utime, stime = int(rest[11]), int(rest[12])
            pids[int(entry)] = (ppid, utime + stime)
        mine = {os.getpid()}
        grew = True
        while grew:
            grew = False
            for pid, (ppid, _) in pids.items():
                if ppid in mine and pid not in mine:
                    mine.add(pid)
                    grew = True
        return sum(pids[p][1] for p in mine if p in pids) / _CLK_TCK
    except OSError:
        return 0.0


def main() -> None:
    sf = _sf_label(SF_DIR)
    spark = get_spark(
        app_name="opentopodata-spark-bench",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 8),
        # keep stdout clean for the single JSON result line (the round
        # driver parses the tail of the combined output)
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # flagship: documents -> extraction -> tile join -> raster sampling
    # -> priority coalesce, at a doc count proportional to sf
    n_docs = max(2_000, int(200_000 * sf))
    elev_df = contract._run_elevation(spark, n_docs=n_docs, n_files=CPUS)
    n_coords = elev_df.count()  # fixtures built, rasters opened
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    cpu0 = _proc_tree_cpu()
    timings["elevation_e2e"], lo, hi = run(elev_df)  # run() warms once untimed
    spreads["elevation_e2e"] = [lo, hi]
    # CPU across the warmup + N_RUNS timed executions; per-run average.
    # (the warmup is CPU-identical to a timed run, so include it)
    elev_cpu_per_run = (_proc_tree_cpu() - cpu0) / (N_RUNS + 1)

    # stage decomposition: the extraction sub-plan alone (docs scan +
    # coordinate parse + polyline decode), so the gate metric can tell a
    # front-half regression from a resolve-half one without re-deriving
    # the pipeline. resolve-half = e2e - extract.
    from opentopodata_spark.operators import extract as _extract

    _, docs_path = contract._prepare_elevation_inputs(n_docs, n_files=CPUS)
    extract_df = _extract.with_point_id(
        _extract.extract_points(spark.read.parquet(docs_path))
    ).where(F.col("loc_error").isNull())
    t_extract, _, _ = run(extract_df)  # not in `queries`/total: a
    # diagnostic sub-plan of elevation_e2e, not an extra suite member

    queries = {
        "minhash_lsh": lambda: contract.q_lsh_pairs(spark, SF_DIR),
        "near_dup_verified": lambda: contract.q_near_dup_verified(spark, SF_DIR),
        "dedup_clusters": lambda: contract.q_dedup_clusters(spark, SF_DIR),
        "bm25_search": lambda: contract.q_bm25_search(spark, SF_DIR),
        "simhash": lambda: contract.q_simhash(spark, SF_DIR),
        "exact_dedup": lambda: contract.q_exact_dedup(spark, SF_DIR),
        "token_stats": lambda: contract.q_token_stats(spark, SF_DIR),
        "quality_score": lambda: contract.q_quality(spark, SF_DIR),
        "lang_id": lambda: contract.q_lang_id(spark, SF_DIR),
        "fingerprint": lambda: contract.q_fingerprint(spark, SF_DIR),
        "pii_scrub": lambda: contract.q_pii_scrub(spark, SF_DIR),
        "html_extract": lambda: contract.q_html_extract(spark, SF_DIR),
        "crawl_pipeline": lambda: contract.q_crawl_pipeline(spark, SF_DIR),
        "repetition_stats": lambda: contract.q_repetition_stats(spark, SF_DIR),
        "repeated_ngrams": lambda: contract.q_repeated_ngrams(spark, SF_DIR),
        "span_dedup": lambda: contract.q_span_dedup(spark, SF_DIR),
        "corpus_stats": lambda: contract.q_corpus_stats(spark, SF_DIR),
        "chunk_documents": lambda: contract.q_chunk_documents(spark, SF_DIR),
        "chunk_documents_bpe": lambda: contract.q_chunk_documents_bpe(
            spark, SF_DIR
        ),
        "text_embed": lambda: contract.q_text_embed(spark, SF_DIR),
        "contamination_check": lambda: contract.q_contamination_check(
            spark, SF_DIR
        ),
        "corpus_sample": lambda: contract.q_corpus_sample(spark, SF_DIR),
        "mixture_sample": lambda: contract.q_mixture_sample(spark, SF_DIR),
        "stratified_take": lambda: contract.q_stratified_take(spark, SF_DIR),
        "heavy_hitters": lambda: contract.q_heavy_hitters(spark, SF_DIR),
        "embedding_topk": lambda: contract.q_embedding_topk(spark, SF_DIR),
        "embedding_near_dups": lambda: contract.q_emb_near_dups(spark, SF_DIR),
        "ivf_topk": lambda: contract.q_ivf_topk(spark, SF_DIR),
        "ivfpq_topk": lambda: contract.q_ivfpq_topk(spark, SF_DIR),
        "knn_topk": lambda: contract.q_knn_topk(spark, SF_DIR),
        "range_join": lambda: contract.q_range_join(spark, SF_DIR),
        "ngram_lm_ppl": lambda: contract.q_ngram_lm_ppl(spark, SF_DIR),
        "collocations": lambda: contract.q_collocations(spark, SF_DIR),
        "url_normalize": lambda: contract.q_url_normalize(spark, SF_DIR),
        "domain_stats": lambda: contract.q_domain_stats(spark, SF_DIR),
        "pack_sequences": lambda: contract.q_pack_sequences(spark, SF_DIR),
        "geofence_counts": lambda: contract.q_geofence_counts(spark, SF_DIR),
        "elevation_profile": lambda: contract.q_elevation_profile(spark, SF_DIR),
        "line_of_sight": lambda: contract.q_line_of_sight(spark, SF_DIR),
        "viewshed": lambda: contract.q_viewshed(spark, SF_DIR),
        "asof_join": lambda: contract.q_asof_join(spark, SF_DIR),
        "interval_join": lambda: contract.q_interval_join(spark, SF_DIR),
        "funnel": lambda: contract.q_funnel(spark, SF_DIR),
        "retention": lambda: contract.q_retention(spark, SF_DIR),
        "geofence_transitions": lambda: contract.q_geofence_transitions(
            spark, SF_DIR
        ),
        "quality_classifier": lambda: contract.q_quality_classifier(
            spark, SF_DIR
        ),
        "tile_floor_keys": lambda: contract.q_tile_floor_keys(spark, SF_DIR),
        "slippy_tiles": lambda: contract.q_slippy_tiles(spark, SF_DIR),
        "tile_pyramid": lambda: contract.q_tile_pyramid(spark, SF_DIR),
        "priority_coalesce": lambda: contract.q_priority_coalesce(spark, SF_DIR),
        "coord_extract": lambda: contract.q_coord_extract(spark, SF_DIR),
        "events_rollup": lambda: contract.q_events_rollup(spark, SF_DIR),
        "sessionize": lambda: contract.q_sessionize(spark, SF_DIR),
        "zonal_stats": lambda: contract.q_zonal_stats(spark, SF_DIR),
        "rasterize_grid": lambda: contract.q_rasterize_grid(spark, SF_DIR),
        "terrain_slope": lambda: contract.q_terrain_slope(spark, SF_DIR),
        "flow_accumulation": lambda: contract.q_flow_accumulation(spark, SF_DIR),
        "overview_tiles": lambda: contract.q_overview_tiles(spark, SF_DIR),
        "cog_overviews": lambda: contract.q_cog_overviews(spark, SF_DIR),
        "raster_warp": lambda: contract.q_raster_warp(spark, SF_DIR),
        "raster_polygonize": lambda: contract.q_raster_polygonize(
            spark, SF_DIR
        ),
        "raster_sieve": lambda: contract.q_raster_sieve(spark, SF_DIR),
        "raster_fillnodata": lambda: contract.q_raster_fillnodata(
            spark, SF_DIR
        ),
        "raster_proximity": lambda: contract.q_raster_proximity(
            spark, SF_DIR
        ),
        "raster_colorrelief": lambda: contract.q_raster_colorrelief(
            spark, SF_DIR
        ),
        "region_polygons": lambda: contract.q_region_polygons(
            spark, SF_DIR
        ),
        "raster_grid": lambda: contract.q_raster_grid(spark, SF_DIR),
        "polygon_burn": lambda: contract.q_polygon_burn(spark, SF_DIR),
        "semantic_dedup": lambda: contract.q_semantic_dedup(
            spark, SF_DIR
        ),
        "contour_lines": lambda: contract.q_contour_lines(spark, SF_DIR),
        "raster_diff": lambda: contract.q_raster_diff(spark, SF_DIR),
        "raster_formats": lambda: contract.q_raster_formats(spark, SF_DIR),
        "remote_elevation": lambda: contract.q_remote_elevation(
            spark, SF_DIR
        ),
        "proj4_elevation": lambda: contract.q_proj4_elevation(
            spark, SF_DIR
        ),
        "terrain_tiles_export": lambda: contract.q_terrain_tiles_export(
            spark, SF_DIR
        ),
        "terrain_pyramid_export": lambda: (
            contract.q_terrain_pyramid_export(spark, SF_DIR)
        ),
        # session-J family (VERDICT r4 Next #10)
        "hll_distinct": lambda: contract.q_hll_distinct(spark, SF_DIR),
        "buffer_pip": lambda: contract.q_buffer_pip(spark, SF_DIR),
        "dissolve_regions": lambda: contract.q_dissolve_regions(
            spark, SF_DIR
        ),
        "exact_quantiles": lambda: contract.q_exact_quantiles(
            spark, SF_DIR
        ),
        "raster_stats": lambda: contract.q_raster_stats(spark, SF_DIR),
        "interval_coverage": lambda: contract.q_interval_coverage(
            spark, SF_DIR
        ),
        "topk_per_group": lambda: contract.q_topk_per_group(spark, SF_DIR),
        "zonal_majority": lambda: contract.q_zonal_majority(spark, SF_DIR),
        # new in r5
        "wkt2_elevation": lambda: contract.q_wkt2_elevation(spark, SF_DIR),
        "iceberg_documents": lambda: contract.q_iceberg_documents(
            spark, SF_DIR
        ),
        "image_near_dups": lambda: contract.q_image_near_dups(
            spark, SF_DIR
        ),
        "exact_substr": lambda: contract.q_exact_substr(spark, SF_DIR),
    }
    for name, make in queries.items():
        timings[name], lo, hi = run(make)
        spreads[name] = [lo, hi]

    total = sum(timings.values())
    # the [min, max] spreads go to STDERR: the round driver keeps only
    # the last 2000 bytes of output and parses the final line as JSON —
    # round 3's spread-carrying line outgrew that window and the
    # headline metric was silently truncated off the front
    print(
        "bench spread (min/max of %d runs): %s"
        % (
            N_RUNS,
            json.dumps(
                {k: [round(v[0], 3), round(v[1], 3)]
                 for k, v in spreads.items()},
                separators=(",", ":"),
            ),
        ),
        file=sys.stderr,
    )
    # box-weather control riding WITH the bench record: the r3/r4
    # rounds showed per-query wall times swing 2-3x with co-tenant
    # memory-bandwidth collapse (clean-day 1-stream ~55-60 GB/s vs
    # collapsed ~15-25); recording the control next to the timings lets
    # any later reader attribute drift without a separate session
    try:
        import importlib.util as _ilu

        _spec = _ilu.spec_from_file_location(
            "bench_controls", os.path.join(REPO, "tools",
                                           "bench_controls.py"))
        _bc = _ilu.module_from_spec(_spec)
        _spec.loader.exec_module(_bc)
        bw1 = _bc.run(_bc._bw_worker, 1, dur=3.0) / 1e9
        bw8 = _bc.run(_bc._bw_worker, 8, dur=3.0) / 1e9
        weather = {"bw_gbps_1": round(bw1, 1), "bw_gbps_8": round(bw8, 1)}
    except Exception:
        weather = {}
    # diagnostics that used to ride the stdout line: with 12 more bench
    # queries the single JSON line must stay under the driver's 2000-byte
    # tail window, so the derivable/secondary fields move to stderr
    print(
        "bench aux: "
        + json.dumps(
            {
                "runs_per_query": N_RUNS,
                "weather": weather,
                "elevation_coords": n_coords,
                "elevation_wall_us_per_coord": round(
                    timings["elevation_e2e"] / n_coords * 1e6, 3
                ),
                "elevation_stage_split": {
                    "extract": round(t_extract, 3),
                    "resolve": round(
                        max(timings["elevation_e2e"] - t_extract, 0.0), 3
                    ),
                },
            },
            separators=(",", ":"),
        ),
        file=sys.stderr,
    )
    # TWO stdout lines, the short headline LAST: the driver keeps only
    # the last 2000 bytes of combined output and parses the FINAL line
    # as JSON. At 89 queries one combined line is ~2.1 kB — the headline
    # would silently truncate off the front (round 3 lost BENCH to
    # exactly this). Split, the ~1.6 kB per-query line plus the ~0.3 kB
    # headline both sit inside the tail window, and the parsed final
    # line can never truncate regardless of how many queries register.
    # full-precision per-query record for the judge, independent of any
    # stdout window (the driver commits uncommitted files at round end)
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
            json.dump(
                {
                    "sf": sf, "cores": CPUS, "runs_per_query": N_RUNS,
                    "queries_sec": {
                        k: round(v, 3) for k, v in timings.items()},
                    "spread_sec": {
                        k: [round(v[0], 3), round(v[1], 3)]
                        for k, v in spreads.items()},
                },
                f, indent=1,
            )
    except OSError:
        pass  # read-only checkout: the stdout protocol still carries all
    print(
        json.dumps(
            # centisecond INTEGERS: same precision as 2 decimals, ~130
            # bytes shorter at 89 queries — keeps this line plus the
            # headline inside the driver's 2000-byte tail window
            # "qcs" = query centiseconds (documented in docs/BENCH.md;
            # full-precision twin in BENCH_DETAIL.json)
            {"qcs": {
                k: int(round(v * 100)) for k, v in timings.items()}},
            separators=(",", ":"),
        ),
        flush=True,
    )
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
                "cores": CPUS,
                "elevation_coords_per_sec": round(
                    n_coords / timings["elevation_e2e"], 1
                ),
                # day-invariant gate twin: CPU burned per coordinate
                # (all JVM + Python-worker threads)
                "elevation_cpu_us_per_coord": round(
                    elev_cpu_per_run / n_coords * 1e6, 3
                ),
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
