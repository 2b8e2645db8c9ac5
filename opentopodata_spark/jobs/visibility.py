"""Visibility batch jobs: line-of-sight and viewshed over a dataset
config, spark-submit-able like the other `jobs/` entry points.

  python -m opentopodata_spark.jobs.visibility los \
      --config cfg.yaml --datasets my_dem --pairs pairs.parquet \
      --out /out/los --n-samples 65 [--observer-height 2.0] [--cores 8]

  python -m opentopodata_spark.jobs.visibility viewshed \
      --config cfg.yaml --datasets my_dem --observers obs.parquet \
      --out /out/vs --radius-m 20000 --n-rays 32 --n-samples 65 \
      [--summary-only]

Inputs: ``pairs`` parquet with (los_id, lat_a, lon_a, lat_b, lon_b);
``observers`` parquet with (obs_id, lat, lon). Outputs parquet + one
JSON stats line on stdout (the jobs/ contract).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from .. import config as _config
from ..session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opentopodata_spark.jobs.visibility",
        description="Terrain line-of-sight / viewshed batch jobs.",
    )
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--master", default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", required=True)
        sp.add_argument("--datasets", required=True,
                        help="dataset name (or comma list, priority order)")
        sp.add_argument("--out", required=True)
        sp.add_argument("--interpolation", default="bilinear")
        sp.add_argument("--n-samples", type=int, default=65)
        sp.add_argument("--observer-height", type=float, default=2.0)
        sp.add_argument("--refraction", type=float, default=0.13)
        sp.add_argument("--no-curvature", action="store_true")

    los = sub.add_parser("los", help="point-to-point line of sight")
    common(los)
    los.add_argument("--pairs", required=True,
                     help="parquet of (los_id, lat_a, lon_a, lat_b, lon_b)")
    los.add_argument("--target-height", type=float, default=0.0)

    vs = sub.add_parser("viewshed", help="radial visibility per observer")
    common(vs)
    vs.add_argument("--observers", required=True,
                    help="parquet of (obs_id, lat, lon)")
    vs.add_argument("--radius-m", type=float, required=True)
    vs.add_argument("--n-rays", type=int, default=32)
    vs.add_argument("--summary-only", action="store_true",
                    help="write only the per-observer rollup")
    return p


def run(argv: list[str] | None = None) -> dict:
    from ..operators import elevation as _elevation
    from ..operators import paths as _paths

    ns = build_parser().parse_args(argv)
    spark = get_spark(
        app_name=f"otds-visibility-{ns.cmd}",
        cores=ns.cores,
        shuffle_partitions=ns.shuffle_partitions,
        master=ns.master,
    )
    t0 = time.time()
    datasets = _config.load_datasets(ns.config)
    ordered = []
    for name in ns.datasets.split(","):
        ordered.extend(_config.resolve_dataset_names(name.strip(), datasets))
    resolver = _elevation.ElevationResolver(spark, ordered, ns.interpolation)
    stats: dict = {"job": f"visibility-{ns.cmd}", "datasets": ns.datasets}

    if ns.cmd == "los":
        pairs = spark.read.parquet(ns.pairs)
        out = _paths.line_of_sight(
            resolver, pairs, ns.n_samples,
            observer_height=ns.observer_height,
            target_height=ns.target_height,
            refraction=ns.refraction,
            use_curvature=not ns.no_curvature,
        )
        out.write.mode("overwrite").parquet(ns.out)
        res = spark.read.parquet(ns.out)
        stats.update(
            pairs=res.count(),
            visible=res.where(res.visible).count(),
            out=ns.out,
        )
    else:
        observers = spark.read.parquet(ns.observers)
        vs = _paths.viewshed(
            resolver, observers, ns.radius_m, ns.n_rays, ns.n_samples,
            observer_height=ns.observer_height,
            refraction=ns.refraction,
            use_curvature=not ns.no_curvature,
        )
        if ns.summary_only:
            _paths.viewshed_summary(vs).write.mode("overwrite").parquet(
                ns.out
            )
        else:
            vs.write.mode("overwrite").parquet(f"{ns.out}/samples")
            samples = spark.read.parquet(f"{ns.out}/samples")
            _paths.viewshed_summary(samples).write.mode(
                "overwrite"
            ).parquet(f"{ns.out}/summary")
        summary_path = ns.out if ns.summary_only else f"{ns.out}/summary"
        s = spark.read.parquet(summary_path)
        stats.update(observers=s.count(), out=ns.out)

    stats["seconds"] = round(time.time() - t0, 3)
    return stats


def main(argv: list[str] | None = None) -> int:
    try:
        stats = run(argv)
    except (ValueError, FileNotFoundError) as e:
        print(json.dumps({"status": "INVALID_REQUEST", "error": str(e)}))
        return 2
    print(json.dumps({"status": "OK", **stats}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
