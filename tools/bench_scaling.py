"""Scaling-efficiency evidence for the BASELINE.json north rule.

No real cluster exists in this sandbox, so the N -> 4N executor criterion
is evidenced the way BASELINE.md prescribes: the IDENTICAL job (documents
-> extraction -> tile join -> raster interpolation -> priority coalesce)
runs at two local parallelism levels on the SAME input, and we report
throughput at both plus efficiency = (tp_4N / tp_N) / 4.

The input is sized so steady-state per-core work dominates fixed overhead
(JVM+scheduler setup, Python-worker spin-up) — the regime a 10^9-row
cluster job lives in. Each level runs in a fresh subprocess (own JVM) so
nothing is shared; one small warmup run inside each subprocess pays the
one-time JIT/codegen/worker-pool cost that a long job amortizes to zero.

    python tools/bench_scaling.py                  # N=8 vs 4N=32
    SCALING_N_DOCS=400000 python tools/bench_scaling.py
    SCALING_PINNED=1 SCALING_LEVELS=4,16 python tools/bench_scaling.py
        # equal-resource protocol: taskset pins the whole process tree
        # (JVM task threads AND Python UDF workers) to exactly N CPUs

Appends to docs/SCALING_RUNS.md and prints one JSON line; the curated
analysis lives in docs/BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SCALING_N_DOCS", "400000"))
LEVELS = [int(x) for x in os.environ.get("SCALING_LEVELS", "8,32").split(",")]
PINNED = os.environ.get("SCALING_PINNED", "") not in ("", "0")
N_RUNS = int(os.environ.get("SCALING_RUNS", "5"))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as contract
from opentopodata_spark.session import get_spark

cores = {cores}
spark = get_spark(app_name=f"otds-scaling-{{cores}}", cores=cores,
                  shuffle_partitions=max(cores, 8))
spark.sparkContext.setLogLevel("ERROR")

# warmup: small run with the SAME file fan-out so the whole Python
# worker pool spawns + imports pandas (the one-time cost a 10^9-row job
# amortizes to zero); also pays JIT/codegen
for _ in range(2):
    contract._run_elevation(spark, n_docs=2000, n_files=64).write.format(
        "noop").mode("overwrite").save()

df = contract._run_elevation(spark, n_docs={n_docs}, n_files=64)
n = df.count()
# median of 5: local-mode runs have multi-second GC / worker-pool spikes
# that a single sample conflates with steady-state throughput
import statistics
ts = []
for _ in range({n_runs}):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    ts.append(time.time() - t0)
dt = statistics.median(ts)
print(json.dumps({{"cores": cores, "coords": n, "seconds": round(dt, 3),
                   "runs": [round(x, 2) for x in ts],
                   "coords_per_sec": round(n / dt, 1)}}))
"""


def measure(cores: int) -> dict:
    code = _CHILD.format(repo=REPO, cores=cores, n_docs=N_DOCS, n_runs=N_RUNS)
    cmd = [sys.executable, "-c", code]
    if PINNED:
        # SCALING_CPU_OFFSET shifts the pinned window (e.g. 24 -> CPUs
        # 24-31 for 8 cores): CPUs 0-7 service NIC/disk IRQs on this box
        # and measured ~10% slower at the 8-stream level (docs/BENCH.md)
        base = int(os.environ.get("SCALING_CPU_OFFSET", "0"))
        cmd = ["taskset", "-c", f"{base}-{base + cores - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"scaling child at cores={cores} failed")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["pinned"] = PINNED
    return r


def main() -> None:
    # one-time input + raster fixture build, shared by both levels
    import __spark_entry__ as contract

    contract._prepare_elevation_inputs(N_DOCS, n_files=64)

    results = [measure(c) for c in LEVELS]
    lo, hi = results[0], results[-1]
    ratio = hi["cores"] / lo["cores"]
    eff = (hi["coords_per_sec"] / lo["coords_per_sec"]) / ratio
    pair_eff = {
        f'{lo["cores"]}->{r["cores"]}': round(
            (r["coords_per_sec"] / lo["coords_per_sec"])
            / (r["cores"] / lo["cores"]),
            3,
        )
        for r in results[1:]
    }
    summary = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "target": 0.8,
        "pinned": PINNED,
        "input_docs": N_DOCS,
        "levels": results,
        "pairwise_efficiency": pair_eff,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", "SCALING_RUNS.md"), "a") as f:
        f.write(_report(summary) + "\n---\n")


def _report(s: dict) -> str:
    proto = "taskset-pinned (equal-resource)" if s.get("pinned") else "local[N]"
    lines = [
        f"# Scaling run — protocol: {proto}\n",
        "Identical elevation job (documents -> extraction -> tile join -> "
        "raster interpolation -> priority coalesce) on the SAME input at two "
        "local parallelism levels, fresh JVM each, steady-state timing "
        "(one warmup pays one-time JIT/worker-pool cost).\n",
        f"Input: {s['input_docs']} documents (~{s['levels'][0]['coords']} "
        "coordinates after extraction), 64 parquet files.\n",
        "| cores | coords | seconds | coords/sec |",
        "|---|---|---|---|",
    ]
    for r in s["levels"]:
        lines.append(
            f"| {r['cores']} | {r['coords']} | {r['seconds']} | {r['coords_per_sec']} |"
        )
    ratio = s["levels"][-1]["cores"] // s["levels"][0]["cores"]
    lines += [
        "",
        f"**Scaling efficiency ({s['levels'][0]['cores']} -> "
        f"{s['levels'][-1]['cores']} cores, x{ratio}): {s['value']}** "
        f"(target >= {s['target']}).\n",
        "Pairwise efficiencies vs the lowest level: "
        + ", ".join(f"{k}: {v}" for k, v in s.get("pairwise_efficiency", {}).items())
        + "\n",
        "Reproduce: `python tools/bench_scaling.py` "
        "(SCALING_LEVELS=8,16,32 SCALING_N_DOCS=2400000 for the full grid)\n",
    ]
    return "\n".join(lines)


if __name__ == "__main__":
    main()
