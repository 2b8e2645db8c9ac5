"""Interleaved same-box A/B of contract queries between two checkouts.

VERDICT r4 Next #3: the r3->r4 bench comparison was contaminated (r3's
line truncated + collapsed-bandwidth session), so six queries carry an
unattributed >=1.5x drift. This harness runs ONE side's queries in one
process (median of N in-process reps after a warmup) and is invoked
alternately against two checkouts by the driver loop, bracketing each
cycle with tools/bench_controls.py readings — both sides see the same
box weather, so a persistent ratio is code, not weather.

Usage: python tools/bench_ab.py <repo_root> <sf_dir> <q1,q2,...> [reps]
Prints one JSON line {query: median_sec}.
"""

import json
import os
import sys
import time

repo, sf_dir, qcsv = sys.argv[1], sys.argv[2], sys.argv[3]
reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
sys.path.insert(0, repo)
os.chdir(repo)

import __spark_entry__ as contract  # noqa: E402
from opentopodata_spark.session import get_spark  # noqa: E402

spark = get_spark(
    app_name="bench-ab", cores=32, shuffle_partitions=32,
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
out = {}
for name in qcsv.split(","):
    fn = contract.queries()[name]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    out[name] = round(sorted(ts)[len(ts) // 2], 3)
print(json.dumps(out))
