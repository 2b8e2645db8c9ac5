"""Box-capability controls for interpreting scaling runs.

Two microbenchmarks that separate what the ENGINE does from what this
single shared-memory VM can deliver (docs/BENCH.md "Why the curve
bends"):

* memory bandwidth at N concurrent streams (64 MB numpy copies —
  read+write bytes counted). One socket: saturates at the box ceiling
  regardless of process count.
* pure-CPU throughput at N processes (sha256 chains, working set fits
  in L1). Scales ~linearly if the vCPUs are real.

Run BEFORE/AFTER a scaling session: if the elevation job's N-core level
moves while these controls don't, the delta is host-level cache/
bandwidth weather (noisy neighbors), not an engine change — measured
exactly that on 2026-08-17 (same code, same controls, pinned-8 wall
20.0s -> 24-27s day-over-day).

    python tools/bench_controls.py            # N in 1,2,8,16
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import time

import numpy as np


def _bw_worker(q, dur):
    a = np.empty(8 * 1024 * 1024, dtype=np.float64)  # 64 MB
    b = np.empty_like(a)
    a[:] = 1.0
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.time() - t0))


def _cpu_worker(q, dur):
    h = b"x" * 4096
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        h = hashlib.sha256(h).digest() + h[:4064]
        n += 1
    q.put(n / (time.time() - t0))


def run(worker, n, dur=6.0):
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q, dur)) for _ in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps)


def main() -> None:
    out = {"bandwidth_gbps": {}, "cpu_hashes_per_sec": {}}
    for n in (1, 2, 8, 16):
        out["bandwidth_gbps"][n] = round(run(_bw_worker, n) / 1e9, 1)
    for n in (1, 8):
        out["cpu_hashes_per_sec"][n] = int(run(_cpu_worker, n))
    c1, c8 = out["cpu_hashes_per_sec"][1], out["cpu_hashes_per_sec"][8]
    out["cpu_1_to_8_efficiency"] = round(c8 / (8 * c1), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
