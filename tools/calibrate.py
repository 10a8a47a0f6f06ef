"""Pure-CPU parallelism-ceiling calibration for the scaling evidence.

The north_rule's N->4N efficiency criterion is evidenced on local[N]
vs local[4N] (BENCH/scaling.py). That only means something if the HOST
can actually deliver a 4x core ratio at the chosen N — this sandbox's
"32 CPUs" are SMT threads on ~16 physical cores, shared with invisible
hypervisor co-tenants, so the deliverable ratio drifts between rounds.

This script measures the ceiling directly: a zero-allocation, zero-I/O,
whole-stage-codegen job (xxhash64+pmod fold over spark.range) at
local[N] and local[4N], warm-up + min-of-3. Any validation-pass
efficiency should be read against this ceiling: if the calibration
itself shows 3.1x, no workload can show 4.0x that day.

Usage: python tools/calibrate.py [N] [rows]   (default N=4, 4e9 rows)
Prints one JSON line with both times and the ceiling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
from jsi_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("calib", master="local[{cores}]")
df = spark.range(0, {rows}, numPartitions={parts})
for i in range(4):  # 1 warm-up + 3 measured
    t0 = time.time()
    # pmod keeps the ANSI-mode sum of longs in range (a raw sum of
    # xxhash64 values overflows int64 and aborts under ANSI)
    df.select(F.sum(F.pmod(F.xxhash64(F.col("id") + i),
                           F.lit(1000000))).alias("s")).collect()
    el = time.time() - t0
    if i:
        print("PASS %0.3f" % el)
"""


def run(cores: int, rows: int) -> dict:
    code = CHILD.format(repo=REPO, cores=cores, rows=rows,
                        parts=cores * 4)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, timeout=1800)
    times = [float(line.split()[1]) for line in out.stdout.splitlines()
             if line.startswith("PASS")]
    if not times:
        raise RuntimeError(out.stderr[-2000:])
    return {"cores": cores, "times": times, "min": min(times)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rows = int(float(sys.argv[2])) if len(sys.argv) > 2 else 4_000_000_000
    r_n = run(n, rows)
    r_4n = run(4 * n, rows)
    speedup = r_n["min"] / r_4n["min"]
    print(json.dumps({"n": n, "rows": rows,
                      "n_times": r_n["times"], "4n_times": r_4n["times"],
                      "speedup": round(speedup, 3),
                      "ceiling_efficiency": round(speedup / 4, 3)}))


if __name__ == "__main__":
    main()
