"""Calibrator-gated bench capture (VERDICT r11 next-round #3).

The host VM fluctuates 2-4x idle and can flip mid-run (r12 observed
x0.41 -> x7.44 in twelve minutes), so a bench total is only a
committable healthy-window record when the calibrator reads healthy
BOTH immediately before and immediately after the run. This script
enforces that protocol: calibrate -> (if healthy) bench once ->
calibrate again -> append a JSON line with both stamps to
.localdata/bench_healthy_log.jsonl. Run it opportunistically; keep
the min over healthy-healthy captures.

r12 extension — SPARK canary. Two healthy-stamped back-to-back
captures measured 85.0 s and 46.7 s (1.8x apart): the CPU-matmul
calibrator does NOT predict Spark walls — whatever the hypervisor
throttles (scheduler latency / syscall path), it is invisible to a
numpy matmul but dominates a JVM shuffle job. So each capture also
runs a FIXED in-memory Spark job (fresh JVM, no file I/O:
range -> hash -> groupBy count, 32 threads) and records its wall as
``canary_s``. A capture is a record candidate only when the calib
pair is healthy AND the canary is within CANARY_HEALTHY_S; per-query
comparisons should quote the canary alongside.

Usage: python scripts/bench_when_healthy.py
Exit: 0 captured (all gates healthy), 3 skipped (unhealthy window),
      4 gates not all healthy (capture recorded anyway).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.window_calibrate import REF_SINGLE_MS, probe  # noqa: E402

HEALTHY = 1.5
#: healthy band for the Spark canary wall (seconds) — committed from
#: the r12 idle distribution: six consecutive idle runs measured
#: 3.3/3.3/3.4/3.8/4.0/4.5 s (docs/ROUND12.md §10), so the band is
#: the observed idle max; re-derive if the host image changes.
CANARY_HEALTHY_S = 4.5
LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".localdata", "bench_healthy_log.jsonl")

_CANARY_CODE = """
import time
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(20_000_000)
df.count()  # warm the session; excluded from the measured wall
t0 = time.perf_counter()
n = (df.withColumn("k", F.pmod(F.col("id") * 2654435761, F.lit(9973)))
       .groupBy("k").count().count())
print(f"CANARY {time.perf_counter() - t0:.3f} {n}")
"""


def factor() -> float:
    single_ms, _ = probe()
    return single_ms / REF_SINGLE_MS


def spark_canary() -> float | None:
    """Wall of the fixed in-memory shuffle job in a fresh JVM (JVM
    startup excluded). None if the canary process failed."""
    out = subprocess.run([sys.executable, "-c", _CANARY_CODE],
                         capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.startswith("CANARY "):
            return float(line.split()[1])
    return None


def main() -> int:
    f_pre = factor()
    print(f"pre-calibration: x{f_pre:.2f}")
    if f_pre > HEALTHY:
        print("window not healthy - skipping capture")
        return 3
    canary = spark_canary()
    print(f"spark canary: {canary}s")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    wall = time.time() - t0
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
    f_post = factor()
    print(f"post-calibration: x{f_post:.2f}; bench wall {wall:.0f}s")
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "calib_pre": round(f_pre, 2),
        "calib_post": round(f_post, 2),
        "canary_s": canary,
        "healthy_pair": (f_pre <= HEALTHY and f_post <= HEALTHY
                         and canary is not None
                         and canary <= CANARY_HEALTHY_S),
        "bench": json.loads(line) if line.startswith("{") else None,
        "rc": out.returncode,
    }
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    total = rec["bench"]["value"] if rec["bench"] else None
    print(f"captured total={total} healthy_pair={rec['healthy_pair']} -> {LOG}")
    return 0 if rec["healthy_pair"] else 4


if __name__ == "__main__":
    raise SystemExit(main())
