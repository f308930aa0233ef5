"""Session-window state under a PRODUCTION watermark (round-9 follow-up
to docs/SCALE.md §13: the replay harness's 3650-day watermark holds
every session in state until the sentinel flush — ~1 state row per
session, 954 651 at sf1 — which is a replay artifact, not the
operator's production behavior).

This script replays the same 1 M events in EVENT-TIME ORDER (the
production arrival pattern: files written as sequential ts ranges with
increasing mtimes, one file per micro-batch) under a realistic
watermark, and reports the PEAK state rows per micro-batch. Expected:
state ≈ sessions still open within (watermark + gap) of the max event
time seen — bounded by the eviction horizon, not by history.

Usage: python scripts/session_watermark_scale.py [sf_dir] [watermark]
  defaults: .localdata/sf1  "1 day"
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FILES = 20


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    watermark = sys.argv[2] if len(sys.argv) > 2 else "1 day"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", os.environ.get("MIMIC_DRIVER_MEM", "16g"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from vector_search_service_spark.sources.tables import load_table
    from vector_search_service_spark.streaming.windows import session_windows

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    n_events = ev.count()

    root = tempfile.mkdtemp(prefix="sess_wm_")
    try:
        src = f"{root}/src"
        os.makedirs(src)
        # event-time-ordered micro-batches: N_FILES sequential ts
        # ranges, each written as its own file with increasing mtime
        # (FileStreamSource orders by mtime) — the production arrival
        # pattern, where the watermark advances monotonically and
        # evicts closed sessions as it goes.
        ranged = ev.repartitionByRange(N_FILES, F.col("ts"))
        ranged.sortWithinPartitions("ts").write.parquet(f"{root}/ranged")
        files = sorted(glob.glob(f"{root}/ranged/part-*.parquet"))
        # part-file names sort in range order for repartitionByRange
        for i, f in enumerate(files):
            dst = f"{src}/batch_{i:04d}.parquet"
            shutil.copy(f, dst)
            os.utime(dst, (1e9 + i, 1e9 + i))

        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            session_windows(stream, gap="30 minutes", watermark=watermark)
            .writeStream.format("memory")
            .queryName("sess_wm")
            .outputMode("append")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        t0 = time.time()
        if not q.awaitTermination(560):
            q.stop()
            raise TimeoutError("replay exceeded 560s")
        wall = time.time() - t0
        max_rows = max_bytes = 0
        for p in q.recentProgress:
            for so in p.get("stateOperators", []):
                max_rows = max(max_rows, so.get("numRowsTotal", 0))
                max_bytes = max(max_bytes, so.get("memoryUsedBytes", 0))
        emitted = spark.table("sess_wm").count()
        print(f"{n_events} events, watermark={watermark!r}: "
              f"wall {wall:.1f}s, emitted {emitted} closed sessions, "
              f"peak state {max_rows} rows / {max_bytes / 1e6:.1f} MB")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
