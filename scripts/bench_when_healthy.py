"""Calibrator-gated bench capture (VERDICT r11 next-round #3).

The host VM fluctuates 2-4x idle and can flip mid-run (r12 observed
x0.41 -> x7.44 in twelve minutes), so a bench total is only a
committable healthy-window record when the calibrator reads healthy
BOTH immediately before and immediately after the run. This script
enforces that protocol: calibrate -> (if healthy) bench once ->
calibrate again -> append a JSON line with both stamps to
.localdata/bench_healthy_log.jsonl. Run it opportunistically; keep
the min over healthy-healthy captures.

Usage: python scripts/bench_when_healthy.py
Exit: 0 captured (both stamps healthy), 3 skipped (unhealthy window),
      4 window flipped mid-run (capture recorded but not healthy).
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
LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".localdata", "bench_healthy_log.jsonl")


def factor() -> float:
    single_ms, _ = probe()
    return single_ms / REF_SINGLE_MS


def main() -> int:
    f_pre = factor()
    print(f"pre-calibration: x{f_pre:.2f}")
    if f_pre > HEALTHY:
        print("window not healthy - skipping capture")
        return 3
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
        "healthy_pair": f_pre <= HEALTHY and f_post <= HEALTHY,
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
