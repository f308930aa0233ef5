"""Host-window health probe — the throttle detector behind the bench
adjudications (docs/ROUND10.md §5, ROUND11.md §0: identical code has
measured 7.8-48 s walls across host windows; per-query bench deltas
are meaningless without knowing the window's speed).

Protocol: run on an OTHERWISE-IDLE host (no pytest/bench in flight),
compare against the committed healthy-window reference below, and
stamp the factor next to any wall-clock claim. Bands (single-core
factor; matches main()): <= 1.5 — healthy, totals comparable;
1.5-3.0 — degraded, trust only large per-query deltas with plan
diffs; > 3.0 — throttled, record structure (job counts, plan shapes,
file counts), not walls. The bands are deliberately wide because the
reference itself is the idle MEDIAN of a shared VM that fluctuates
~2-4x even when idle (r11 measured 12-47 ms for the identical
single matmul across six consecutive idle runs) — a <=1.15 cutoff
would classify ordinary idle jitter as degradation (ADVICE r11 #2:
the docstring previously said 1.15/1.5 while the code enforced
1.5/3.0; the code bands are the committed protocol).

Usage: python scripts/window_calibrate.py
"""

from __future__ import annotations

import time

import numpy as np

# Reference measured on this repo's build host while idle (r11, six
# consecutive idle runs: single 12/13/14/25/34/47 ms, parallel
# 0.55-1.9 s — this shared VM fluctuates ~2-4x even idle, so the
# reference is the idle MEDIAN, the SINGLE-CORE factor is the verdict
# signal, and the parallel factor is corroboration only). A window
# where the bench total doubles should read several x here.
REF_SINGLE_MS = 25.0
REF_PARALLEL_S = 0.80


def probe() -> tuple[float, float]:
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1500, 1500))
    a @ a  # warm
    singles = []
    for _ in range(5):
        t0 = time.perf_counter()
        a @ a
        singles.append(time.perf_counter() - t0)
    single_ms = min(singles) * 1000

    from concurrent.futures import ThreadPoolExecutor

    b = rng.standard_normal((800, 800))

    def work(_):
        for _ in range(3):
            b @ b

    pars = []
    for _ in range(3):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(16) as ex:
            list(ex.map(work, range(16)))
        pars.append(time.perf_counter() - t0)
    return single_ms, min(pars)


def main() -> int:
    single_ms, par_s = probe()
    f1 = single_ms / REF_SINGLE_MS
    f2 = par_s / REF_PARALLEL_S
    verdict = (
        "healthy" if f1 <= 1.5
        else "degraded" if f1 <= 3.0
        else "throttled"
    )
    print(
        f"single-matmul {single_ms:.0f} ms (x{f1:.2f}), "
        f"16-thread {par_s:.2f} s (x{f2:.2f}) -> window {verdict} "
        f"(single-core factor {f1:.2f})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
