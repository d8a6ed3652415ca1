"""Hardware-ceiling control for the scaling gate (BENCH/BASELINE.md).

Measures how the *machine itself* scales from N to 4N fully-independent
CPU-bound processes — no shuffle, no JVM, no coordination. If the
engine's N->4N efficiency matches the burn's, the engine is
hardware-bound at that range, not overhead-bound.

Method: K worker processes each loop a fixed-size numpy integer-hash
kernel (no BLAS threading, ~1 MB working set so it is core-bound, not
memory-bandwidth-bound) for a fixed wall window; aggregate iterations/s
is the throughput. Warmup window first; best-of-R windows per level
(the sandbox host's background load drifts, see
BENCH/BASELINE.md).

Writes BENCH/CPU_BURN.json and prints it.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

WINDOW_S = float(os.environ.get("BURN_WINDOW_S", "8"))
REPEATS = int(os.environ.get("BURN_REPEATS", "3"))
LEVELS = [int(x) for x in os.environ.get("BURN_LEVELS", "2,8,32").split(",")]


def _worker(stop_t: float, out):
    # integer mix kernel: branchless, cache-resident, no BLAS threads
    x = np.arange(131072, dtype=np.uint64)
    iters = 0
    while time.time() < stop_t:
        x = x * np.uint64(2654435761) + np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(17)
        iters += 1
    out.put(iters)


def burn(n_procs: int, window_s: float) -> float:
    out = mp.Queue()
    stop_t = time.time() + window_s
    procs = [mp.Process(target=_worker, args=(stop_t, out)) for _ in range(n_procs)]
    t0 = time.time()
    for p in procs:
        p.start()
    total = sum(out.get() for _ in procs)
    for p in procs:
        p.join()
    return total / (time.time() - t0)


def main():
    results = {}
    burn(max(LEVELS), WINDOW_S / 2)  # warm the host at full width
    for n in LEVELS:
        best = 0.0
        for _ in range(REPEATS):
            best = max(best, burn(n, WINDOW_S))
        results[f"iters_per_sec_{n}"] = round(best, 1)
        print(f"  burn[{n}]: {best:.1f} iters/s", file=sys.stderr)
    for i in range(len(LEVELS) - 1):
        a, b = LEVELS[i], LEVELS[i + 1]
        ratio = b // a
        eff = results[f"iters_per_sec_{b}"] / (ratio * results[f"iters_per_sec_{a}"])
        results[f"hw_efficiency_{a}_to_{b}"] = round(eff, 3)
    results["window_s"] = WINDOW_S
    results["repeats"] = REPEATS
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
    with open(os.path.join(here, "BENCH", "CPU_BURN.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
