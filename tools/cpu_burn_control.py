"""Hardware-ceiling controls for the scaling gate (BENCH/BASELINE.md).

Measures how the *machine itself* scales from N to 4N fully-independent
worker processes — no shuffle, no JVM, no coordination. Two ceilings:

- **cpu**: a cache-resident integer-hash kernel (~1 MB working set) —
  pure core throughput, blind to the memory system.
- **membw**: a STREAM-triad-style kernel over a 128 MB working set —
  aggregate memory bandwidth, the resource a parquet-scan + regex
  pipeline actually saturates when 32 threads share one socket. On a
  real cluster 4N executors bring 4x sockets (and 4x bandwidth); in
  this sandbox 8->32 threads share ONE socket's bandwidth, so the
  membw ceiling is the honest comparator for scan-heavy jobs.

If the engine's N->4N efficiency matches the relevant burn's, the
engine is hardware-bound at that range, not overhead-bound.

Best-of-R windows per level (the host's background load drifts, see
BENCH/BASELINE.md). Writes BENCH/CPU_BURN.json and prints it.
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
MEMBW_MB = int(os.environ.get("BURN_MEMBW_MB", "128"))


def _worker_cpu(stop_t: float, out):
    # integer mix kernel: branchless, cache-resident, no BLAS threads
    x = np.arange(131072, dtype=np.uint64)
    t0 = time.time()
    iters = 0
    while time.time() < stop_t:
        x = x * np.uint64(2654435761) + np.uint64(0x9E3779B97F4A7C15)
        x ^= x >> np.uint64(17)
        iters += 1
    out.put((iters, time.time() - t0))


def _worker_membw(stop_t: float, out):
    # STREAM-triad-ish: a = a*s + b over a working set far beyond LLC,
    # so each iteration moves ~3x the array through DRAM
    n = MEMBW_MB * 1024 * 1024 // 8
    a = np.ones(n, dtype=np.float64)
    b = np.full(n, 0.5, dtype=np.float64)
    # self-timed productive window: the 256 MB allocation above must not
    # eat the measurement (it zeroed short windows entirely)
    t0 = time.time()
    stop_t = max(stop_t, t0 + 1.0)
    iters = 0
    while time.time() < stop_t:
        np.multiply(a, 0.999999, out=a)
        np.add(a, b, out=a)
        iters += 1
    out.put((iters, time.time() - t0))


_WORKERS = {"cpu": _worker_cpu, "membw": _worker_membw}


def burn(n_procs: int, window_s: float, mode: str = "cpu") -> float:
    out = mp.Queue()
    stop_t = time.time() + window_s
    procs = [
        mp.Process(target=_WORKERS[mode], args=(stop_t, out)) for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    # aggregate steady-state rate: each worker reports (iters, its own
    # productive seconds); sum of per-worker rates
    rate = 0.0
    for _ in procs:
        iters, dt = out.get()
        if dt > 0:
            rate += iters / dt
    for p in procs:
        p.join()
    return rate


def main():
    results = {}
    burn(max(LEVELS), WINDOW_S / 2)  # warm the host at full width
    for mode, key in (("cpu", "iters_per_sec"), ("membw", "membw_iters_per_sec")):
        for n in LEVELS:
            best = 0.0
            for _ in range(REPEATS):
                best = max(best, burn(n, WINDOW_S, mode=mode))
            results[f"{key}_{n}"] = round(best, 1)
            print(f"  burn[{mode}][{n}]: {best:.1f} iters/s", file=sys.stderr)
        for i in range(len(LEVELS) - 1):
            a, b = LEVELS[i], LEVELS[i + 1]
            ratio = b // a
            denom = ratio * results[f"{key}_{a}"]
            eff = results[f"{key}_{b}"] / denom if denom > 0 else 0.0
            prefix = "hw_efficiency" if mode == "cpu" else "hw_membw_efficiency"
            results[f"{prefix}_{a}_to_{b}"] = round(eff, 3)
    results["window_s"] = WINDOW_S
    results["repeats"] = REPEATS
    results["membw_working_set_mb"] = MEMBW_MB
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
    with open(os.path.join(here, "BENCH", "CPU_BURN.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
