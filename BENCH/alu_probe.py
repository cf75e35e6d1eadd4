"""Fixed-work ALU probe — classifies host state around scaling runs.

Usage: ``python BENCH/alu_probe.py N`` runs the same integer loop in N
concurrent processes and prints the mean per-process wall time. The
workload is pure-Python integer ALU (no memory traffic), so its wall
time is a direct read on per-core CPU delivery:

- ~0.89 s/proc = the clean band in which the recorded 0.832 / 0.815
  scaling efficiencies were measured (BENCH/scaling_runs.json).
- 1.4-2.2 s/proc = the degraded band (uniform per-core slowdown,
  observed even at load < 1 — host/noisy-neighbor, not this engine).

Every scaling campaign in scaling_runs.json is annotated with the
probe reading taken immediately before and after, so efficiency
numbers can be attributed to code vs environment.
"""

import multiprocessing as mp
import sys
import time


def work(_):
    t0 = time.monotonic()
    x = 0
    for i in range(20_000_000):
        x += i * i
    return time.monotonic() - t0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    with mp.Pool(n) as p:
        ts = p.map(work, range(n))
    print(n, round(sum(ts) / len(ts), 3))
