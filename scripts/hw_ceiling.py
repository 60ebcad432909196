"""Same-day hardware scaling ceiling (BENCH.md §0/§1c method, made
reproducible): pure-Python md5 loops via multiprocessing — no Spark, no
JVM — measure what N→4N processes actually buys on this host TODAY.
Shared/throttled VMs drift ±30% day to day, so every pipeline
efficiency number must be read against a SAME-DAY ceiling run.

Usage: python scripts/hw_ceiling.py [n_procs] [n_procs2] [hashes_per_proc]
Default 2 8 3_000_000. Prints one JSON line with both rates and the
ceiling eff = rate(4N) / (4 * rate(N)).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _worker(n: int) -> int:
    h = 0
    for i in range(n):
        h ^= hashlib.md5(b"%d" % i).digest()[0]
    return h


def rate(procs: int, per_proc: int) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(_worker, [per_proc] * procs)
        dt = time.perf_counter() - t0
    return procs * per_proc / dt


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n2 = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000
    # interleave to cancel slow drift: N, 4N, N, 4N — keep best of each
    r1, r2 = rate(n1, per), rate(n2, per)
    r1, r2 = max(r1, rate(n1, per)), max(r2, rate(n2, per))
    print(json.dumps({
        "procs_n": n1, "procs_4n": n2,
        "mhash_per_sec_n": round(r1 / 1e6, 2),
        "mhash_per_sec_4n": round(r2 / 1e6, 2),
        "ceiling_eff": round(r2 / (r1 * (n2 / n1)), 3),
    }))


if __name__ == "__main__":
    main()
