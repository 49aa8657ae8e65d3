"""Verdict-r9 ask #8: measure whether minhash_lsh_candidates (classic,
num_hashes md5s per shingle) should ride the OPH signature path by
default at the ARTIFACT scale — the sf1 documents corpus (50k docs,
10-clone stress planting), where BENCH_r09 recorded 4.78 s, the
slowest artifact number.

Times three things end-to-end (signature build + banding + bucket
self-join + collect), best-of-N after a warm run with forced GC —
the bench.py discipline:

    classic  minhash_lsh_candidates  (16 md5s/shingle)
    oph      minhash_oph_candidates  (1 md5/shingle + bin route)
    classic128 / oph128              (width where OPH measured 2.6x)

Run alone on a quiet box:  python scripts/profile_minhash_oph.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from term_spark.session import get_spark                       # noqa: E402
from term_spark.sources import read_parquet                    # noqa: E402
from term_spark.operators.dedup import (                       # noqa: E402
    minhash_lsh_candidates, minhash_oph_candidates)

SF1 = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "benchdata", "sf1"))


def measure(spark, fn, docs, samples=3, **kw) -> tuple[float, int]:
    jvm_gc = spark.sparkContext._jvm.System.gc
    n = fn(docs, **kw).count()  # warm: codegen + JIT
    best = float("inf")
    for _ in range(samples):
        jvm_gc()
        t0 = time.perf_counter()
        fn(docs, **kw).count()
        best = min(best, time.perf_counter() - t0)
    return best, n


def main() -> None:
    load1, load5, _ = os.getloadavg()
    print(f"loadavg {load1:.2f}/{load5:.2f} (want < 1.5 for clean numbers)")
    spark = get_spark("profile_minhash_oph")
    spark.sparkContext.setLogLevel("ERROR")
    docs = read_parquet(spark, f"{SF1}/documents.parquet")
    docs = docs.localCheckpoint(eager=True)  # exclude scan from the diff
    print(f"docs: {docs.count()} rows from {SF1}")

    for label, fn, width in (
            ("classic16", minhash_lsh_candidates, 16),
            ("oph16", minhash_oph_candidates, 16),
            ("classic128", minhash_lsh_candidates, 128),
            ("oph128", minhash_oph_candidates, 128)):
        sec, pairs = measure(spark, fn, docs,
                             num_hashes=width, bands=width // 4)
        print(f"{label:11s} {sec:7.2f} s   {pairs} candidate pairs")


if __name__ == "__main__":
    main()
