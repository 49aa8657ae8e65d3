"""Generate replicated bench datasets by unioning sf0.1 N times with
consistent key offsets (FKs stay valid, join selectivities stay
realistic). Outputs are gitignored derived data:

    python scripts/make_sf1.py            # 10x  -> benchdata/sf1  (~6M-row lineitem)
    python scripts/make_sf1.py --scale 10 # 100x -> benchdata/sf10 (~60M-row lineitem)

Why: BASELINE.md argues the Spark-vs-native comparison inverts once
data outgrows Spark's fixed per-job floor; bench.py picks these dirs up
automatically and reports `sf1` / `sf10` sections so the crossover
slope is measured across three decades of data, not asserted.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
BENCHDATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchdata")

# key columns to offset per copy so replicated rows don't collide and
# FK relationships (orders.o_custkey -> customer.c_custkey,
# lineitem.l_orderkey -> orders.o_orderkey) keep resolving 1:1.
KEY_OFFSETS = {
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey"},
    "customer": {"c_custkey": "custkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "vecid"},
}


def build(scale: int) -> None:
    """Replicate sf0.1 ``scale * 10`` times into benchdata/sf{scale}."""
    from term_spark.session import get_spark
    from term_spark.sources import read_parquet

    copies = scale * 10
    dst = os.path.join(BENCHDATA, f"sf{scale}")
    spark = get_spark(f"make_sf{scale}")
    spark.sparkContext.setLogLevel("ERROR")

    # one shared stride per key-space, from the true max over the
    # tables that use it
    strides = {}
    tables = {}
    for name in KEY_OFFSETS:
        tables[name] = read_parquet(spark, f"{SRC}/{name}.parquet")
    for name, keys in KEY_OFFSETS.items():
        for col, space in keys.items():
            mx = tables[name].agg(F.max(col)).collect()[0][0] or 0
            strides[space] = max(strides.get(space, 0), int(mx) + 1)

    os.makedirs(dst, exist_ok=True)
    for name, keys in KEY_OFFSETS.items():
        df = tables[name]
        parts = []
        for i in range(copies):
            c = df
            for col, space in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[space]))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite").parquet(f"{dst}/{name}.parquet"))
        print(f"{name}: {copies}x -> {dst}/{name}.parquet", flush=True)
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=1,
                   help="target scale factor (1 -> sf1, 10 -> sf10)")
    args = p.parse_args()
    build(args.scale)


if __name__ == "__main__":
    main()
