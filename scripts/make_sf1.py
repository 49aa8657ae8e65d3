"""Generate an sf1-scale bench dataset by replicating sf0.1 tenfold
with consistent key offsets (FKs stay valid, join selectivities stay
realistic). Output: /root/repo/benchdata/sf1/*.parquet (gitignored —
~0.5 GB of derived data; regenerate with `python scripts/make_sf1.py`).

Why: BASELINE.md argues the Spark-vs-native comparison inverts once
data outgrows Spark's fixed per-job floor; bench.py picks this dir up
automatically and reports an `sf1` section so the crossover slope is
measured, not asserted.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchdata", "sf1")
COPIES = 10

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


def main() -> None:
    from term_spark.session import get_spark
    from term_spark.sources import read_parquet

    spark = get_spark("make_sf1")
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

    os.makedirs(DST, exist_ok=True)
    for name, keys in KEY_OFFSETS.items():
        df = tables[name]
        copies = []
        for i in range(COPIES):
            c = df
            for col, space in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * strides[space]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite").parquet(f"{DST}/{name}.parquet"))
        print(f"{name}: {COPIES}x -> {DST}/{name}.parquet", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
