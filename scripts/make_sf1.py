"""Generate replicated bench datasets by unioning sf0.1 N times with
consistent key offsets (FKs stay valid, join selectivities stay
realistic). Outputs are gitignored derived data:

    python scripts/make_sf1.py            # 10x  -> benchdata/sf1  (~6M-row lineitem)
    python scripts/make_sf1.py --scale 10 # 100x -> benchdata/sf10 (~60M-row lineitem)
    python scripts/make_sf1.py --scale 10 --perturb   # near-dup-honest documents

Why: BASELINE.md argues the Spark-vs-native comparison inverts once
data outgrows Spark's fixed per-job floor; bench.py picks these dirs up
automatically and reports `sf1` / `sf10` sections so the crossover
slope is measured across three decades of data, not asserted.

``--perturb`` (round 12): byte-identical replication makes every
document ~copies exact clones of itself, so true near-dup PAIR counts
grow quadratically in the replication factor and a near-dup bench
point measures the synthetic artifact, not the design.  The fix is a
deterministic PER-COPY VOCABULARY REWRITE on documents.text: ~10% of
tokens (chosen by xxhash64(token, copy)) get a copy-tagged suffix.
Within one copy the rewrite is a pure function of the token, so two
naturally-similar documents keep their mutual shingle overlap (the
corpus's organic near-dup pairs survive, replicated linearly); across
copies the rewrites differ, so a 5-token shingle survives both copies
with p ≈ (0.9²)⁵ ≈ 0.35 — Jaccard ≈ 0.2, far below candidate
thresholds, and clone pairs stop being candidates at all.  Pair
counts then scale linearly with data, which is what a bench point
should measure.  No RNG: everything derives from (token, copy).
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

# dimension tables copied VERBATIM (round 13): l_suppkey / l_partkey
# are deliberately NOT offset per copy, so the replicated fact rows
# keep resolving against the original sf0.1 dimension key space —
# each supplier/part simply serves ``copies``× the lines, which is
# exactly the fan-out a bigger SF produces.  Without these the sf10
# TPC-H points that join supplier/nation/region/part cannot run.
DIM_COPY = ["supplier", "nation", "region", "part"]


def _perturb_text(col, copy_idx: int, rate_denom: int = 10):
    """Copy-``copy_idx``'s vocabulary rewrite: every token whose
    xxhash64 with the copy index lands in 1/``rate_denom`` of the space
    gets a copy-tagged suffix.  Pure JVM (split/transform/array_join),
    deterministic, content-keyed — see the module docstring."""
    return F.array_join(
        F.transform(
            F.split(col, " "),
            lambda w: F.when(
                F.pmod(F.xxhash64(w, F.lit(copy_idx)), rate_denom) == 0,
                F.concat(w, F.lit(f"~{copy_idx}"))).otherwise(w)),
        " ")


def build(scale: int, perturb: bool = False) -> None:
    """Replicate sf0.1 ``scale * 10`` times into benchdata/sf{scale}."""
    import json

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
            if perturb and name == "documents" and i > 0:
                c = c.withColumn("text", _perturb_text(F.col("text"), i))
            parts.append(c)
        out = parts[0]
        for c in parts[1:]:
            out = out.unionByName(c)
        (out.repartition(32)
            .write.mode("overwrite").parquet(f"{dst}/{name}.parquet"))
        print(f"{name}: {copies}x -> {dst}/{name}.parquet", flush=True)
    for name in DIM_COPY:
        (read_parquet(spark, f"{SRC}/{name}.parquet")
         .write.mode("overwrite").parquet(f"{dst}/{name}.parquet"))
        print(f"{name}: copied verbatim -> {dst}/{name}.parquet", flush=True)
    with open(os.path.join(dst, "_meta.json"), "w") as fh:
        json.dump({"copies": copies, "perturb_documents": bool(perturb)}, fh)
    spark.stop()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=1,
                   help="target scale factor (1 -> sf1, 10 -> sf10)")
    p.add_argument("--perturb", action="store_true",
                   help="per-copy vocabulary rewrite on documents.text "
                        "so near-dup pair counts grow linearly, not "
                        "quadratically (see module docstring)")
    args = p.parse_args()
    build(args.scale, perturb=args.perturb)


if __name__ == "__main__":
    main()
