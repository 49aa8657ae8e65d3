"""A/B the two cross_table_sum plan shapes at a given scale, one
variant per fresh JVM (run alternately on a quiet box):

    python scripts/ab_cross_table_sum.py join  [sf_dir]
    python scripts/ab_cross_table_sum.py union [sf_dir]

join  = per-side groupBy + full-outer merge join (the pre-round-10 plan)
union = side-tagged union + single groupBy (one shuffle, no sort/join)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from term_spark.session import get_spark  # noqa: E402
from term_spark.sources import read_parquet  # noqa: E402

DEC = "decimal(25,6)"


def plan_join(o, li):
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount")) *
              (1 + F.col("l_tax"))).cast(DEC)
    left = o.groupBy(F.col("o_orderkey").alias("grp")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("left_sum"))
    right = li.groupBy(F.col("l_orderkey").alias("grp")).agg(
        F.sum(charge).alias("right_sum"))
    joined = (left.join(right, "grp", "full_outer")
              .select(F.coalesce("left_sum", F.lit(0).cast(DEC)).alias("l"),
                      F.coalesce("right_sum", F.lit(0).cast(DEC)).alias("r")))
    return joined


def plan_union(o, li):
    charge = (F.col("l_extendedprice") * (1 - F.col("l_discount")) *
              (1 + F.col("l_tax"))).cast(DEC)
    tagged = (o.select(F.col("o_orderkey").alias("grp"),
                       F.col("o_totalprice").cast(DEC).alias("lv"),
                       F.lit(None).cast(DEC).alias("rv"))
              .unionByName(li.select(F.col("l_orderkey").alias("grp"),
                                     F.lit(None).cast(DEC).alias("lv"),
                                     charge.alias("rv"))))
    return tagged.groupBy("grp").agg(
        F.coalesce(F.sum("lv"), F.lit(0).cast(DEC)).alias("l"),
        F.coalesce(F.sum("rv"), F.lit(0).cast(DEC)).alias("r"))


def main():
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchdata", "sf10")
    spark = get_spark("ab_cross_table")
    for i in range(2):
        # rebuild the plan each sample: fresh RDD lineage defeats
        # shuffle reuse, so every sample pays the real shuffle cost
        o = read_parquet(spark, f"{sf_dir}/orders.parquet")
        li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
        joined = {"join": plan_join, "union": plan_union}[variant](o, li)
        diff = F.abs(F.col("l") - F.col("r"))
        q = joined.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.count(F.when(diff > 1.0, 1)).alias("violations"),
            F.max(diff).cast("double").alias("max_diff"))
        t = time.time()
        rows = q.collect()
        print(f"{variant} run{i}: {time.time() - t:.2f}s {rows[0]}",
              flush=True)


if __name__ == "__main__":
    main()
