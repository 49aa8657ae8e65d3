"""Three-pass column profiler.

Parity: /root/reference/term-guard/src/analyzers/profiler.rs:1-75 —
Pass 1: sample-based type detection + nulls + cardinality (sample
10 000, cardinality_threshold 100); Pass 2: exact histograms for
low-cardinality columns; Pass 3: quantiles/moments for numeric columns.

Spark shape: Pass 1 is ONE fused agg over all columns (count, non-null,
approx distinct per column — cheap partial aggregates); Pass 2 is one
groupBy per low-cardinality column (bounded by the threshold); Pass 3
is one fused agg of min/max/mean/stddev/percentile_approx over all
numeric columns. Driver receives O(columns × threshold) rows, never the
data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import pyspark.sql.functions as F

from .inference import infer_column_type

NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double"}
TEMPORAL_TYPES = {"timestamp", "timestamp_ntz", "date"}


@dataclass
class ColumnProfile:
    column: str
    spark_type: str
    count: int
    non_null: int
    approx_distinct: int
    completeness: float
    inferred_type: Optional[str] = None
    inferred_confidence: float = 0.0
    is_low_cardinality: bool = False
    histogram: Optional[Dict[str, int]] = None
    min: Optional[float] = None
    max: Optional[float] = None
    mean: Optional[float] = None
    stddev: Optional[float] = None
    quantiles: Optional[Dict[str, float]] = None  # p25/p50/p75
    # string columns only, from the pass-1b sample: prose-detection
    # signals for the text-gate suggestion rules (round 8)
    avg_length: Optional[float] = None
    avg_tokens: Optional[float] = None


@dataclass
class TableProfile:
    num_rows: int
    columns: Dict[str, ColumnProfile] = field(default_factory=dict)


class ColumnProfiler:
    def __init__(self, cardinality_threshold: int = 100, sample_size: int = 10000,
                 quantile_accuracy: int = 1000):
        self.cardinality_threshold = cardinality_threshold
        self.sample_size = sample_size
        self.quantile_accuracy = quantile_accuracy

    def profile(self, df) -> TableProfile:
        dtypes = dict(df.dtypes)
        cols = list(df.columns)

        # ---- pass 1: fused counts + approx cardinality ---------------
        exprs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            exprs.append(F.count(F.col(c)).alias(f"nn_{c}"))
            exprs.append(F.approx_count_distinct(F.col(c)).alias(f"ad_{c}"))
        row = df.agg(*exprs).collect()[0]
        n = int(row["__n"])
        profile = TableProfile(num_rows=n)
        for c in cols:
            nn = int(row[f"nn_{c}"])
            ad = int(row[f"ad_{c}"])
            profile.columns[c] = ColumnProfile(
                column=c, spark_type=dtypes[c], count=n, non_null=nn,
                approx_distinct=ad,
                completeness=nn / n if n else float("nan"),
                is_low_cardinality=0 < ad <= self.cardinality_threshold)
        if n == 0:
            return profile

        # ---- pass 1b: sample-based logical type inference ------------
        string_cols = [c for c in cols if dtypes[c] == "string"]
        if string_cols:
            sample = df.select(string_cols).limit(self.sample_size).collect()
            for c in string_cols:
                values = [r[c] for r in sample if r[c] is not None]
                t, conf = infer_column_type(values)
                profile.columns[c].inferred_type = t
                profile.columns[c].inferred_confidence = conf
                if values:
                    profile.columns[c].avg_length = round(
                        sum(len(v) for v in values) / len(values), 2)
                    profile.columns[c].avg_tokens = round(
                        sum(len(v.split()) for v in values) / len(values), 2)

        # ---- pass 2: exact histograms for low-cardinality columns ----
        for c in cols:
            p = profile.columns[c]
            if p.is_low_cardinality:
                rows = (df.groupBy(F.col(c).cast("string").alias("v"))
                          .agg(F.count(F.lit(1)).alias("cnt"))
                          .orderBy(F.desc("cnt"), F.asc("v"))
                          .limit(self.cardinality_threshold).collect())
                p.histogram = {str(r["v"]): int(r["cnt"]) for r in rows}

        # ---- pass 3: ONE fused agg — numeric moments + quantiles, plus
        # temporal min/max as ISO strings (no epoch cast, so
        # TIMESTAMP_NTZ from naive parquet profiles identically to
        # TIMESTAMP/DATE; ISO strings also order lexicographically, so
        # downstream range rules keep working).
        numeric = [c for c in cols if dtypes[c] in NUMERIC_TYPES]
        temporal = [c for c in cols if dtypes[c] in TEMPORAL_TYPES]
        if numeric or temporal:
            exprs = []
            for c in numeric:
                col = F.col(c).cast("double")
                exprs += [F.min(col).alias(f"mn_{c}"), F.max(col).alias(f"mx_{c}"),
                          F.avg(col).alias(f"av_{c}"), F.stddev_samp(col).alias(f"sd_{c}"),
                          F.percentile_approx(col, [0.25, 0.5, 0.75],
                                              self.quantile_accuracy).alias(f"qs_{c}")]
            for c in temporal:
                exprs += [F.min(F.col(c)).cast("string").alias(f"tmn_{c}"),
                          F.max(F.col(c)).cast("string").alias(f"tmx_{c}")]
            row = df.agg(*exprs).collect()[0]
            for c in numeric:
                p = profile.columns[c]
                p.min = _f(row[f"mn_{c}"])
                p.max = _f(row[f"mx_{c}"])
                p.mean = _f(row[f"av_{c}"])
                p.stddev = _f(row[f"sd_{c}"])
                qs = row[f"qs_{c}"]
                if qs is not None:
                    p.quantiles = {"p25": _f(qs[0]), "p50": _f(qs[1]), "p75": _f(qs[2])}
            for c in temporal:
                p = profile.columns[c]
                p.min = row[f"tmn_{c}"]
                p.max = row[f"tmx_{c}"]
        return profile


def _f(v):
    return float(v) if v is not None else None
