"""Cross-table schema analysis: FK-candidate discovery.

Parity: /root/reference/term-guard/src/analyzers/schema_analyzer.rs
:51,139,661 — walk the registered tables, propose FK candidates from
name/type heuristics, verify by value overlap, emit suggested
referential checks.

Scale: overlap verification is a semi-join count over distinct child
keys — one shuffle per candidate, bounded by the distinct-key count,
not the table size. Name/type screening happens first so only
plausible pairs pay the join.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

import pyspark.sql.functions as F


@dataclass
class ForeignKeyCandidate:
    child_table: str
    child_column: str
    parent_table: str
    parent_column: str
    name_score: float
    overlap: float           # fraction of child keys present in parent
    parent_unique_ratio: float

    @property
    def confidence(self) -> float:
        return round(0.3 * self.name_score + 0.5 * self.overlap +
                     0.2 * self.parent_unique_ratio, 4)


def _name_score(child_col: str, parent_table: str, parent_col: str) -> float:
    c, p, t = child_col.lower(), parent_col.lower(), parent_table.lower()
    if c == p:
        return 1.0
    stripped = c.split("_", 1)[-1]  # o_custkey → custkey
    p_stripped = p.split("_", 1)[-1]
    if stripped == p_stripped:
        return 0.9
    if t.rstrip("s") in c and ("key" in c or "id" in c):
        return 0.7
    if stripped.endswith(("key", "id")) and p_stripped.endswith(("key", "id")):
        return 0.3
    return 0.0


_KEYABLE = {"tinyint", "smallint", "int", "bigint", "string"}


class SchemaAnalyzer:
    def __init__(self, min_name_score: float = 0.3, min_overlap: float = 0.95,
                 min_parent_unique: float = 0.95):
        self.min_name_score = min_name_score
        self.min_overlap = min_overlap
        self.min_parent_unique = min_parent_unique

    def find_fk_candidates(self, tables: Dict[str, "DataFrame"],
                           ) -> List[ForeignKeyCandidate]:
        out: List[ForeignKeyCandidate] = []
        stats_cache: Dict[tuple, tuple] = {}

        def key_stats(table, col):
            if (table, col) not in stats_cache:
                df = tables[table]
                row = df.agg(
                    F.count(F.col(col)).alias("n"),
                    F.approx_count_distinct(F.col(col)).alias("d")).collect()[0]
                stats_cache[(table, col)] = (int(row["n"]), int(row["d"]))
            return stats_cache[(table, col)]

        schemas = {name: dict(df.dtypes) for name, df in tables.items()}
        for child, child_schema in schemas.items():
            for parent, parent_schema in schemas.items():
                if child == parent:
                    continue
                for p_col, p_type in parent_schema.items():
                    if p_type not in _KEYABLE:
                        continue
                    p_n, p_d = key_stats(parent, p_col)
                    if p_n == 0 or p_d / p_n < self.min_parent_unique:
                        continue  # parent side must be ~unique
                    for c_col, c_type in child_schema.items():
                        if c_type != p_type:
                            continue
                        score = _name_score(c_col, parent, p_col)
                        if score < self.min_name_score:
                            continue
                        child_keys = (tables[child]
                                      .select(F.col(c_col).alias("k"))
                                      .filter(F.col("k").isNotNull()).distinct())
                        total = child_keys.count()
                        if total == 0:
                            continue
                        matched = child_keys.join(
                            tables[parent].select(F.col(p_col).alias("k")).distinct(),
                            "k", "left_semi").count()
                        overlap = matched / total
                        if overlap >= self.min_overlap:
                            out.append(ForeignKeyCandidate(
                                child, c_col, parent, p_col, score, overlap,
                                min(p_d / p_n, 1.0)))
        out.sort(key=lambda c: -c.confidence)
        return out

    def suggest_checks(self, tables) -> "Check":
        """FK candidates → a referential-integrity Check
        (schema_analyzer.rs:661 suggestions→Check path)."""
        from ..core.check import Check
        check = Check("schema_referential_integrity")
        for cand in self.find_fk_candidates(tables):
            check.foreign_key(cand.child_table, cand.child_column,
                              cand.parent_table, cand.parent_column)
        return check
