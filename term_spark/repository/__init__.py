"""Metrics repository: persist metrics per run, query over history.

Parity: /root/reference/term-guard/src/repository/ —
- MetricsRepository trait (mod.rs:59-151): save/load/delete/list by
  ResultKey{timestamp, tags} (result_key.rs);
- InMemoryRepository (in_memory.rs);
- MetricsQuery (query.rs): time-range + tag filtering + sort;
- DataFusionQueryExecutor (datafusion_executor.rs): SQL over the
  metrics history → here ``sql()`` registers the history as a temp
  view and runs spark.sql.

The persistent backend appends parquet (one file per save — at scale
swap for Delta/Iceberg appends; the layout is already
partition-friendly: one row per (run, metric)).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Dict, List, Mapping, Optional

from ..analyzers.base import MetricValue


@dataclass(frozen=True)
class ResultKey:
    timestamp: float
    tags: tuple = ()  # tuple of (k, v) pairs, hashable

    @staticmethod
    def of(timestamp: Optional[float] = None, **tags) -> "ResultKey":
        return ResultKey(timestamp if timestamp is not None else time.time(),
                         tuple(sorted(tags.items())))

    @property
    def tag_dict(self) -> Dict[str, str]:
        return dict(self.tags)


class MetricsRepository(ABC):
    @abstractmethod
    def save(self, key: ResultKey, metrics: Mapping[str, MetricValue]) -> None: ...

    @abstractmethod
    def load(self, key: ResultKey) -> Optional[Dict[str, MetricValue]]: ...

    @abstractmethod
    def delete(self, key: ResultKey) -> None: ...

    @abstractmethod
    def keys(self) -> List[ResultKey]: ...

    # ---- MetricsQuery (query.rs) -------------------------------------
    def query(self, metric: Optional[str] = None,
              after: Optional[float] = None, before: Optional[float] = None,
              tags: Optional[Mapping[str, str]] = None,
              ascending: bool = True) -> List[tuple]:
        """Returns [(ResultKey, metric_name, MetricValue)] filtered and
        time-sorted — the anomaly detectors' input."""
        out = []
        for key in self.keys():
            if after is not None and key.timestamp < after:
                continue
            if before is not None and key.timestamp > before:
                continue
            if tags and any(key.tag_dict.get(k) != v for k, v in tags.items()):
                continue
            metrics = self.load(key) or {}
            for name, value in metrics.items():
                if metric is None or name == metric:
                    out.append((key, name, value))
        out.sort(key=lambda t: t[0].timestamp, reverse=not ascending)
        return out

    def series(self, metric: str, tags: Optional[Mapping[str, str]] = None) -> List[float]:
        """Chronological numeric history of one metric."""
        return [float(v.value) for _, _, v in self.query(metric, tags=tags)
                if isinstance(v.value, (int, float))]


class InMemoryRepository(MetricsRepository):
    def __init__(self):
        self._data: Dict[ResultKey, Dict[str, MetricValue]] = {}

    def save(self, key, metrics):
        self._data[key] = dict(metrics)

    def load(self, key):
        m = self._data.get(key)
        return dict(m) if m is not None else None

    def delete(self, key):
        self._data.pop(key, None)

    def keys(self):
        return sorted(self._data, key=lambda k: k.timestamp)


class ParquetRepository(MetricsRepository):
    """Append-only parquet directory; each save writes one file of
    (timestamp, tags_json, metric, kind, value_json) rows."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _files(self):
        return [os.path.join(self.path, f) for f in sorted(os.listdir(self.path))
                if f.endswith(".parquet")]

    def save(self, key, metrics):
        import pyarrow as pa
        import pyarrow.parquet as pq
        rows = {
            "timestamp": [key.timestamp] * len(metrics),
            "tags": [json.dumps(key.tag_dict, sort_keys=True)] * len(metrics),
            "metric": list(metrics.keys()),
            "kind": [v.kind for v in metrics.values()],
            "value": [json.dumps(v.value) for v in metrics.values()],
        }
        pq.write_table(pa.table(rows),
                       os.path.join(self.path, f"{key.timestamp:.6f}_{uuid.uuid4().hex[:8]}.parquet"))

    def _load_all(self):
        import pyarrow.parquet as pq
        out: Dict[ResultKey, Dict[str, MetricValue]] = {}
        for f in self._files():
            t = pq.read_table(f)
            for i in range(t.num_rows):
                key = ResultKey(t["timestamp"][i].as_py(),
                                tuple(sorted(json.loads(t["tags"][i].as_py()).items())))
                out.setdefault(key, {})[t["metric"][i].as_py()] = MetricValue(
                    t["kind"][i].as_py(), json.loads(t["value"][i].as_py()))
        return out

    def load(self, key):
        return self._load_all().get(key)

    def delete(self, key):
        """Delete = a targeted offline compaction. The live write path
        stays append-only (every ``save`` is one immutable file); all
        row removal funnels through ``compact``'s rewrite."""
        self.compact(drop_key=key)

    def compact(self, before_ts: Optional[float] = None,
                drop_key: Optional[ResultKey] = None) -> int:
        """Offline retention/compaction: rewrite the store as ONE
        parquet file, dropping runs older than ``before_ts`` and/or one
        exact ``drop_key``. Returns the number of rows dropped.

        Honors the append-only contract: readers and ``save`` never
        mutate existing files; this is the explicit offline rewrite the
        docstring always promised. The new file lands via tmp-write +
        atomic rename BEFORE the old files are unlinked, so a crash
        mid-compaction can only leave duplicate rows (self-healed by
        the next compaction), never lost ones. At real scale the
        same operation is a Delta/Iceberg ``OPTIMIZE``/retention job.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq

        files = self._files()
        if not files:
            return 0
        t = pa.concat_tables([pq.read_table(f) for f in files])
        keep = [True] * t.num_rows
        drop_tags = (json.dumps(drop_key.tag_dict, sort_keys=True)
                     if drop_key is not None else None)
        for i in range(t.num_rows):
            ts = t["timestamp"][i].as_py()
            if before_ts is not None and ts < before_ts:
                keep[i] = False
            elif drop_key is not None and ts == drop_key.timestamp \
                    and t["tags"][i].as_py() == drop_tags:
                keep[i] = False
        kept = t.filter(pa.array(keep))
        dropped = t.num_rows - kept.num_rows
        if dropped == 0 and len(files) == 1:
            return 0  # nothing to drop, already compact
        final = os.path.join(
            self.path, f"compacted_{time.time():.6f}_{uuid.uuid4().hex[:8]}.parquet")
        tmp = final + ".tmp"
        if kept.num_rows:
            pq.write_table(kept, tmp)
            os.replace(tmp, final)  # atomic: visible only when complete
        for f in files:
            os.remove(f)
        return dropped

    def keys(self):
        return sorted(self._load_all(), key=lambda k: k.timestamp)

    def as_spark_df(self, spark):
        """Register the whole history for SQL (DataFusionQueryExecutor
        parity): spark.sql over the returned temp view."""
        df = spark.read.parquet(self.path)
        df.createOrReplaceTempView("metrics_history")
        return df
