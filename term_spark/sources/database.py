"""Per-dialect JDBC database sources.

Parity: /root/reference/term-guard/src/sources/database.rs —
DatabaseConfig (:66), DatabaseSource (:133), PostgresSource (:371),
MySqlSource (:485), SqliteSource (:569). The reference wraps
per-dialect connection pools; the Spark-native equivalent is the JDBC
data source, where the scale-critical knobs are the *partitioned read*
options: without ``partitionColumn/lowerBound/upperBound/numPartitions``
a JDBC scan is a single task on one executor regardless of cluster
size. Each dialect class bakes in its driver class, URL shape, and
sane partitioning defaults, and exposes ``reader_options()`` so the
plumbing is unit-testable without a live database.

For non-numeric split keys use ``predicates`` — a list of WHERE
fragments, one Spark partition each (mirrors the reference's pushdown
path, database.rs:108).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000
DEFAULT_NUM_PARTITIONS = 16


class DatabaseSource:
    """Generic JDBC source (database.rs:133).

    Subclasses supply ``url`` and ``driver``; this class owns the
    partitioned-read contract:

    - ``partition_column`` + explicit ``lower_bound``/``upper_bound``
      → Spark splits the scan into ``num_partitions`` range slices.
    - ``partition_column`` without bounds → bounds are discovered at
      load time with one pushed-down ``MIN/MAX`` row (the reference's
      schema-inference round-trip, database.rs:150).
    - ``predicates`` → one partition per WHERE fragment (string/date
      keys, hand-tuned skew splits).
    - none of the above → single-task read; ``load`` warns via the
      returned plan being unpartitioned (callers at scale should pass
      a split key).
    """

    driver: Optional[str] = None

    def __init__(self, url: str, table: str,
                 user: Optional[str] = None, password: Optional[str] = None,
                 partition_column: Optional[str] = None,
                 lower_bound: Optional[int] = None,
                 upper_bound: Optional[int] = None,
                 num_partitions: Optional[int] = None,
                 predicates: Optional[List[str]] = None,
                 fetch_size: int = DEFAULT_FETCH_SIZE,
                 driver: Optional[str] = None,
                 **extra_options: str):
        if predicates and partition_column:
            raise ValueError("pass either partition_column or predicates, not both")
        if (lower_bound is None) != (upper_bound is None):
            raise ValueError("lower_bound and upper_bound must be set together")
        self.url = url
        self.table = table
        self.user = user
        self.password = password
        self.partition_column = partition_column
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound
        self.num_partitions = num_partitions
        self.predicates = predicates
        self.fetch_size = fetch_size
        if driver is not None:
            self.driver = driver
        self.extra_options = extra_options

    # -- option assembly (pure; unit-testable without a database) ----------

    def reader_options(self) -> Dict[str, str]:
        opts: Dict[str, str] = {
            "url": self.url,
            "dbtable": self.table,
            "fetchsize": str(self.fetch_size),
        }
        if self.driver:
            opts["driver"] = self.driver
        if self.user is not None:
            opts["user"] = self.user
        if self.password is not None:
            opts["password"] = self.password
        if self.partition_column is not None:
            opts["partitionColumn"] = self.partition_column
            opts["numPartitions"] = str(self.num_partitions
                                        or DEFAULT_NUM_PARTITIONS)
            if self.lower_bound is not None:
                opts["lowerBound"] = str(self.lower_bound)
                opts["upperBound"] = str(self.upper_bound)
        elif self.num_partitions:
            opts["numPartitions"] = str(self.num_partitions)
        for k, v in self.extra_options.items():
            opts[k] = str(v)
        return opts

    def _bounds_query(self) -> str:
        c = self.partition_column
        return (f"(SELECT MIN({c}) AS lo, MAX({c}) AS hi "
                f"FROM {self.table}) AS spark_bounds")

    def description(self) -> str:
        return f"{type(self).__name__}({self.url}, table={self.table})"

    # -- execution ---------------------------------------------------------

    def load(self, spark: SparkSession) -> DataFrame:
        if self.predicates:
            props = {k: v for k, v in self.reader_options().items()
                     if k not in ("url", "dbtable")}
            return spark.read.jdbc(self.url, self.table,
                                   predicates=list(self.predicates),
                                   properties=props)
        opts = self.reader_options()
        if self.partition_column is not None and self.lower_bound is None:
            bounds_opts = dict(opts, dbtable=self._bounds_query())
            for k in ("partitionColumn", "numPartitions",
                      "lowerBound", "upperBound"):
                bounds_opts.pop(k, None)
            row = spark.read.format("jdbc").options(**bounds_opts).load().head()
            if row is None or row["lo"] is None:
                for k in ("partitionColumn", "numPartitions"):
                    opts.pop(k, None)
            else:
                opts["lowerBound"] = str(row["lo"])
                opts["upperBound"] = str(row["hi"])
        return spark.read.format("jdbc").options(**opts).load()

    def register(self, spark: SparkSession, name: str) -> DataFrame:
        from ..functions.security import validate_identifier
        validate_identifier(name)
        df = self.load(spark)
        df.createOrReplaceTempView(name)
        return df


class PostgresSource(DatabaseSource):
    """PostgreSQL source (database.rs:371; sslmode default 'disable'
    matching :405, override per :412)."""

    driver = "org.postgresql.Driver"

    def __init__(self, host: str, port: int, database: str,
                 username: str, password: str, table: str,
                 sslmode: str = "disable", **kwargs):
        url = f"jdbc:postgresql://{host}:{port}/{database}?sslmode={sslmode}"
        super().__init__(url, table, user=username, password=password, **kwargs)


class MySqlSource(DatabaseSource):
    """MySQL source (database.rs:485)."""

    driver = "com.mysql.cj.jdbc.Driver"

    def __init__(self, host: str, port: int, database: str,
                 username: str, password: str, table: str, **kwargs):
        url = f"jdbc:mysql://{host}:{port}/{database}"
        super().__init__(url, table, user=username, password=password, **kwargs)


class SqliteSource(DatabaseSource):
    """SQLite file source (database.rs:569). A SQLite file takes one
    reader; partitioned range reads still work (each task opens the
    file read-only) but default to a single partition."""

    driver = "org.sqlite.JDBC"

    def __init__(self, path: str, table: str, **kwargs):
        kwargs.setdefault("fetch_size", DEFAULT_FETCH_SIZE)
        super().__init__(f"jdbc:sqlite:{path}", table, **kwargs)
