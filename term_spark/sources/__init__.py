"""Data sources: file readers, cloud URLs, JDBC, joined views, registry.

Parity: /root/reference/term-guard/src/sources/ — CsvSource (csv.rs:76),
JsonSource (json.rs:92), ParquetSource (parquet.rs:65), cloud sources
(cloud.rs:61,266,450 → s3a://, gs://, abfss:// URLs with Hadoop
connector conf), DatabaseSource (database.rs:133 → JDBC), JoinedSource
(joined.rs:37-167 → DataFrame join registered as a temp view).

Spark reads gz/zstd/bz2/lz4/snappy compression natively, matching the
reference's auto-detect (sources/mod.rs:116-150); glob patterns are
native to Hadoop path resolution (sources/mod.rs:167-197).

Nanosecond-timestamp note: the driver's testdata parquet carries
TIMESTAMP(NANOS) columns, which Spark refuses by default. read_parquet
reads them via ``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds
proper timestamps (microsecond precision).
"""

from __future__ import annotations

import glob as _glob
from typing import Dict, List, Optional, Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


#: below this row count a 1-task scan finishes in well under the cost
#: of the extra exchange auto-spread would add
SPREAD_MIN_ROWS = 100_000

#: past this many files the dataset has at least that many row groups —
#: effective parallelism is fine and footer inspection would only add
#: driver-side latency
_FOOTER_SCAN_CAP = 64


def _parquet_footer_info(path: str):
    """(nanos_cols, total_row_groups, total_rows) from parquet footers.

    Row-group count is the scan's EFFECTIVE parallelism ceiling: Spark
    plans byte-range splits, but a split only yields rows for row
    groups whose midpoint it contains, so a 600k-row single-row-group
    file is read by exactly one task no matter how it's split.

    Local paths only (pyarrow); remote schemes and >_FOOTER_SCAN_CAP
    file sets return (nanos_from_first_file_or_[], None, None) meaning
    "unknown / plenty".
    """
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pt
    except ImportError:  # pragma: no cover
        return [], None, None
    import os
    if any(ch in path for ch in "*?["):
        files = sorted(_glob.glob(path))
    elif os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    elif os.path.isfile(path):
        files = [path]
    else:  # remote scheme (s3a://, gs://, abfss://) or missing
        files = []

    def _nanos(schema) -> List[str]:
        return [name for name, typ in zip(schema.names, schema.types)
                if pt.is_timestamp(typ) and typ.unit == "ns"]

    if not files:
        return [], None, None
    if len(files) > _FOOTER_SCAN_CAP:
        try:
            return _nanos(pq.read_schema(files[0])), None, None
        except Exception:
            return [], None, None
    row_groups = rows = 0
    nanos: List[str] = []
    for i, p in enumerate(files):
        try:
            meta = pq.ParquetFile(p).metadata
        except Exception:
            return nanos, None, None
        if i == 0:
            nanos = _nanos(meta.schema.to_arrow_schema())
        row_groups += meta.num_row_groups
        rows += meta.num_rows
    return nanos, row_groups, rows


def read_parquet(spark: SparkSession, path: str, spread: bool = False,
                 **options) -> DataFrame:
    """Read parquet with nanos-timestamp handling and scan-width repair.

    ``spread=None`` (auto): when the footers show fewer row groups than
    half the core count but enough rows that a serialized scan hurts
    (>= SPREAD_MIN_ROWS), insert one round-robin repartition so
    per-partition work uses every core. Catalyst still pushes filters
    and column pruning below the repartition, so the exchange carries
    only pruned columns. At scale auto never triggers: a 100 TB table
    has ~1e5 row groups.

    Default OFF: the exchange only pays for itself when downstream
    per-row CPU dominates (wide decimal aggregates, per-row hashing) —
    measured 2.6s -> 1.4s on a single-row-group 600k-row file for the
    decimal-heavy pricing query, but 0.5s -> 1.5s on a light windowed
    query whose own hash exchange follows anyway. CPU-heavy operators
    opt in with spread=None/True.
    """
    nanos, row_groups, rows = _parquet_footer_info(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.options(**options).parquet(path)
    cores = spark.sparkContext.defaultParallelism
    if spread is None:
        spread = (row_groups is not None and row_groups < max(2, cores // 2)
                  and rows is not None and rows >= SPREAD_MIN_ROWS)
    if spread:
        df = df.repartition(cores)
    # The rebuild applies only when Spark actually surfaced the column as a
    # nanos-epoch long. Spark-written INT96 timestamps also read as
    # timestamp[ns] in pyarrow but land as TimestampType here — skip those.
    long_cols = {f.name for f in df.schema.fields
                 if isinstance(f.dataType, T.LongType)}
    for c in nanos:
        if c in long_cols:
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def read_csv(spark: SparkSession, path, header: bool = True,
             infer_schema: bool = True, delimiter: str = ",", **options) -> DataFrame:
    paths = path if isinstance(path, (list, tuple)) else [path]
    return (spark.read
            .option("header", header)
            .option("inferSchema", infer_schema)
            .option("delimiter", delimiter)
            .options(**options)
            .csv(list(paths)))


def read_json(spark: SparkSession, path, multiline: Optional[bool] = None,
              **options) -> DataFrame:
    """NDJSON by default; ``multiline=True`` for JSON-array files
    (format-by-extension in the reference, json.rs:26)."""
    reader = spark.read.options(**options)
    if multiline is None:
        first = path[0] if isinstance(path, (list, tuple)) else path
        multiline = not str(first).endswith((".ndjson", ".jsonl"))
    reader = reader.option("multiLine", bool(multiline))
    paths = path if isinstance(path, (list, tuple)) else [path]
    return reader.json(list(paths))


def read_jdbc(spark: SparkSession, url: str, table: str,
              properties: Optional[Dict[str, str]] = None,
              partition_column: Optional[str] = None,
              lower_bound: Optional[int] = None,
              upper_bound: Optional[int] = None,
              num_partitions: Optional[int] = None,
              **options) -> DataFrame:
    """Generic JDBC read (database.rs:133). Pass ``partition_column``
    (+ optional bounds) to get a partitioned scan — an unpartitioned
    JDBC read is a single task regardless of cluster size. Bounds are
    auto-discovered with a pushed-down MIN/MAX when omitted. For
    dialect defaults use sources.database.{Postgres,MySql,Sqlite}Source."""
    from .database import DatabaseSource
    merged = {**(properties or {}), **options}
    user = merged.pop("user", None)
    password = merged.pop("password", None)
    driver = merged.pop("driver", None)
    src = DatabaseSource(url, table, user=user, password=password,
                         partition_column=partition_column,
                         lower_bound=lower_bound, upper_bound=upper_bound,
                         num_partitions=num_partitions, driver=driver,
                         **merged)
    return src.load(spark)


class JoinedSource:
    """Reusable joined view over two (or more) tables.

    Parity: sources/joined.rs:37-167 — CREATE VIEW l <JOIN> r ON … with
    Inner/Left/Right/Full, additional join stages, optional WHERE.
    """

    _HOW = {"inner": "inner", "left": "left", "right": "right", "full": "full_outer"}

    def __init__(self, left: DataFrame, right: DataFrame, on, how: str = "inner"):
        self._df = left.join(right, on, self._HOW[how.lower()])

    def join(self, other: DataFrame, on, how: str = "inner") -> "JoinedSource":
        self._df = self._df.join(other, on, self._HOW[how.lower()])
        return self

    def where(self, condition: str) -> "JoinedSource":
        from ..functions.security import validate_sql_expression
        self._df = self._df.filter(validate_sql_expression(condition))
        return self

    def df(self) -> DataFrame:
        return self._df

    def register(self, name: str) -> DataFrame:
        from ..functions.security import validate_identifier
        validate_identifier(name)
        self._df.createOrReplaceTempView(name)
        return self._df


def load_tpch_tables(spark: SparkSession, sf_dir: str,
                     names: Sequence[str] = ("region", "nation", "customer",
                                             "supplier", "part", "orders",
                                             "lineitem", "events", "documents",
                                             "embeddings")) -> Dict[str, DataFrame]:
    return {n: read_parquet(spark, f"{sf_dir}/{n}.parquet") for n in names}


# ---------------------------------------------------------------------------
# cloud sources (parity: sources/cloud.rs:61,266,450)
# ---------------------------------------------------------------------------

def configure_s3(spark: SparkSession, access_key: Optional[str] = None,
                 secret_key: Optional[str] = None,
                 session_token: Optional[str] = None,
                 endpoint: Optional[str] = None,
                 region: Optional[str] = None,
                 profile: Optional[str] = None,
                 assume_role_arn: Optional[str] = None,
                 anonymous: bool = False) -> SparkSession:
    """Hadoop-S3A auth conf — one function per S3Auth mode of the
    reference (cloud.rs:30-110):

    - no args → default provider chain (env vars / instance IAM role;
      ``S3Auth::InstanceCredentials``),
    - ``access_key``+``secret_key`` (+``session_token`` for STS) →
      static / temporary credentials (``S3Auth::AccessKey``),
    - ``profile`` → named profile from ~/.aws/credentials
      (``S3Auth::Profile``; the JVM reads AWS_PROFILE),
    - ``assume_role_arn`` → STS assumed role on top of the base chain,
    - ``anonymous`` → public buckets.

    Read with ``read_parquet(spark, "s3a://bucket/path")`` afterwards.
    """
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if sum((bool(access_key), bool(profile), anonymous)) > 1:
        raise ValueError("pick ONE of access_key / profile / anonymous")
    if access_key and secret_key:
        conf.set("fs.s3a.access.key", access_key)
        conf.set("fs.s3a.secret.key", secret_key)
        if session_token:
            conf.set("fs.s3a.session.token", session_token)
            conf.set("fs.s3a.aws.credentials.provider",
                     "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    elif profile:
        conf.set("fs.s3a.aws.credentials.provider",
                 "com.amazonaws.auth.profile.ProfileCredentialsProvider")
        spark.conf.set("spark.executorEnv.AWS_PROFILE", profile)
    elif anonymous:
        conf.set("fs.s3a.aws.credentials.provider",
                 "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")
    if assume_role_arn:
        conf.set("fs.s3a.assumed.role.arn", assume_role_arn)
        conf.set("fs.s3a.aws.credentials.provider",
                 "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider")
    if endpoint:
        conf.set("fs.s3a.endpoint", endpoint)
    if region:
        conf.set("fs.s3a.endpoint.region", region)
    return spark


def configure_gcs(spark: SparkSession,
                  service_account_json: Optional[str] = None,
                  service_account_keyfile: Optional[str] = None) -> SparkSession:
    """GCS connector conf — GcsAuth parity (cloud.rs:243-295):
    default = application-default credentials (``ApplicationDefault``);
    ``service_account_keyfile`` = path to a key file
    (``ServiceAccountKey``); ``service_account_json`` = inline JSON
    (``ServiceAccountJson``)."""
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    conf.set("fs.gs.impl", "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")
    keyfile = service_account_keyfile or service_account_json
    if service_account_json and service_account_json.lstrip().startswith("{"):
        # inline JSON: the Hadoop GCS connector only takes a file path,
        # so persist to a private temp file (the reference passes JSON
        # straight to object_store; this is the Hadoop-side equivalent)
        import os
        import tempfile
        fd, path = tempfile.mkstemp(suffix=".json", prefix="gcs_sa_")
        with os.fdopen(fd, "w") as f:
            f.write(service_account_json)
        os.chmod(path, 0o600)
        keyfile = path
    if keyfile:
        conf.set("google.cloud.auth.service.account.enable", "true")
        conf.set("google.cloud.auth.service.account.json.keyfile", keyfile)
    return spark


from .database import (  # noqa: E402  (re-export; keeps JDBC deps lazy)
    DatabaseSource, MySqlSource, PostgresSource, SqliteSource,
)


def configure_azure(spark: SparkSession, account: str,
                    access_key: Optional[str] = None,
                    sas_token: Optional[str] = None,
                    client_id: Optional[str] = None,
                    client_secret: Optional[str] = None,
                    tenant_id: Optional[str] = None) -> SparkSession:
    """ABFS conf for ``abfss://container@account.dfs.core.windows.net/…``
    — AzureAuth parity (cloud.rs:419-500): ``access_key`` =
    ``AccessKey``; ``sas_token`` = ``SasToken``; ``client_id`` +
    ``client_secret`` + ``tenant_id`` = ``ClientSecret`` (OAuth); none =
    ambient credentials (the reference's ``AzureCli`` mode — managed
    identity / az login on the nodes)."""
    host = f"{account}.dfs.core.windows.net"
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    if sum((bool(access_key), bool(sas_token), bool(client_id))) > 1:
        raise ValueError("pick ONE of access_key / sas_token / client auth")
    if access_key:
        conf.set(f"fs.azure.account.auth.type.{host}", "SharedKey")
        conf.set(f"fs.azure.account.key.{host}", access_key)
    elif sas_token:
        conf.set(f"fs.azure.account.auth.type.{host}", "SAS")
        conf.set(f"fs.azure.sas.fixed.token.{host}", sas_token.lstrip("?"))
        conf.set(f"fs.azure.sas.token.provider.type.{host}",
                 "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider")
    elif client_id:
        if not (client_secret and tenant_id):
            raise ValueError("client auth needs client_id + client_secret"
                             " + tenant_id")
        conf.set(f"fs.azure.account.auth.type.{host}", "OAuth")
        conf.set(f"fs.azure.account.oauth.provider.type.{host}",
                 "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider")
        conf.set(f"fs.azure.account.oauth2.client.id.{host}", client_id)
        conf.set(f"fs.azure.account.oauth2.client.secret.{host}", client_secret)
        conf.set(f"fs.azure.account.oauth2.client.endpoint.{host}",
                 f"https://login.microsoftonline.com/{tenant_id}/oauth2/token")
    return spark


def hadoop_swap_dir(spark: SparkSession, live: str, tmp: str) -> None:
    """Replace directory ``live`` with freshly-written ``tmp`` through
    the Hadoop FileSystem API — the write-then-swap step every index
    compaction ends with.

    FileSystem.rename reports failure by RETURNING FALSE, not by
    throwing, and renaming onto an existing directory moves the source
    INSIDE it instead of replacing it — so an unchecked swap can
    destroy the only copy of an index (rename(live→bak) succeeds,
    rename(tmp→live) silently fails, delete(bak) removes the last
    copy), and a stale ``__old`` left by a crashed prior compaction
    turns the backup rename into a nesting. This helper checks every
    return, clears stale backups first (live is canonical after a
    crash — the old swap never completed), restores the original on a
    failed second rename, and deletes the backup only after the new
    live path verifiably exists.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(live).getFileSystem(conf)
    live_p, tmp_p = path_cls(live), path_cls(tmp)
    bak = path_cls(live + "__old")
    if fs.exists(bak) and not fs.delete(bak, True):
        raise IOError(f"could not clear stale backup {live}__old")
    if not fs.rename(live_p, bak):
        raise IOError(f"rename {live} -> {live}__old returned false")
    if not fs.rename(tmp_p, live_p):
        fs.rename(bak, live_p)  # put the original back — never leave no live
        raise IOError(f"rename {tmp} -> {live} returned false; "
                      "original table restored")
    if not fs.exists(live_p):
        raise IOError(f"{live} missing after swap; backup kept at "
                      f"{live}__old")
    fs.delete(bak, True)
