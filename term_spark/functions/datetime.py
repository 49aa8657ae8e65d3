"""Timestamp helpers shared by temporal operators and queries."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col) -> Column:
    """Seconds since the Unix epoch as DOUBLE, for any timestamp flavor.

    Spark 4 forbids a direct TIMESTAMP_NTZ -> DOUBLE cast, and naive
    parquet timestamps (pyarrow ``timestamp[us]`` with no timezone
    metadata) load as TIMESTAMP_NTZ when NTZ inference is on. Routing
    through TIMESTAMP_LTZ is legal from every flavor: a no-op for
    TIMESTAMP, and for NTZ an interpretation in the session timezone
    (UTC in this deployment, which matches DuckDB's naive
    ``EXTRACT(EPOCH FROM ts)`` on the same parquet).
    """
    c = col if isinstance(col, Column) else F.col(col)
    return c.cast("timestamp_ltz").cast("double")
