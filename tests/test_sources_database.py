"""Per-dialect JDBC source option assembly (no live database needed).

Parity: term-guard/src/sources/database.rs tests (:620-680) construct
configs and assert on description/type without connecting; same idea
here — the unit under test is the reader-option contract, especially
the partitioned-read defaults that keep a JDBC scan from collapsing
to a single task at scale.
"""

import pytest

from term_spark.sources import (DatabaseSource, MySqlSource, PostgresSource,
                                SqliteSource, read_jdbc)
from term_spark.sources.database import DEFAULT_NUM_PARTITIONS


def test_postgres_url_driver_and_ssl_default():
    src = PostgresSource("db.example.com", 5432, "mydb", "u", "p", "orders")
    opts = src.reader_options()
    assert opts["url"] == "jdbc:postgresql://db.example.com:5432/mydb?sslmode=disable"
    assert opts["driver"] == "org.postgresql.Driver"
    assert opts["user"] == "u" and opts["password"] == "p"
    assert opts["dbtable"] == "orders"
    # unpartitioned by default — no partitionColumn leaks in
    assert "partitionColumn" not in opts


def test_postgres_sslmode_override():
    src = PostgresSource("h", 5432, "d", "u", "p", "t", sslmode="require")
    assert src.reader_options()["url"].endswith("sslmode=require")


def test_mysql_dialect():
    src = MySqlSource("h", 3306, "d", "u", "p", "t")
    opts = src.reader_options()
    assert opts["url"] == "jdbc:mysql://h:3306/d"
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"


def test_sqlite_dialect():
    src = SqliteSource("/tmp/x.db", "t")
    opts = src.reader_options()
    assert opts["url"] == "jdbc:sqlite:/tmp/x.db"
    assert opts["driver"] == "org.sqlite.JDBC"
    assert src.description() == "SqliteSource(jdbc:sqlite:/tmp/x.db, table=t)"


def test_partitioned_read_explicit_bounds():
    src = PostgresSource("h", 5432, "d", "u", "p", "orders",
                         partition_column="o_orderkey",
                         lower_bound=1, upper_bound=6_000_000,
                         num_partitions=64)
    opts = src.reader_options()
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "6000000"
    assert opts["numPartitions"] == "64"


def test_partitioned_read_defaults_num_partitions():
    src = DatabaseSource("jdbc:postgresql://h/d", "t",
                         partition_column="id", lower_bound=0, upper_bound=10)
    assert src.reader_options()["numPartitions"] == str(DEFAULT_NUM_PARTITIONS)


def test_auto_bounds_query_shape():
    src = DatabaseSource("jdbc:postgresql://h/d", "orders",
                         partition_column="o_orderkey")
    # bounds omitted -> reader_options carries the column + partitions,
    # load() will discover lo/hi with this pushed-down one-row query
    opts = src.reader_options()
    assert opts["partitionColumn"] == "o_orderkey"
    assert "lowerBound" not in opts
    assert src._bounds_query() == (
        "(SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi "
        "FROM orders) AS spark_bounds")


def test_fetch_size_and_extra_options():
    src = MySqlSource("h", 3306, "d", "u", "p", "t",
                      fetch_size=50_000, zeroDateTimeBehavior="convertToNull")
    opts = src.reader_options()
    assert opts["fetchsize"] == "50000"
    assert opts["zeroDateTimeBehavior"] == "convertToNull"


def test_predicates_exclusive_with_partition_column():
    with pytest.raises(ValueError, match="not both"):
        DatabaseSource("jdbc:postgresql://h/d", "t",
                       partition_column="id", predicates=["id < 10"])


def test_bounds_must_be_paired():
    with pytest.raises(ValueError, match="together"):
        DatabaseSource("jdbc:postgresql://h/d", "t",
                       partition_column="id", lower_bound=0)


def test_read_jdbc_accepts_partition_args():
    # read_jdbc delegates to DatabaseSource; exercise the option merge
    # path without loading (no driver jar in the sandbox).
    from term_spark.sources.database import DatabaseSource as DS
    src = DS("jdbc:postgresql://h/d", "t", user="u", password="p",
             partition_column="id", lower_bound=0, upper_bound=9,
             num_partitions=4, driver="org.postgresql.Driver")
    opts = src.reader_options()
    assert opts["numPartitions"] == "4" and opts["driver"] == "org.postgresql.Driver"
    assert callable(read_jdbc)
