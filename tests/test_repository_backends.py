"""Backend-agnostic MetricsRepository contract tests.

One parametrized suite runs the SAME ResultKey/tags contract against
every backend: InMemory, Parquet, and Delta (the round-6 table-format
backend).  delta-spark is not in the sandbox, so the Delta row skips
there with a visible reason and runs wherever the package exists — the
same import-gating pattern as the OTel telemetry tests.
"""

import pytest

from term_spark.analyzers.base import MetricValue
from term_spark.repository import (InMemoryRepository, MetricsRepository,
                                   ParquetRepository, ResultKey)
from term_spark.repository.delta import DeltaRepository, delta_available

BACKENDS = ["memory", "parquet",
            pytest.param("delta", marks=pytest.mark.skipif(
                not delta_available(),
                reason="delta-spark not installed (sandbox); "
                       "runs wherever the package exists"))]


@pytest.fixture()
def make_repo(spark, tmp_path):
    def _make(kind) -> MetricsRepository:
        if kind == "memory":
            return InMemoryRepository()
        if kind == "parquet":
            return ParquetRepository(str(tmp_path / "pq"))
        return DeltaRepository(spark, str(tmp_path / "delta"))
    return _make


@pytest.mark.parametrize("kind", BACKENDS)
def test_contract_save_load_keys(make_repo, kind):
    repo = make_repo(kind)
    k1 = ResultKey.of(1000.0, env="prod", suite="s1")
    k2 = ResultKey.of(2000.0, env="dev")
    repo.save(k1, {"size": MetricValue.long(100),
                   "mean.x": MetricValue.double(3.5)})
    repo.save(k2, {"size": MetricValue.long(7)})
    assert repo.keys() == [k1, k2]          # chronological
    loaded = repo.load(k1)
    assert loaded["size"].value == 100 and loaded["mean.x"].value == 3.5
    assert repo.load(ResultKey.of(9999.0)) is None


@pytest.mark.parametrize("kind", BACKENDS)
def test_contract_query_filters_and_series(make_repo, kind):
    repo = make_repo(kind)
    for i, v in enumerate([0.9, 0.92, 0.95]):
        repo.save(ResultKey.of(1000.0 + i, env="prod"),
                  {"completeness.name": MetricValue.double(v)})
    repo.save(ResultKey.of(1500.0, env="dev"),
              {"completeness.name": MetricValue.double(0.5)})
    assert repo.series("completeness.name",
                       tags={"env": "prod"}) == [0.9, 0.92, 0.95]
    assert len(repo.query("completeness.name", after=1001.5,
                          tags={"env": "prod"})) == 1
    # descending sort
    desc = repo.query("completeness.name", ascending=False)
    assert [t[0].timestamp for t in desc] == sorted(
        (t[0].timestamp for t in desc), reverse=True)


@pytest.mark.parametrize("kind", BACKENDS)
def test_contract_delete(make_repo, kind):
    repo = make_repo(kind)
    k1 = ResultKey.of(1000.0, env="prod")
    k2 = ResultKey.of(1000.0, env="dev")   # same ts, different tags
    repo.save(k1, {"size": MetricValue.long(1)})
    repo.save(k2, {"size": MetricValue.long(2)})
    repo.delete(k1)
    assert repo.load(k1) is None
    assert repo.load(k2)["size"].value == 2  # tag-sibling untouched


@pytest.mark.parametrize("kind", [
    "parquet",
    pytest.param("delta", marks=pytest.mark.skipif(
        not delta_available(), reason="delta-spark not installed"))])
def test_contract_retention(make_repo, kind):
    repo = make_repo(kind)
    for i in range(5):
        repo.save(ResultKey.of(1000.0 + i), {"m": MetricValue.double(i)})
    if kind == "parquet":
        dropped = repo.compact(before_ts=1003.0)
        assert dropped == 3
    else:
        repo.retention(before_ts=1003.0)
    assert [k.timestamp for k in repo.keys()] == [1003.0, 1004.0]


def test_delta_repository_import_gate(spark, tmp_path):
    # sandbox path: constructing without delta-spark must raise a clear
    # ImportError naming the package and the fallback, never a silent
    # half-working repository
    if delta_available():
        pytest.skip("delta-spark IS installed here; gate not reachable")
    with pytest.raises(ImportError, match="delta-spark"):
        DeltaRepository(spark, str(tmp_path / "d"))
