"""SnapshotCatalog semantics: committed-versions-only reads, time travel,
truncate_after, and per-partition lineage (north rule)."""

import pytest

from macocu_crawler_spark.tables import SnapshotCatalog


@pytest.fixture()
def catalog(tmp_path):
    return SnapshotCatalog(str(tmp_path / "cat"))


def test_versioning_and_time_travel(spark, catalog):
    df1 = spark.range(5).selectExpr("id", "id * 2 AS x")
    df2 = spark.range(3).selectExpr("id", "id * 3 AS x")
    v1 = catalog.write("t", df1, version=1)
    v2 = catalog.write("t", df2, version=2)
    assert (v1, v2) == (1, 2)
    assert catalog.read(spark, "t").count() == 3  # latest
    assert catalog.read(spark, "t", version=1).count() == 5  # time travel
    assert catalog.read_all(spark, "t").count() == 8


def test_truncate_after_hides_stale_versions(spark, catalog):
    for v in (1, 2, 3):
        catalog.write("t", spark.range(v), version=v)
    catalog.truncate_after("t", 1)
    assert catalog.versions("t") == [1]
    assert catalog.read(spark, "t").count() == 1


def test_expire_snapshots_protects_live_pin(spark, catalog):
    """Expiry drops all but the newest keep_last versions EXCEPT the
    caller's protected version — the one a live DataFrame plan still
    scans; a protected-version read must keep working after expiry, and
    intermediate commit-only snapshots between the pin and the newest are
    expired normally."""
    for v in (0, 2, 4, 5):
        catalog.write("t", spark.range(v + 1), version=v)
    live = catalog.read(spark, "t", version=0)  # the 'pinned' live plan
    expired = catalog.expire_snapshots("t", keep_last=2, protect=0)
    assert expired == [2]
    assert catalog.versions("t") == [0, 4, 5]
    assert live.count() == 1  # the protected files are still on disk
    # with no protection, plain newest-N retention applies
    expired2 = catalog.expire_snapshots("t", keep_last=2)
    assert expired2 == [0]
    assert catalog.versions("t") == [4, 5]
    with pytest.raises(ValueError):
        catalog.expire_snapshots("t", keep_last=1)


def test_per_partition_lineage_recorded(spark, catalog):
    """Every committed snapshot carries one lineage entry per data file
    with its row count (north rule: per-partition lineage + metrics)."""
    df = spark.range(100).repartition(4)
    catalog.write("t", df, version=7, metrics={"round": 7})
    entry = catalog.metrics("t")[-1]
    assert entry["version"] == 7
    assert entry["metrics"] == {"round": 7}
    lineage = entry["lineage"]
    assert len(lineage) == 4
    assert sum(e["rows"] for e in lineage) == 100
    assert all(e["file"].endswith(".parquet") for e in lineage)
