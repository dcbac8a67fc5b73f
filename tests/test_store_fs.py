"""Commit-log filesystem routing (ADVICE r4): store paths addressed
with a filesystem scheme (hdfs://, s3a://, file:) must route the
``<path>._commits`` log through the Hadoop FileSystem API instead of
driver-local open()/os.path.exists — a local ``file:`` URI exercises
the exact same JVM code path in local mode."""

import os

from svoe_spark.operators.rollup import RollupStore
from svoe_spark.queries import ticks
from svoe_spark.operators.util import (
    _is_local_path,
    append_commit,
    read_commit_log,
    store_path_exists,
)


def test_scheme_detection():
    assert _is_local_path("/tmp/store")
    assert _is_local_path("relative/path")
    assert not _is_local_path("file:/tmp/store")
    assert not _is_local_path("hdfs://nn:8020/warehouse/store")
    assert not _is_local_path("s3a://bucket/prefix")


def test_commit_log_roundtrip_via_hadoop_fs(spark, tmp_path):
    path = "file:" + str(tmp_path / "store")
    assert read_commit_log(spark, path) == set()
    append_commit(spark, path, 0)
    append_commit(spark, path, 3)
    assert read_commit_log(spark, path) == {0, 3}
    # idempotent re-append keeps the set shape
    append_commit(spark, path, 3)
    assert read_commit_log(spark, path) == {0, 3}
    assert store_path_exists(spark, path + "._commits")
    assert not store_path_exists(spark, path + ".nope")
    # the log landed where a local reader expects it
    assert os.path.exists(str(tmp_path / "store") + "._commits")
    # ADVICE r5: the rewrite is write-temp-then-rename, so no ._tmp
    # residue survives a successful append and the log is never the
    # truncation-in-progress file
    assert not os.path.exists(str(tmp_path / "store") + "._commits._tmp")


def test_read_commit_log_recovers_from_delete_rename_window(spark, tmp_path):
    """Review finding r6: a crash BETWEEN fs.delete(log) and
    fs.rename(tmp, log) leaves only the temp file — which is complete
    (the delete only ever runs after the temp is closed). The reader
    must fall back to it, and the next append must first restore it
    durably, so the window can no longer lose the whole history."""
    path = "file:" + str(tmp_path / "store")
    append_commit(spark, path, 1)
    append_commit(spark, path, 2)
    local = str(tmp_path / "store") + "._commits"
    # simulate the crash window: full temp present, log deleted
    os.rename(local, local + "._tmp")
    assert read_commit_log(spark, path) == {1, 2}
    append_commit(spark, path, 3)
    assert read_commit_log(spark, path) == {1, 2, 3}
    assert os.path.exists(local)
    assert not os.path.exists(local + "._tmp")


def test_append_commit_survives_stale_tmp(spark, tmp_path):
    """A crash AFTER writing ._tmp but BEFORE the rename leaves a stale
    temp file; the next append must overwrite it and land the full id
    set — the previous log was never truncated in the meantime."""
    path = "file:" + str(tmp_path / "store")
    append_commit(spark, path, 1)
    local_tmp = str(tmp_path / "store") + "._commits._tmp"
    with open(local_tmp, "w") as f:
        f.write("999\n")  # simulated half-finished rewrite
    append_commit(spark, path, 2)
    assert read_commit_log(spark, path) == {1, 2}
    assert not os.path.exists(local_tmp)


def test_rollup_store_exactly_once_with_schemed_path(spark, sf_small, tmp_path):
    t = ticks(spark, sf_small).limit(400)
    store = RollupStore(spark, "file:" + str(tmp_path / "bars"))
    assert store.apply_batch(t, 0) is True
    first = sorted(map(tuple, store.read().collect()))
    # replayed batch id: short-circuited by the Hadoop-FS commit log
    assert store.apply_batch(t, 0) is False
    assert sorted(map(tuple, store.read().collect())) == first
