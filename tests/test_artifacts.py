"""Unit tests for the resident-artifact cache (pim_orc_spark/artifacts.py).

The cache's contract (round-6 ADVICE hardening): one build per
(family, application, table dir, dir mtime); other applications'
entries evicted; an in-place table-directory change (mtime bump)
invalidates; a failing reuse probe evicts and rebuilds instead of
serving a dead handle forever; threaded access is lock-guarded;
clear() releases everything. No Spark needed — a stub session carries
the applicationId.
"""

from __future__ import annotations

import os
import threading
import time

from pim_orc_spark import artifacts


class _StubCtx:
    def __init__(self, app_id: str):
        self.applicationId = app_id


class _StubSpark:
    def __init__(self, app_id: str):
        self.sparkContext = _StubCtx(app_id)


def _counter_build(counter):
    def build():
        counter.append(1)
        return object()

    return build


def test_builds_once_per_key(tmp_path):
    artifacts.clear()
    spark = _StubSpark("app-1")
    calls = []
    a = artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    b = artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    assert a is b
    assert len(calls) == 1


def test_other_application_entries_are_evicted(tmp_path):
    artifacts.clear()
    calls = []
    artifacts.cached_artifact(
        "fam", _StubSpark("app-1"), str(tmp_path), _counter_build(calls)
    )
    artifacts.cached_artifact(
        "fam", _StubSpark("app-2"), str(tmp_path), _counter_build(calls)
    )
    # app-1's entry died with its eviction; a third access under app-1
    # rebuilds rather than resurrecting a dead handle
    artifacts.cached_artifact(
        "fam", _StubSpark("app-1"), str(tmp_path), _counter_build(calls)
    )
    assert len(calls) == 3


def test_directory_mtime_change_invalidates(tmp_path):
    artifacts.clear()
    spark = _StubSpark("app-1")
    calls = []
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    # in-place rewrite: touching the dir bumps its mtime => new key,
    # stale version evicted
    future = time.time() + 10
    os.utime(tmp_path, (future, future))
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    assert len(calls) == 2


def test_failing_probe_evicts_and_rebuilds(tmp_path):
    artifacts.clear()
    spark = _StubSpark("app-1")
    calls = []

    def raising_probe(_):
        raise RuntimeError("checkpoint blocks lost with executor")

    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    artifacts.cached_artifact(
        "fam", spark, str(tmp_path), _counter_build(calls), probe=raising_probe
    )
    assert len(calls) == 2
    # a passing probe keeps the cached entry
    artifacts.cached_artifact(
        "fam", spark, str(tmp_path), _counter_build(calls), probe=lambda a: True
    )
    assert len(calls) == 2


def test_clear_releases_everything(tmp_path):
    artifacts.clear()
    spark = _StubSpark("app-1")
    calls = []
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    artifacts.clear()
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    assert len(calls) == 2


def test_threaded_access_is_consistent(tmp_path):
    """16 threads racing the same key: every caller gets the SAME
    object, and the store holds exactly one entry afterwards (the
    last-put-wins race documented in cached_artifact can build more
    than once, but never hands out divergent results)."""
    artifacts.clear()
    spark = _StubSpark("app-1")
    results = []

    def build():
        time.sleep(0.01)
        return object()

    def worker():
        results.append(
            artifacts.cached_artifact("fam", spark, str(tmp_path), build)
        )

    threads = [threading.Thread(target=worker) for _ in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 16
    first = results[0]
    assert all(r is first for r in results)


def test_none_valued_artifact_is_cached(tmp_path):
    """A build() that legitimately returns None must still cache (the
    pre-round-7 .get(None) treated None as a miss and rebuilt every
    access)."""
    artifacts.clear()
    spark = _StubSpark("app-1")
    calls = []

    def build():
        calls.append(1)
        return None

    for _ in range(3):
        got = artifacts.cached_artifact("fam", spark, str(tmp_path), build)
        assert got is None
    assert len(calls) == 1


def test_in_place_file_rewrite_invalidates(tmp_path):
    """Overwriting a file WITHOUT renaming it leaves the directory's
    own mtime untouched on many filesystems — the key must include
    per-entry mtimes so an in-place table rewrite evicts the artifact."""
    artifacts.clear()
    spark = _StubSpark("app-1")
    f = tmp_path / "part-0.parquet"
    f.write_bytes(b"v1")
    calls = []
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    # same name, new content, mtime pushed forward; pin the directory's
    # own mtime back so only the per-file stat can catch the rewrite
    dstat = os.stat(tmp_path)
    f.write_bytes(b"v2")
    os.utime(f, (dstat.st_atime, dstat.st_mtime + 10))
    os.utime(tmp_path, (dstat.st_atime, dstat.st_mtime))
    artifacts.cached_artifact("fam", spark, str(tmp_path), _counter_build(calls))
    assert len(calls) == 2
