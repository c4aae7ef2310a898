"""Single-writer write.lock (Lucene NativeFSLockFactory analog):
mutual exclusion between index writers, stale-lock breaking, and the
segment writers actually honoring it."""

import json
import os
import threading

import pytest

from org_rdkit_lucene_spark.lock import LOCK_NAME, LockHeldError, write_lock


def test_mutual_exclusion(tmp_path):
    d = str(tmp_path / "idx")
    with write_lock(d):
        assert os.path.exists(os.path.join(d, LOCK_NAME))
        with pytest.raises(LockHeldError, match="live pid"):
            with write_lock(d):
                pass
    # released on exit
    assert not os.path.exists(os.path.join(d, LOCK_NAME))


def test_released_on_exception(tmp_path):
    d = str(tmp_path / "idx")
    with pytest.raises(ValueError):
        with write_lock(d):
            raise ValueError("boom")
    assert not os.path.exists(os.path.join(d, LOCK_NAME))


def test_stale_same_host_lock_broken(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    import socket

    # a dead pid on this host: pid 1 is init (alive) — use an absurd pid
    with open(os.path.join(d, LOCK_NAME), "w") as f:
        json.dump({"pid": 2**22 + 12345, "host": socket.gethostname(), "ts": 0}, f)
    with write_lock(d):
        pass  # stale lock silently broken
    assert not os.path.exists(os.path.join(d, LOCK_NAME))


def test_foreign_host_lock_respected(tmp_path):
    d = str(tmp_path / "idx")
    os.makedirs(d)
    with open(os.path.join(d, LOCK_NAME), "w") as f:
        json.dump({"pid": 1, "host": "some-other-host", "ts": 0}, f)
    with pytest.raises(LockHeldError, match="cross-host"):
        with write_lock(d):
            pass


def test_thread_race_single_winner(tmp_path):
    d = str(tmp_path / "idx")
    results = []
    barrier = threading.Barrier(4)

    def worker():
        barrier.wait()
        try:
            with write_lock(d):
                results.append("got")
                import time

                time.sleep(0.05)
        except LockHeldError:
            results.append("blocked")

    ts = [threading.Thread(target=worker) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert results.count("got") >= 1 and results.count("blocked") >= 1


def test_disabled_is_noop(tmp_path):
    d = str(tmp_path / "idx")
    with write_lock(d, enabled=False):
        with write_lock(d, enabled=False):
            pass
    assert not os.path.exists(os.path.join(d, LOCK_NAME))


def test_delete_blocked_while_writer_holds_lock(spark, tmp_path):
    """The segment writers honor the lock: a delete attempted while
    another (simulated) writer holds write.lock fails loudly instead of
    interleaving with its prior-view read."""
    import pandas as pd

    from org_rdkit_lucene_spark.config import IndexConfig
    from org_rdkit_lucene_spark.operators.build import build_index
    from org_rdkit_lucene_spark.sources.fixtures import make_corpus_pdf
    from org_rdkit_lucene_spark.streaming.incremental import delete_docs

    pdf = make_corpus_pdf(n_docs=30, seed=3)
    pdf.insert(0, "ext_id", range(len(pdf)))
    cfg = IndexConfig(build_partitions=2, n_salts=2)
    d = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(pdf), cfg, d, id_col="ext_id")
    import socket

    # simulate a live concurrent writer (this very process)
    with open(os.path.join(d, LOCK_NAME), "w") as f:
        json.dump({"pid": os.getpid() + 1, "host": socket.gethostname(), "ts": 0}, f)
    alive = os.getpid() + 1
    try:
        os.kill(alive, 0)
        holder_alive = True
    except ProcessLookupError:
        holder_alive = False
    if holder_alive:
        with pytest.raises(LockHeldError):
            delete_docs(spark, d, [1], cfg)
        os.unlink(os.path.join(d, LOCK_NAME))
    # with the lock gone the delete proceeds
    delete_docs(spark, d, [1], cfg)
