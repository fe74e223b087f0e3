"""ReplicaPool failover: retries, health accounting, last-resort dispatch.

Fast lane — uses duck-typed fake replicas (ReplicaPool only needs
submit/close), no models or devices.
"""

from concurrent.futures import Future

import pytest

from visualcloze_tpu.pipeline.orchestrator import ReplicaPool


class FakeReplica:
    """submit() resolves immediately: value for healthy, exception when
    failing. Records every call so tests can assert routing."""

    def __init__(self, name: str, failing: bool = False):
        self.name = name
        self.failing = failing
        self.calls = 0
        self.closed = False

    def submit(self, *args, **kwargs) -> Future:
        self.calls += 1
        fut: Future = Future()
        if self.failing:
            fut.set_exception(RuntimeError(f"{self.name} crashed"))
        else:
            fut.set_result(f"{self.name}:{args[0] if args else ''}")
        return fut

    def close(self) -> None:
        self.closed = True


def test_failover_retries_on_healthy_replica():
    bad, good = FakeReplica("bad", failing=True), FakeReplica("good")
    pool = ReplicaPool([bad, good])
    # least-loaded picks index 0 (bad) first; the query must still succeed
    assert pool.submit("q").result(timeout=5) == "good:q"
    assert bad.calls == 1 and good.calls == 1
    health = pool.health()
    assert health[0]["consecutive_failures"] == 1
    assert health[1] == {"in_flight": 0, "consecutive_failures": 0, "healthy": True}


def test_unhealthy_replica_leaves_dispatch_set():
    bad, good = FakeReplica("bad", failing=True), FakeReplica("good")
    pool = ReplicaPool([bad, good], unhealthy_after=3)
    for _ in range(3):
        pool.submit("q").result(timeout=5)
    assert not pool.health()[0]["healthy"]
    bad_calls = bad.calls
    for _ in range(4):
        assert pool.submit("q").result(timeout=5) == "good:q"
    assert bad.calls == bad_calls  # no longer dispatched to


def test_recovery_resets_failures():
    flaky, other = FakeReplica("flaky", failing=True), FakeReplica("other", failing=True)
    pool = ReplicaPool([flaky, other], unhealthy_after=2)
    for _ in range(2):
        with pytest.raises(RuntimeError):
            pool.submit("q").result(timeout=5)
    assert [h["healthy"] for h in pool.health()] == [False, False]
    # all unhealthy: the pool still tries them (recovery probe); a success
    # restores the replica to the dispatch set
    flaky.failing = False
    assert pool.submit("q").result(timeout=5).startswith("flaky:")
    assert pool.health()[0] == {
        "in_flight": 0, "consecutive_failures": 0, "healthy": True,
    }


def test_all_replicas_fail_raises_last_error():
    a, b = FakeReplica("a", failing=True), FakeReplica("b", failing=True)
    pool = ReplicaPool([a, b])
    with pytest.raises(RuntimeError, match="crashed"):
        pool.submit("q").result(timeout=5)
    assert a.calls == 1 and b.calls == 1  # one try per replica, no loops


def test_close_closes_all_replicas():
    rs = [FakeReplica("a"), FakeReplica("b")]
    with ReplicaPool(rs) as pool:
        pool.submit("q").result(timeout=5)
    assert all(r.closed for r in rs)


class ValueErrorReplica(FakeReplica):
    def submit(self, *args, **kwargs) -> Future:
        self.calls += 1
        fut: Future = Future()
        fut.set_exception(ValueError("unknown adapter 'x'"))
        return fut


def test_client_errors_do_not_failover_or_count():
    """A ValueError (bad request / unknown adapter) is deterministic on every
    replica: no retry, and it must not poison replica health."""
    a, b = ValueErrorReplica("a"), FakeReplica("b")
    pool = ReplicaPool([a, b])
    for _ in range(5):
        with pytest.raises(ValueError, match="unknown adapter"):
            pool.submit("q").result(timeout=5)
    assert b.calls == 0  # never retried on the other replica
    assert all(h["healthy"] and h["consecutive_failures"] == 0
               for h in pool.health())


class RaisingReplica(FakeReplica):
    """submit() itself raises synchronously — the shape of a ThreadPoolExecutor
    that has been shut down (drain/close) when the retry lands on it."""

    def submit(self, *args, **kwargs) -> Future:
        self.calls += 1
        raise RuntimeError(f"{self.name}: cannot schedule new futures after shutdown")


def test_synchronous_submit_raise_fails_over_and_releases_slot():
    """A raise inside replicas[i].submit must behave like a failed query:
    retry on the next replica, resolve the outer future, and release the
    in-flight slot (an unhandled raise here used to leave the future
    unresolved forever and leak _inflight)."""
    dead, good = RaisingReplica("dead"), FakeReplica("good")
    pool = ReplicaPool([dead, good])
    assert pool.submit("q").result(timeout=5) == "good:q"
    assert dead.calls == 1 and good.calls == 1
    h = pool.health()
    assert h[0]["in_flight"] == 0 and h[0]["consecutive_failures"] == 1


def test_synchronous_submit_raise_on_all_replicas_resolves_future():
    a, b = RaisingReplica("a"), RaisingReplica("b")
    pool = ReplicaPool([a, b])
    with pytest.raises(RuntimeError, match="shutdown"):
        pool.submit("q").result(timeout=5)
    assert all(h["in_flight"] == 0 for h in pool.health())
