"""Unit tests for bench.py's _PassWatchdog (the wedged-Arrow-pass guard).

No Spark needed: the watchdog only touches the session to scope a job
group and fire its cancellation, so a stub records whether (and which
group) cancellation was requested — r6: cancellation is job-group-scoped
(cancelAllJobs was SparkContext-wide and could kill an innocent
concurrent job at the pass boundary).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import _PassWatchdog  # noqa: E402


class _StubSpark:
    def __init__(self):
        self.cancels = 0
        self.groups_set: list = []
        self.groups_cancelled: list = []
        outer = self

        class _SC:
            def setJobGroup(self, group, desc, interruptOnCancel=False):
                outer.groups_set.append((group, interruptOnCancel))

            def cancelJobGroup(self, group):
                outer.cancels += 1
                outer.groups_cancelled.append(group)

            def setLocalProperty(self, key, value):
                pass

        self.sparkContext = _SC()


def test_fast_pass_returns_true_and_never_cancels():
    spark = _StubSpark()
    wd = _PassWatchdog(spark, limit_s=5.0)
    assert wd.run("quick", lambda: None) is True
    time.sleep(0.05)  # give a buggy timer thread a chance to misfire
    assert spark.cancels == 0
    assert wd.cancelled == []


def test_wedged_pass_is_cancelled_and_swallowed():
    """A pass that outlives the limit and then dies with the cancellation
    error is recorded as a lost trial (False), not an exception."""
    spark = _StubSpark()
    wd = _PassWatchdog(spark, limit_s=0.05)

    def wedged():
        time.sleep(0.3)  # long enough for the watchdog to fire
        raise RuntimeError("Job cancelled")  # what the unstuck py4j call raises

    assert wd.run("wedge", wedged) is False
    assert spark.cancels == 1
    assert wd.cancelled == ["wedge"]
    # the cancellation hit exactly the group this pass ran under, with
    # thread interruption (the wedge is a blocked socket read)
    assert spark.groups_cancelled == [spark.groups_set[-1][0]]
    assert spark.groups_set[-1][1] is True


def test_real_error_before_limit_propagates():
    """Genuine failures must NOT be swallowed as wedges."""
    spark = _StubSpark()
    wd = _PassWatchdog(spark, limit_s=5.0)

    def broken():
        raise ValueError("real bug")

    try:
        wd.run("broken", broken)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("expected the error to propagate")
    assert spark.cancels == 0
    assert wd.cancelled == []
