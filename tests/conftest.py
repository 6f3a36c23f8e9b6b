import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("EZ_CDC_TEST_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ez_cdc_spark.session import get_spark

    s = get_spark("ez_cdc_spark-tests")
    yield s
    # session is shared; don't stop between modules


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


# Exception classes the ordered q.stop() itself produces when it lands
# inside broadcast/batch setup — the only failures the kill rig absorbs.
_INTERRUPT_CLASSES = (
    "java.lang.InterruptedException",
    "java.nio.channels.ClosedByInterruptException",
    "java.io.InterruptedIOException",
)


def _interrupt_in_cause_chain(e) -> bool:
    """True iff the captured exception's JAVA cause chain bottoms out in a
    thread-interrupt class (r14 verdict #5: match the exception CLASS
    chain, not rendered-message substrings — a genuine failure whose
    message merely contains 'interrupt' must re-raise)."""
    jexc = getattr(e, "_origin", None)
    hops = 0
    while jexc is not None and hops < 32:
        if jexc.getClass().getName() in _INTERRUPT_CLASSES:
            return True
        jexc = jexc.getCause()
        hops += 1
    if hops == 0:
        # no Java origin attached (string-rendered capture): fall back to
        # the stack trace's own 'Caused by: <class>' lines — still a
        # class-name match, not a free-text substring
        import re

        trace = getattr(e, "_stackTrace", "") or ""
        return any(
            re.search(rf"(?m)^(Caused by: )?{re.escape(cls)}", trace)
            for cls in _INTERRUPT_CLASSES
        )
    return False


def stop_and_await(q):
    """Kill-rig stop that absorbs the stop-race (r12 verdict #5): the
    deliberate mid-stream q.stop() can land inside broadcast/batch setup,
    and Spark then misclassifies the stop's own InterruptedException as
    STREAM_FAILED — awaitTermination() raises StreamingQueryException for
    what IS the kill the test ordered (observed once in r12's full suite:
    'TorrentBroadcast: Store broadcast fail' at the kill instant, green in
    isolation). The at-least-once contract already tolerates the replayed
    batch, so a failure that (a) did NOT predate the ordered kill and (b)
    carries a thread-interrupt CLASS in its Java cause chain is the kill
    itself; anything else re-raises (ADVICE r13: a failure captured
    BEFORE stop() is genuine regardless of content; r14 verdict #5: the
    message-substring heuristic is gone — _interrupt_in_cause_chain walks
    getCause() class names). The restart-drains-and-matches assertions
    stay load-bearing."""
    from pyspark.errors import StreamingQueryException

    pre_existing = q.exception()  # failed before the kill -> genuine
    q.stop()
    try:
        q.awaitTermination()
    except StreamingQueryException as e:
        if pre_existing is not None or not _interrupt_in_cause_chain(e):
            raise
