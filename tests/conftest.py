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


def stop_and_await(q):
    """Kill-rig stop that absorbs the stop-race (r12 verdict #5): the
    deliberate mid-stream q.stop() can land inside broadcast/batch setup,
    and Spark then misclassifies the stop's own InterruptedException as
    STREAM_FAILED — awaitTermination() raises StreamingQueryException for
    what IS the kill the test ordered (observed once in r12's full suite:
    'TorrentBroadcast: Store broadcast fail' at the kill instant, green in
    isolation). The at-least-once contract already tolerates the replayed
    batch, so a failure that (a) did NOT predate the ordered kill and (b)
    carries the interrupt in its rendered cause chain is the kill itself;
    anything else re-raises (ADVICE r13: a failure captured BEFORE stop()
    is genuine regardless of message, and a bare 'broadcast' substring no
    longer absorbs — the r12 flake's broadcast frame bottoms out in the
    InterruptedException, which is what we match). The restart-drains-
    and-matches assertions stay load-bearing."""
    from pyspark.errors import StreamingQueryException

    pre_existing = q.exception()  # failed before the kill -> genuine
    q.stop()
    try:
        q.awaitTermination()
    except StreamingQueryException as e:
        msg = str(e).lower()
        if pre_existing is not None or not any(
            s in msg for s in ("interrupt", "sparkcontext was shut down")
        ):
            raise
