"""prefetch_iter contract tests (data/loader.py).

Three consumers share this helper (train prefetch, incremental ABR
batch_iter, the pipelined eval loop); these tests pin the contract the
driver relies on: order preservation, error propagation, and that an
early break releases the worker thread instead of leaving it blocked on
a full queue holding batch buffers.
"""

import threading
import time

import pytest

from abr_iod_tpu.data.loader import prefetch_iter


def test_order_and_completion():
    assert list(prefetch_iter(iter(range(50)), depth=3)) == list(range(50))


def test_producer_error_reraises():
    def gen():
        yield 1
        raise RuntimeError("producer died")

    it = prefetch_iter(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        list(it)


def test_early_close_releases_worker():
    """Breaking out of the consumer loop must unblock a producer stuck
    mid-put and let its thread exit (previously the daemon thread stayed
    blocked forever, pinning queued pixel batches)."""
    started = threading.Event()
    finished = threading.Event()

    def gen():
        started.set()
        try:
            for i in range(10_000):
                yield i
        finally:
            finished.set()

    it = prefetch_iter(gen(), depth=1)
    assert next(it) == 0
    started.wait(2)
    it.close()  # what an early `break` triggers at GC time
    # the worker notices the stop event within its 0.2 s put timeout
    deadline = time.time() + 5
    while not finished.is_set() and time.time() < deadline:
        time.sleep(0.05)
    assert finished.is_set(), "producer thread still blocked after close"


def test_zero_items():
    assert list(prefetch_iter(iter(()), depth=2)) == []


def test_on_drop_fires_for_unconsumed_items():
    """Every produced item is either yielded or on_drop'd, never both."""
    import threading
    import time

    produced, dropped, consumed = [], [], []
    release = threading.Event()

    def src():
        for i in range(10):
            produced.append(i)
            yield i
            if i == 0:
                release.wait(5)  # let the queue fill behind the consumer

    it = prefetch_iter(src(), depth=3, on_drop=dropped.append)
    consumed.append(next(it))
    # wait for the worker to fill the queue and block mid-put
    time.sleep(0.3)
    release.set()
    it.close()
    time.sleep(0.3)  # worker notices stop and drops its in-flight item
    assert sorted(consumed + dropped) == sorted(produced[:len(consumed) + len(dropped)])
    assert not (set(consumed) & set(dropped))
    assert dropped  # the queued items were reported


def test_on_drop_not_called_on_clean_completion():
    dropped = []
    out = list(prefetch_iter(iter(range(5)), depth=2, on_drop=dropped.append))
    assert out == list(range(5))
    assert dropped == []
