"""Background batch staging (utils/prefetch.py): ordering, errors, shutdown."""

import threading
import time


def test_prefetch_preserves_order_and_applies_stage():
    from buctd_tpu.utils.prefetch import prefetch

    items = list(range(20))
    out = list(prefetch(iter(items), stage=lambda x: x * 2, depth=3))
    assert out == [x * 2 for x in items]


def test_prefetch_depth_zero_is_synchronous():
    from buctd_tpu.utils.prefetch import prefetch

    seen = []

    def gen():
        for i in range(3):
            seen.append(i)
            yield i

    it = prefetch(gen(), depth=0)
    assert next(it) == 0
    # synchronous: nothing consumed ahead
    assert seen == [0]
    assert list(it) == [1, 2]


def test_prefetch_runs_ahead():
    """With depth=2 the worker stages ahead of the consumer."""
    from buctd_tpu.utils.prefetch import prefetch

    staged = []

    def stage(x):
        staged.append(x)
        return x

    it = prefetch(iter(range(10)), stage=stage, depth=2)
    assert next(it) == 0
    deadline = time.time() + 5.0
    # 0 consumed; queue holds 1,2 and the worker blocks staging 3
    while len(staged) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(staged) >= 3
    assert list(it) == list(range(1, 10))


def test_prefetch_propagates_loader_and_stage_errors():
    import pytest

    from buctd_tpu.utils.prefetch import prefetch

    def bad_gen():
        yield 1
        raise RuntimeError("loader died")

    out = []
    with pytest.raises(RuntimeError, match="loader died"):
        for x in prefetch(bad_gen(), depth=2):
            out.append(x)
    assert out == [1]

    def bad_stage(x):
        if x == 2:
            raise ValueError("stage died")
        return x

    with pytest.raises(ValueError, match="stage died"):
        list(prefetch(iter(range(5)), stage=bad_stage, depth=2))


def test_prefetch_early_break_stops_worker():
    """Abandoning the generator must stop the worker thread promptly (not leave
    it blocked on a full queue holding the loader)."""
    from buctd_tpu.utils.prefetch import prefetch

    n_threads = threading.active_count()
    it = prefetch(iter(range(1000)), depth=1)
    assert next(it) == 0
    it.close()  # same as `break` in a for-loop over it
    deadline = time.time() + 5.0
    while threading.active_count() > n_threads and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= n_threads
