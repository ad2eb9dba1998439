"""Tests for run-once guards (reference test model: `tests/test_utils.py`)."""

import threading

import pytest

from pixel_heal_thyself_tpu.utils import (
    SingletonMeta,
    is_none_or_empty,
    is_truthy,
    run_once,
    run_once_multiprocessing,
)


@pytest.mark.parametrize("decorator", [run_once, run_once_multiprocessing])
class TestRunOnce:
    def test_runs_once_and_returns_value_then_none(self, decorator):
        calls = []

        @decorator
        def fn(x):
            calls.append(x)
            return x * 2

        assert fn(3) == 6
        assert fn(4) is None
        assert calls == [3]

    def test_exception_counts_as_executed_by_default(self, decorator):
        calls = []

        @decorator
        def fn():
            calls.append(1)
            raise RuntimeError("boom")

        assert fn() is None  # swallowed
        assert fn() is None
        assert calls == [1]

    def test_exception_not_success_retries(self, decorator):
        calls = []

        @decorator(is_exception_success=False)
        def fn():
            calls.append(1)
            if len(calls) < 2:
                raise RuntimeError("boom")
            return "ok"

        assert fn() is None
        assert fn() == "ok"
        assert fn() is None
        assert calls == [1, 1]

    def test_passthrough_exception(self, decorator):
        @decorator(passthrough_exception=True)
        def fn():
            raise ValueError("boom")

        with pytest.raises(ValueError):
            fn()
        assert fn() is None  # still marked executed

    def test_thread_safety(self, decorator):
        results = []

        @decorator
        def fn():
            return "ran"

        def worker():
            results.append(fn())

        threads = [threading.Thread(target=worker) for _ in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results.count("ran") == 1
        assert results.count(None) == 15


def test_singleton_meta():
    class A(metaclass=SingletonMeta):
        def __init__(self):
            self.v = object()

    class B(metaclass=SingletonMeta):
        pass

    assert A() is A()
    assert B() is B()
    assert A() is not B()


def test_truthy_helpers():
    assert is_truthy(True) and is_truthy("Yes") and is_truthy(1)
    assert not is_truthy(False) and not is_truthy("false") and not is_truthy(0)
    assert is_none_or_empty(None) and is_none_or_empty("none")
    assert is_none_or_empty("") and not is_none_or_empty("x")
