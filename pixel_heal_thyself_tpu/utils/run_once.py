"""Run-once guards, singleton metaclass, and truthiness helpers.

Behavioral parity with the reference's `pht/utils.py:8-151` (same public
surface and exception semantics), reimplemented for this framework.
"""

from __future__ import annotations

import multiprocessing
import threading
from typing import Any, Callable, ClassVar


def is_truthy(value: Any) -> bool:
    """Truthiness used by config plumbing: bools, 'true/yes/y' strings, ints."""
    if isinstance(value, bool):
        return value
    if isinstance(value, str):
        return value.lower() in ("true", "yes", "y")
    if isinstance(value, int):
        return value != 0
    return False


def is_none(value: Any) -> bool:
    """True when value is None or the string 'none' (any case)."""
    return value is None or str(value).lower() == "none"


def is_none_or_empty(value: Any) -> bool:
    """True when value is None, 'none', or empty string."""
    return is_none(value) or str(value) == ""


class SingletonMeta(type):
    """Metaclass giving each class a single, lazily-created instance."""

    _instances: ClassVar[dict[type, Any]] = {}
    _lock = threading.Lock()

    def __call__(cls, *args: Any, **kwargs: Any) -> Any:
        with cls._lock:
            if cls not in cls._instances:
                cls._instances[cls] = super().__call__(*args, **kwargs)
        return cls._instances[cls]


def _make_run_once(make_state: Callable[[], tuple[Callable, Callable, Callable]]):
    """Build a run-once decorator from a state factory.

    `make_state` returns (get_executed, set_executed, lock_ctx) closures.
    First call runs the function and returns its value; later calls return
    None. On exception the guard is kept set unless
    `is_exception_success=False`; `passthrough_exception=True` re-raises.
    """

    def run_once_like(
        func: Callable | None = None,
        *,
        is_exception_success: bool = True,
        passthrough_exception: bool = False,
    ) -> Callable:
        def decorator(fn: Callable) -> Callable:
            get_executed, set_executed, lock_ctx = make_state()

            def wrapper(*args: Any, **kwargs: Any) -> Any:
                with lock_ctx():
                    if not get_executed():
                        try:
                            result = fn(*args, **kwargs)
                            set_executed(True)
                            return result
                        except Exception:
                            if is_exception_success:
                                set_executed(True)
                            if passthrough_exception:
                                raise
                    return None

            return wrapper

        if func is None:
            return decorator
        return decorator(func)

    return run_once_like


def _thread_state():
    state = {"executed": False}
    lock = threading.Lock()

    def lock_ctx():
        return lock

    return (lambda: state["executed"]), (lambda v: state.update(executed=v)), lock_ctx


def _mp_state():
    executed = multiprocessing.Value("b", False)
    thread_lock = threading.Lock()

    class _Both:
        def __enter__(self):
            thread_lock.acquire()
            executed.get_lock().acquire()

        def __exit__(self, *exc):
            executed.get_lock().release()
            thread_lock.release()
            return False

    def set_executed(v: bool) -> None:
        executed.value = v

    return (lambda: bool(executed.value)), set_executed, _Both


run_once = _make_run_once(_thread_state)
"""Thread-safe run-once decorator (not multiprocessing-safe)."""

run_once_multiprocessing = _make_run_once(_mp_state)
"""Thread- and multiprocessing-safe run-once decorator."""
