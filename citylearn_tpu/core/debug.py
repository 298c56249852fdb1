"""Toggleable runtime physics assertions for the fused step.

The reference guards its step with inline asserts — demand never exceeds
the device's max output (``building.py:1825-1829``), electricity
consumption is non-negative (``building.py:1831-1834``), downward
flexibility is non-negative (``building.py:657-665``) — which vanish
under ``python -O``. The TPU analog (SURVEY.md §5.2): a trace-time flag
that compiles `jax.debug.callback` checks into the step when enabled and
costs nothing when disabled (the default, and always under ``bench.py``).

Usage::

    from citylearn_tpu.core import debug
    debug.enable_checks(True)       # re-trace/jit AFTER toggling
"""

from __future__ import annotations

import numpy as np

_CHECKS_ENABLED = False


def enable_checks(on: bool = True) -> None:
    """Turn runtime physics checks on/off. The flag is read at *trace*
    time: clear jit caches (or build fresh jitted callables) after
    toggling for it to take effect."""
    global _CHECKS_ENABLED
    _CHECKS_ENABLED = bool(on)
    if on:
        # probe now, outside any trace — probing lazily from inside a jit
        # trace would stage the probe into the traced program and always
        # "succeed"
        _backend_supports_callbacks()


def checks_enabled() -> bool:
    return _CHECKS_ENABLED


class PhysicsCheckError(AssertionError):
    pass


_CALLBACK_OK = None


def _backend_supports_callbacks() -> bool:
    """Host send/recv callbacks are unavailable on some PJRT plugins
    (tunneled TPU backends raise UNIMPLEMENTED for jax.debug.callback,
    while still reporting platform 'tpu') — probe once with a no-op
    callback; debug checks degrade to a one-time warning instead of
    crashing the step."""
    global _CALLBACK_OK
    if _CALLBACK_OK is None:
        import jax

        def probe(x):
            jax.debug.callback(lambda v: None, x)
            return x + 1

        try:
            jax.block_until_ready(jax.jit(probe)(np.zeros(())))
            _CALLBACK_OK = True
        except Exception:
            _CALLBACK_OK = False
    return _CALLBACK_OK


_WARNED = False


def runtime_check(conditions: dict) -> None:
    """Assert every (name -> bool array) condition holds elementwise.

    No-op unless :func:`enable_checks` was called before tracing. Under
    jit this inserts a host callback per step — debug mode only."""
    if not _CHECKS_ENABLED:
        return
    import jax

    if not _backend_supports_callbacks():
        global _WARNED
        if not _WARNED:
            import warnings

            warnings.warn("runtime physics checks need host-callback "
                          "support; unavailable on backend "
                          f"{jax.default_backend()!r} — checks skipped "
                          "(run on CPU/TPU/GPU to enable)")
            _WARNED = True
        return

    names = tuple(conditions.keys())

    def _cb(*flags):
        bad = [n for n, f in zip(names, flags) if not bool(np.all(f))]
        if bad:
            raise PhysicsCheckError(
                f"physics invariant violated: {', '.join(bad)}")

    jax.debug.callback(_cb, *conditions.values())
