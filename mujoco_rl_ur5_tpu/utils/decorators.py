"""Profiling / debugging decorators.

Capability parity with the reference's decorators.py (timer :7-19,
debug :22-52, typeassert :70-89, dict2list :91-116), re-designed for a JAX
codebase where wall-clocking an *async-dispatched* function is meaningless
unless you block on its outputs first:

  * `timer`       — wall-clock per call, like the reference, but blocks on
                    any jax.Array in the return value (`block_until_ready`)
                    so the number measures compute, not dispatch;
  * `block_timer` — context manager variant for timing arbitrary regions;
  * `debug`       — signature/return tracing incl. array shapes/dtypes
                    (handles jax arrays and pytrees, not just np.ndarray);
  * `typeassert`  — positional/keyword argument type gate;
  * `dict2list`   — dict-of-arrays -> stacked array, as the reference uses
                    for its plotting buffers;
  * `jax_trace`   — context manager around `jax.profiler.trace` producing a
                    TensorBoard-viewable on-device trace (the TPU-native
                    replacement for per-call wall clocks, SURVEY §5).
"""

from __future__ import annotations

import contextlib
import functools
import time
from inspect import signature

import numpy as np


def _block(value):
    """block_until_ready on every jax leaf of `value` (no-op otherwise)."""
    try:
        import jax

        return jax.block_until_ready(value)
    except Exception:
        return value


def timer(func):
    """Prints the runtime of the decorated function (reference
    decorators.py:7-19), blocking on returned device arrays first."""

    @functools.wraps(func)
    def wrapper_timer(*args, **kwargs):
        start = time.perf_counter()
        value = _block(func(*args, **kwargs))
        print(f"{func.__name__!r} took {time.perf_counter() - start:.4f} "
              f"secs to execute.")
        return value

    return wrapper_timer


@contextlib.contextmanager
def block_timer(label: str = "region", out: list | None = None):
    """`with block_timer("solve"):` — wall-clocks a region. Appends the
    elapsed seconds to `out` when given (for bench harnesses)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - start
        if out is not None:
            out.append(elapsed)
        print(f"{label!r} took {elapsed:.4f} secs.")


def _describe(v) -> str:
    if hasattr(v, "shape") and hasattr(v, "dtype"):
        return f"{type(v).__name__}(shape={tuple(v.shape)}, dtype={v.dtype})"
    return repr(v) if np.isscalar(v) or v is None else type(v).__name__


def debug(func):
    """Prints the function signature and return value (reference
    decorators.py:22-52), array-aware for numpy AND jax arrays."""

    @functools.wraps(func)
    def wrapper_debug(*args, **kwargs):
        args_repr = [_describe(a) for a in args]
        kwargs_repr = [f"{k}={_describe(v)}" for k, v in kwargs.items()]
        print(f"########## Debugging {func.__name__} ##########")
        print(f"Calling {func.__name__}({', '.join(args_repr + kwargs_repr)}).")
        value = func(*args, **kwargs)
        print(f"{func.__name__} return type: {type(value)!r}")
        if isinstance(value, dict):
            print("Returned dictionary contents:")
            for k, v in value.items():
                print(f"{k}: {_describe(v)}")
        elif isinstance(value, (tuple, list)):
            for i, v in enumerate(value):
                print(f"[{i}]: {_describe(v)}")
        else:
            print(f"{func.__name__} returned {_describe(value)}.")
        print("#################################")
        return value

    return wrapper_debug


def typeassert(*ty_args, **ty_kwargs):
    """Enforce argument types (reference decorators.py:70-89)."""

    def decorate(func):
        sig = signature(func)
        bound_types = sig.bind_partial(*ty_args, **ty_kwargs).arguments

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            bound_values = sig.bind(*args, **kwargs)
            for name, value in bound_values.arguments.items():
                if name in bound_types and not isinstance(value,
                                                          bound_types[name]):
                    raise TypeError(
                        f"Argument {name} must be {bound_types[name]}")
            return func(*args, **kwargs)

        return wrapper

    return decorate


def dict2list(func):
    """Convert a returned dict of equal-length arrays into one stacked
    array (reference decorators.py:91-116)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        value = func(*args, **kwargs)
        if isinstance(value, dict):
            return np.stack([np.asarray(v) for v in value.values()])
        return value

    return wrapper


@contextlib.contextmanager
def jax_trace(logdir: str = "/tmp/jax-trace"):
    """On-device profiler trace viewable in TensorBoard (`tensorboard
    --logdir ...` -> Profile tab). The TPU-native replacement for per-call
    wall clocks: shows per-HLO timing, HBM traffic, and fusion layout."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"jax profiler trace written to {logdir}")
