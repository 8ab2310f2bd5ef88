"""Persistent XLA compilation cache.

The big jitted programs in this package (grasp-MPC solve, the GraspEnv
phase machine) compile in minutes on a TPU reached through a network
tunnel; the persistent cache turns every repeat run — test re-runs,
bench re-runs, the driver's end-of-round benchmark — into a sub-second
cache hit. Verified working on the axon TPU backend (485 s MPC compile
-> seconds on re-run).

TPU-ONLY by design: XLA:CPU serializes AOT executables specialized to
the build host's CPU features, and reloading (or even re-serializing)
them on a machine with a different feature set is unsound — observed
as "+prefer-no-scatter is not supported on the host machine ... could
lead to execution errors such as SIGILL" warnings and a reproducible
SIGSEGV inside `put_executable_and_time` mid-test-suite when the CI
host rotated. CPU compiles here are seconds, not minutes; the cache
only ever paid for itself on the TPU path.

Call `enable_compile_cache()` before the first jit. Safe to call more
than once; a failure (read-only FS, unsupported backend) degrades to a
warning instead of breaking the program.
"""

from __future__ import annotations

import os
import sys

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    try:
        if jax.default_backend() == "cpu":
            return  # see module docstring: CPU executable caching is unsound
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
        # cache everything that takes >=1s to compile, regardless of size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - defensive
        print(f"compile cache disabled: {e}", file=sys.stderr)
