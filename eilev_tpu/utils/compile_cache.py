"""Persistent XLA compilation cache for cold-start latency.

The flagship serving programs (768-token prefill + 32-step decode over the
2.7B model) take ~20-40 s to compile on the first call of a process — the
dominant cost of restarting a serving replica or running a short eval
shard. The reference has no equivalent concern (torch eager), but any
production TPU deployment restarts processes constantly (preemption,
autoscaling, config rollouts). JAX's persistent compilation cache writes
each compiled executable to a directory keyed by (HLO, compile options,
runtime version); later processes deserialize instead of recompiling.

Enable per process::

    from eilev_tpu.utils import enable_compilation_cache
    enable_compilation_cache("~/.cache/eilev_tpu/xla")

or set ``EILEV_COMPILATION_CACHE=<dir>`` — every CLI under ``scripts/``,
``demo/`` and ``samples/`` calls :func:`maybe_enable_compilation_cache` at
startup (``--compilation_cache`` on the serving CLIs overrides the env).

The directory is safe to share between processes and survives restarts; it
is keyed by program, so unrelated models coexist. Stale entries are evicted
by XLA's own fingerprinting (a runtime upgrade simply misses and recompiles).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def enable_compilation_cache(
    path: str, *, min_compile_time_secs: float = 1.0
) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if needed).

    ``min_compile_time_secs`` skips persisting trivial programs (host-side
    glue like device_put reshapes) so the cache holds only the executables
    worth deserializing; pass 0.0 to persist everything (tests do).

    Must run before the first ``jit`` call whose compilation should be
    cached — config flags are read at compile time, so programs compiled
    earlier in the process are unaffected.
    """
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_time_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def maybe_enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Enable the cache from ``path`` or ``$EILEV_COMPILATION_CACHE``; no-op
    (returns None) when neither is set."""
    path = path or os.environ.get("EILEV_COMPILATION_CACHE")
    if not path:
        return None
    return enable_compilation_cache(path)
