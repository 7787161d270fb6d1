"""Persistent XLA compilation cache.

Over the remote-TPU tunnel a big graph compiles in 30-90s; bench.py has
four of them. Enabling JAX's on-disk executable cache makes every rerun of
the same graph (same jax version, flags, topology) near-instant, which
keeps benchmark scripts inside their time budget. Safe no-op where the
backend doesn't support serialization (JAX logs and skips).
"""
from __future__ import annotations

import hashlib
import os
import platform

__all__ = ["enable_compilation_cache"]


def _machine_tag() -> str:
    """A fingerprint of the host CPU's ISA features.

    XLA:CPU cache entries are AOT-compiled machine code; an entry built on
    a host with (say) AMX/prefer-no-scatter aborts or SIGILLs when loaded
    on a host without them — observed when a cache directory survives
    across heterogeneous machines. Keying the cache dir by the feature set
    makes each machine population disjoint. TPU executables are keyed by
    topology inside XLA already, but they live in the same directory, so
    they are partitioned along with it (worst case: a recompile)."""
    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats += " " + " ".join(sorted(line.split()[2:]))
                    break
    except OSError:
        pass
    return hashlib.sha1(feats.encode()).hexdigest()[:10]


def _default_dir() -> str:
    # In a source checkout (repo root has .git and is writable) keep the
    # cache next to the code so it's shared across venvs; for installed
    # packages (possibly read-only site-packages) use the user cache dir.
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(repo, ".git")) and os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache", "bnn_tpu",
                        "jax_cache")


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on the persistent compilation cache (idempotent).

    Call before the first ``jit`` compilation. Returns the cache dir
    ("" on the CPU backend: the cache exists for the 30-90s remote-TPU
    compiles; XLA:CPU entries are AOT machine code whose loads emit
    machine-feature warnings at best and SIGILL/abort across machines at
    worst, while local CPU compiles are cheap anyway).
    """
    import jax

    if jax.default_backend() == "cpu":
        return ""
    path = path or os.environ.get("BNN_TPU_JAX_CACHE") or _default_dir()
    # machine-key EVERY cache dir, not just the default: a shared
    # (env-var/NFS) directory across heterogeneous machines hits the same
    # XLA:CPU AOT abort the fingerprint exists to prevent
    path = os.path.join(path, _machine_tag())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes meaningful time; tiny graphs stay uncached
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
