"""Runtime setup helpers (compilation cache, profiling traces).

SURVEY.md §5.1/§7 hard-part 5: per-bucket static shapes mean one XLA compile
per bucket; long-scan programs take minutes to compile on TPU, so the
persistent compilation cache is enabled by every entry point (train CLI,
bench, graft entry) — warm restarts then reuse every bucket's program.
"""

from __future__ import annotations

import os


def respect_jax_platforms() -> None:
    """Make an explicit ``JAX_PLATFORMS`` env var win over config pins.

    Some deployment images register an out-of-process TPU plugin from
    ``sitecustomize`` and pin ``jax.config.jax_platforms`` there — a config
    pin silently overrides the user's env var, so ``JAX_PLATFORMS=cpu
    train ...`` would still dial the TPU (and hang if its relay is down).
    Every CLI entry point calls this before first backend use so the
    documented env contract holds. No-op when the var is unset."""
    env = os.environ.get("JAX_PLATFORMS")
    if env:
        import jax

        cur = jax.config.jax_platforms or ""
        # only act when the *selected* (first) platform differs — e.g. a
        # pin of "axon,cpu" already honors JAX_PLATFORMS=axon, and keeping
        # the cpu fallback in the list costs nothing.
        if cur.split(",")[0] != env.split(",")[0]:
            jax.config.update("jax_platforms", env)


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    respect_jax_platforms()
    if jax.default_backend() == "cpu":
        # XLA:CPU AOT cache entries embed host-feature pseudo-flags that the
        # loader mis-compares across processes ("prefer-no-scatter ... could
        # lead to SIGILL" error spam); CPU compiles are fast anyway.
        return
    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/csr_tpu_xla_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def profile_trace(log_dir: str):
    """Context manager: jax.profiler trace around a training window
    (SURVEY.md §5.1 — tracing/profiling subsystem)."""
    import jax

    return jax.profiler.trace(log_dir, create_perfetto_trace=True)
