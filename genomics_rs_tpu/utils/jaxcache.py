"""Persistent XLA compilation cache.

First Mosaic/XLA compiles take minutes through this environment's
remote-compile tunnel; the persistent cache makes every CLI/bench
invocation after the first start hot. Call before the first jit
execution (idempotent)."""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def enable_persistent_cache() -> None:
    import jax

    # Restore standard env semantics: the axon sitecustomize pins
    # jax_platforms via jax.config, which silently overrides the
    # JAX_PLATFORMS env var — re-assert the user's choice.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception as e:  # noqa: BLE001
            log.debug("could not set jax_platforms=%s: %s", plat, e)

    cache_dir = os.environ.get(
        "GENOMICS_TPU_JAX_CACHE",
        os.path.expanduser("~/.cache/genomics_rs_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", -1
        )
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        log.debug("persistent compilation cache unavailable: %s", e)
