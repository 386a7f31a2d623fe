"""Host-side utilities."""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

_cache_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    On this TPU environment XLA programs compile remotely (minutes for the
    fused pipeline); the on-disk cache brings warm starts down to seconds.
    Called by ChessVision, the trainers, and bench.py.
    """
    global _cache_enabled
    if _cache_enabled:
        return
    import jax

    path = cache_dir or os.getenv(
        "CVTPU_JAX_CACHE", str(Path.home() / ".cache" / "chessvision_tpu" / "jax")
    )
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _cache_enabled = True
    logger.info("JAX compilation cache at %s", path)


def setup_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    """Mirror of the reference's scripts/utils.py:4-11."""
    log = logging.getLogger(name)
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        log.addHandler(handler)
    log.setLevel(level)
    return log
