"""Persistent XLA compilation cache.

First compile of the full model through the TPU tunnel costs minutes;
the persistent cache brings warm starts down dramatically.  Called by every
CLI entry point; safe to call multiple times."""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = os.path.expanduser("~/.cache/imagined_speech_translation_tpu/xla")


def enable_persistent_cache(directory: str | None = None) -> str:
    import jax

    directory = directory or os.environ.get("IST_COMPILE_CACHE", _DEFAULT)
    Path(directory).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    return directory
