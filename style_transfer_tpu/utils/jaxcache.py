"""Persistent XLA compilation cache setup.

Per-scale image shapes mean one fresh XLA program per pyramid level; on a
real TPU each compile is tens of seconds. The persistent cache makes every
run after the first start instantly, which is what keeps the end-to-end
wall-clock targets honest.
"""

import os
from pathlib import Path

_DEFAULT = Path("~/.cache/style_transfer_tpu/xla_cache").expanduser()
_enabled = False


def enable_persistent_cache(path=None):
    global _enabled
    if _enabled:
        return
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return
    if platform != "tpu":
        # CPU AOT executables are host-feature specific; caching them across
        # machines produces noisy loader errors for no win.
        return

    cache_dir = Path(path or os.environ.get("STT_XLA_CACHE", _DEFAULT))
    try:
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _enabled = True
    except Exception:
        pass  # cache is an optimization; never fail a run over it
