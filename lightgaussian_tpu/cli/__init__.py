"""CLI drivers mirroring the reference entry points (SURVEY.md §2.2).

Importing this package enables JAX's persistent compilation cache: training
recompiles on capacity growth (instance buffer / Gaussian slots), and on a
remote-compile setup each such compile costs tens of seconds — cached, a
repeat run (or the same capacity reached again) loads instantly. Opt out or
relocate with $JAX_COMPILATION_CACHE_DIR (empty string disables).
"""
import os as _os

import jax as _jax

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.jax_compile_cache")
)
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
