"""CLI drivers mirroring the reference entry points (SURVEY.md §2.2).

Each driver's ``main()`` calls :func:`common.enable_compile_cache` explicitly;
importing this package has no side effects on global JAX config, so library
consumers (``from lightgaussian_tpu.cli import common``) see untouched state.
"""
