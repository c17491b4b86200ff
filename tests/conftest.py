"""Test config: run on CPU with 8 virtual devices (multi-chip sharding tests use
a host-only mesh; Pallas kernels run in interpret mode). The axon-TPU escape
hatch lives in lg_tpu_boot.py (loaded via pytest.ini) — it re-execs pytest with
a clean CPU env before pytest's capture plugin starts."""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
