"""Early pytest boot plugin (loaded via `-p lg_tpu_boot` in pytest.ini).

This box routes every Python interpreter through an axon/TPU PJRT plugin via
sitecustomize, which claims the single TPU tunnel (serializing against any
other JAX process) and reroutes XLA compilation through a remote-compile
service — making CPU-only test runs ~10x slower and racy. Registration can
only be skipped at interpreter startup, so re-exec pytest once with a cleaned
CPU-only environment. This module is imported during plugin registration,
*before* pytest's capture plugin swaps fd 1/2, so output survives the exec.
"""
import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_LG_TPU_TEST_REEXEC"):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    env["_LG_TPU_TEST_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)
