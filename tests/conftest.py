"""Test harness setup.

The test environment boots python with an `axon` TPU PJRT plugin registered
from sitecustomize and `JAX_PLATFORMS=axon` pinned, which (a) grabs the
single real TPU chip and (b) cannot be switched to CPU after interpreter
start. Tests need a *virtual 8-device CPU mesh* (deterministic fp32 numerics
+ multi-device sharding tests without hardware), so `pytest_configure`
re-launches pytest once in a cleaned environment before any test imports
jax. Capture is suspended around the child so its output flows through.
"""

import os
import subprocess
import sys

_MARK = "_NLT_CPU_REEXEC"


def pytest_configure(config):
    if os.environ.get(_MARK) == "1":
        # Child: make numerics deterministic / torch-comparable.
        import jax

        jax.config.update("jax_default_matmul_precision", "highest")
        return
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    env[_MARK] = "1"
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    ret = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:], env=env)
    os._exit(ret)
