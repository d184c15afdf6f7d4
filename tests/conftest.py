import os
import sys

# Make the repo root importable without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tests exercise sharding on a virtual multi-device CPU mesh; numerics tests
# need float64.  The ambient environment pins JAX_PLATFORMS=axon (a tunneled
# TPU with slow first compiles), so tests hard-override to CPU; benchmarks
# (bench.py) run on the real chip instead.
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
if os.environ.get("GT4PY_TPU_TEST_PLATFORM", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The ambient axon sitecustomize registers the tunneled-TPU PJRT plugin
    # before conftest runs; the env var alone no longer wins.  Force the
    # platform through the config API (backends initialize lazily, so this
    # is still early enough).
    import jax

    jax.config.update("jax_platforms", "cpu")
