"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective code is
validated on `--xla_force_host_platform_device_count=8` CPU devices, exactly
as the driver's `dryrun_multichip` does. Set CSLAM_TPU_TEST_PLATFORM=tpu to
run the numeric tests on a real chip instead.

Note: the axon sitecustomize imports jax at interpreter startup, so the env
vars alone are not enough — we also flip jax_platforms via the config API
(safe because no backend has been initialized yet when conftest loads).
"""
import os

_platform = os.environ.get("CSLAM_TPU_TEST_PLATFORM", "cpu")

if _platform == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite accumulates hundreds of compiled XLA programs in one
    process; past ~120 tests the XLA CPU compiler segfaulted inside
    backend_compile_and_load while compiling the distributed solve in
    test_runtime.py (reproduced twice at the same spot; every subset probe
    — the test alone, its file alone, either alphabetical half of the
    preceding files + the file — passes). Dropping the jit caches at
    module boundaries bounds the accumulated client state; shapes rarely
    repeat across modules, so the recompile cost is small.
    """
    yield
    import jax
    jax.clear_caches()
