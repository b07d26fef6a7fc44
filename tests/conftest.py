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
