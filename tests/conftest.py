"""Test harness: force JAX onto CPU with 8 virtual devices so the multi-chip
sharding paths (mesh, pjit, collectives) are exercised without TPU hardware —
the strategy SURVEY.md §4 prescribes for the rebuild."""

import os

# VIMO_TPU_TESTS=1 leaves the platform alone (real chip) so the
# hardware-only suite (tests/test_pallas_tpu.py, via `make tpu-test`) can
# run compiled Mosaic kernels; everything backend-gated the other way
# (mesh8 users) skips there.
_ON_TPU = os.environ.get("VIMO_TPU_TESTS") == "1"

if not _ON_TPU:
    # Must run before jax initializes its backends. The image pins
    # jax_platforms to the tunneled TPU ("axon") at the config level, so
    # setting the env var alone is not enough — update the config after
    # import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    if len(devs) != 8:
        # e.g. the whole suite run on the real chip (VIMO_TPU_TESTS=1):
        # mesh-dependent tests skip rather than error
        pytest.skip(f"needs 8 virtual CPU devices, got {len(devs)}")
    return devs


@pytest.fixture(scope="session")
def mesh8(devices):
    from vimoclip_tpu.parallel import MeshConfig, create_mesh

    return create_mesh(MeshConfig(data_parallel=4, model_parallel=2))
