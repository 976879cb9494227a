"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver separately dry-runs the
multi-chip path; real-TPU benchmarking happens in bench.py).

Note: this image's sitecustomize registers the TPU plugin and pins
``jax_platforms`` at interpreter startup, so the env var alone is not
enough — we override the config after import, before any backend init.
"""

import os

# RAY_TPU_GOLDEN=1 runs the golden-image parity battery on the real
# device (scripts/run_golden_tests.sh); RAY_TPU_HW=1 likewise for the
# hardware kernel tests (tests/test_traverse_pallas.py, run by bench.py
# --tpu-tests) — everything else pins CPU
_golden = (os.environ.get("RAY_TPU_GOLDEN", "") == "1"
           or os.environ.get("RAY_TPU_HW", "") == "1")

flags = os.environ.get("XLA_FLAGS", "")
if not _golden and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _golden:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

if not _golden:
    assert len(jax.devices()) == 8, jax.devices()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The monolithic suite used to segfault deep into the session (XLA
    CPU after hundreds of live compiled executables in one process,
    round-2/3 carry-over).  Dropping compiled-function caches at module
    boundaries bounds the live-executable count; each module mostly
    compiles its own scenes, so the recompile cost is small."""
    yield
    import jax

    jax.clear_caches()
