"""Test harness: force JAX onto a simulated 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session
(SURVEY.md §5.4): kernels run with ``interpret``-friendly CPU lowering and
dist/ tests get 8 fake devices for Mesh/shard_map collectives.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's sitecustomize pre-imports jax and registers the TPU PJRT
# plugin before this conftest runs, so the env var alone is too late; the
# config update below reliably pins the test session to the simulated CPU
# mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    """Keep the process under the kernel's mmap-region limit.

    Every compiled XLA:CPU executable holds JIT code pages in their own
    mmap regions, and the full suite compiles thousands of distinct
    shapes; past ``vm.max_map_count`` (65530 default) further mmaps fail
    and LLVM segfaults mid-compile (observed: nondeterministic
    ``Fatal Python error: Segmentation fault`` in
    ``backend_compile_and_load`` ~75% into the suite).  Clearing JAX's
    executable caches releases the regions (verified: 1719 -> 532 maps),
    at the cost of recompiles in later tests.
    """
    yield
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 40_000:
        jax.clear_caches()
