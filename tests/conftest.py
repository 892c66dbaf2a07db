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
