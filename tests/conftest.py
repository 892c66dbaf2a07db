"""Test harness: force JAX onto a simulated 8-device CPU mesh.

Must run before the first ``import jax`` anywhere in the test session
(SURVEY.md §5.4): kernels run with ``interpret``-friendly CPU lowering and
dist/ tests get 8 fake devices for Mesh/shard_map collectives.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
