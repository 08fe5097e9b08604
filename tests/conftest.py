"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4): all
multi-device behavior (data-parallel psum, sync-BN pmean, eval gather) is
exercised without TPU hardware.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (remote TPU via
# tunnel), which must never be used for the test suite — single-chip, high
# latency, and shared with the bench runner.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
