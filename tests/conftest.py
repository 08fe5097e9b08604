"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4): all
multi-device behavior (data-parallel psum, sync-BN pmean, eval gather) is
exercised without TPU hardware.
"""

import os

# Force CPU: the ambient environment registers the 'axon' remote-TPU plugin
# via sitecustomize and force-sets jax.config.jax_platforms="axon,cpu",
# overriding the env var — so pin the *config*, not just the env.  Tests must
# never ride the TPU tunnel (single chip, high latency, shared with bench).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
