"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device tests run on CPU with XLA's host-platform device-count override —
the JAX-native "fake backend" for exercising meshes/collectives without a pod
(SURVEY.md §4). The axon TPU plugin (when present) forces
``jax_platforms="axon,cpu"`` programmatically at interpreter start, so the
env var alone is not enough — we must override the config value too, before
any backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
