"""Test configuration: run JAX on the CPU backend with 8 virtual devices.

The build environment has exactly one physical TPU chip, so tests exercise
the sharded/multi-chip code paths on a virtual 8-device CPU mesh (SURVEY.md
§4.4). The engine's device programs are backend-agnostic: they use exact
integer arithmetic, so CPU-run tests are faithful to TPU behavior.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets the TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
