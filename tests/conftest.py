"""Test configuration: run JAX on the CPU backend with 8 virtual devices.

The build environment has exactly one physical TPU chip, so tests exercise
the sharded/multi-chip code paths on a virtual 8-device CPU mesh (SURVEY.md
§4.4). The engine's device programs are backend-agnostic: they use exact
integer arithmetic, so CPU-run tests are faithful to TPU behavior.

Note: this environment's axon plugin force-sets the jax_platforms config at
import (env vars alone don't stick), so we import jax here — before any test
module — and override the config explicitly.
"""

import os

#: TAT_TPU_TESTS=1 switches to the real-TPU lane: the backend is left alone
#: (axon TPU on this box) and only tests marked @pytest.mark.tpu should be
#: selected (`TAT_TPU_TESTS=1 python -m pytest tests -m tpu`). The default
#: lane runs everything on a virtual 8-device CPU mesh.
TPU_LANE = os.environ.get("TAT_TPU_TESTS") == "1"

if not TPU_LANE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8
