"""EngineConfig: the engine's (deliberately small) tuning surface.

The reference has no flag system — everything is typed constructor
arguments (SURVEY.md §5); this engine keeps that posture and exposes only
the hardware-mapping knobs that plan-time mode selection uses."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class EngineConfig:
    #: blocked one-hot bucket budget: bucket aggs with a flat slot space up
    #: to this size use compare-reduce; larger use prefix/scatter paths
    dense_nb: int = 256
    #: collect per-query QueryStats on the searcher (last_stats)
    collect_stats: bool = False
    #: msearch group cap: same-shape queries per vmapped dispatch; multiple
    #: groups pipeline (device->host copies overlap later groups' compute).
    #: 64 measured best on the v5e: the device link's fixed per-round-trip
    #: cost (~8ms sync through the axon tunnel) amortizes over the group
    #: while compute per group stays < 1ms
    max_batch: int = 64
    #: fused Pallas metric kernels on the TPU backend (unsharded programs)
    use_pallas: bool = True
    #: run Pallas kernels in interpreter mode (CPU testing of kernel paths)
    pallas_interpret: bool = False

    def validate(self) -> "EngineConfig":
        if self.dense_nb < 1:
            raise ValueError("dense_nb must be >= 1")
        if self.max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        return self
