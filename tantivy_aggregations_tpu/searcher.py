"""Searcher: the engine's `agg_search` entry point (SURVEY.md §2.1 C1/C3).

Reference analog: `AggSearcher::agg_search(query, agg)` — prepare the agg
tree against the schema, drive per-segment collection, merge fruits. Here:
load the index's columns to device HBM once (cached per index epoch),
compile the (query shape, agg tree shape) pair to one fused jitted program
(cached), execute, and harvest host-side fruits.
"""

from __future__ import annotations

from typing import Dict, Optional

from .aggs import ir as agg_ir
from .query import ir as query_ir


class Searcher:
    def __init__(self, index, mesh=None):
        self.index = index
        self.schema = index.schema
        self._mesh = mesh
        self._device_index = None
        self._device_epoch = None
        self._programs = {}

    # -- device index ----------------------------------------------------------

    def _get_device_index(self):
        from .index.loader import load_device_index
        if self._device_index is None or self._device_epoch != self.index.epoch:
            self._device_index = load_device_index(self.index, mesh=self._mesh)
            self._device_epoch = self.index.epoch
            self._programs.clear()
        return self._device_index

    # -- entry point -----------------------------------------------------------

    def _program_for(self, query, aggs):
        from .aggs.compile import get_program
        dindex = self._get_device_index()
        key = (query_ir.structural_key(query), agg_ir.structural_key(aggs))
        prog = self._programs.get(key)
        if prog is None:
            prog = get_program(dindex, query, aggs)
            self._programs[key] = prog
        return prog

    def agg_search(self, query: query_ir.Query,
                   aggs: Dict[str, agg_ir.Agg]) -> Dict[str, dict]:
        """Run `aggs` over docs matching `query`; returns host-side fruits
        bit-identical to OracleSearcher.agg_search on the same index."""
        return self._program_for(query, aggs).run(query, aggs)

    def agg_search_batch(self, requests) -> list:
        """Pipelined execution of [(query, aggs), ...]: all device programs
        are dispatched asynchronously before any result is fetched, hiding
        per-call dispatch latency (the serving-throughput pattern; the
        reference is strictly synchronous per query, SURVEY.md §3.1)."""
        import jax
        submitted = []
        for query, aggs in requests:
            prog = self._program_for(query, aggs)
            submitted.append((prog, prog.submit(query, aggs), aggs))
        # ONE device->host transfer for all queries' small fruits, then one
        # more for all percentile rank gathers (instead of 1-2 round-trips
        # per query — the transfer link dominates small-result latency)
        strippeds = []
        for prog, raw, aggs in submitted:
            strippeds.append(prog.fetch_strip(aggs, raw))
        hosts = jax.device_get([s for s, _ in strippeds])
        all_gathers = []
        for (prog, raw, aggs), host, (_, big) in zip(submitted, hosts,
                                                     strippeds):
            all_gathers.append(prog.percentile_gathers(host, big))
        if any(all_gathers):
            got = jax.device_get(all_gathers)
            for (prog, raw, aggs), host, g in zip(submitted, hosts, got):
                prog.attach_percentiles(host, g)
        return [prog.harvest_host(host, aggs)
                for (prog, raw, aggs), host in zip(submitted, hosts)]
