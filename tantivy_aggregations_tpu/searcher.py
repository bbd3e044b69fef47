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

    def agg_search(self, query: query_ir.Query,
                   aggs: Dict[str, agg_ir.Agg]) -> Dict[str, dict]:
        """Run `aggs` over docs matching `query`; returns host-side fruits
        bit-identical to OracleSearcher.agg_search on the same index."""
        from .aggs.compile import get_program
        dindex = self._get_device_index()
        key = (query_ir.structural_key(query), agg_ir.structural_key(aggs))
        prog = self._programs.get(key)
        if prog is None:
            prog = get_program(dindex, query, aggs)
            self._programs[key] = prog
        return prog.run(query, aggs)
