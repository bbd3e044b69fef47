"""Replica-group serving: the Elasticsearch replica-shard analog.

SURVEY.md §2.3's multi-node row covers LATENCY scaling (the doc axis
sharded over a mesh's 'd' axis with psum'd fruit merges — parallel/
shard.py). This module adds the orthogonal THROUGHPUT axis: R independent
device groups, each holding a FULL copy of the resident index (each group
may itself be a 'd'-sharded mesh), with a serving stream that round-robins
msearch groups across replicas. Dispatches are asynchronous, so the R
groups' device work overlaps; results are collected in request order and
are bit-identical regardless of R — every replica runs the same exact
integer programs over the same columns.

This is deliberately NOT a second mesh axis inside one shard_map: queries
assigned to different replicas share no collectives and no intermediate
state, so coupling them into one program would only serialize their
dispatch. Independent meshes also map directly onto multi-host pods
(replica = host group; no DCN traffic on the serving path at all).
"""

from __future__ import annotations

from typing import Optional

import jax

from .shard import make_mesh


class ReplicatedSearcher:
    """R Searchers over disjoint device groups + round-robin msearch.

    devices are split into `replicas` equal contiguous groups; each group
    becomes one 'd'-sharded mesh (a 1-device group is a 1-shard mesh).
    The single-query API serves from rotating replicas; the batch/stream
    APIs split work at msearch-group granularity so every replica's
    pipeline stays full.
    """

    def __init__(self, index, replicas: int = 2, devices=None, config=None):
        if devices is None:
            devices = jax.devices()
        if replicas < 1 or len(devices) % replicas:
            raise ValueError(
                f"{len(devices)} devices do not split into "
                f"{replicas} equal replica groups")
        per = len(devices) // replicas
        self.index = index
        self.searchers = [
            index.searcher(mesh=make_mesh(devices=devices[r * per:
                                                          (r + 1) * per]),
                           config=config)
            for r in range(replicas)
        ]
        self._rr = 0

    @property
    def replicas(self) -> int:
        return len(self.searchers)

    def agg_search(self, query, aggs):
        s = self.searchers[self._rr]
        self._rr = (self._rr + 1) % len(self.searchers)
        return s.agg_search(query, aggs)

    def _chunks(self, requests):
        cap = self.searchers[0].config.max_batch
        reqs = list(requests)
        return [reqs[i:i + cap] for i in range(0, len(reqs), cap)]

    def agg_search_batch(self, requests) -> list:
        """msearch across all replicas: chunk j dispatches on replica
        j % R (async), results collect in request order while later
        chunks execute on the other replicas."""
        sub = []
        for j, chunk in enumerate(self._chunks(requests)):
            s = self.searchers[j % len(self.searchers)]
            sub.append((s, s._submit_batch(chunk)))
        out = []
        for s, groups in sub:
            for g in groups:
                out.extend(s._collect_group(g))
        return out

    def agg_search_stream(self, requests, lookahead: int = 2):
        """Sustained-serving generator: keeps `lookahead` chunks in flight
        PER REPLICA, yielding results in request order."""
        from collections import deque
        it = iter(requests)
        cap = self.searchers[0].config.max_batch
        R = len(self.searchers)
        pending = deque()  # (searcher, submitted groups)
        nxt = 0

        def next_chunk():
            nonlocal nxt
            chunk = []
            for _ in range(cap):
                try:
                    chunk.append(next(it))
                except StopIteration:
                    break
            if not chunk:
                return False
            s = self.searchers[nxt % R]
            nxt += 1
            pending.append((s, s._submit_batch(chunk)))
            return True

        for _ in range(lookahead * R):
            if not next_chunk():
                break
        while pending:
            s, groups = pending.popleft()
            next_chunk()
            for g in groups:
                yield from s._collect_group(g)
