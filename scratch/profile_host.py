"""Where does the per-query stream time go? Host-side decomposition."""
import os, sys, time, cProfile, pstats
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np
from tantivy_aggregations_tpu import Index
from tantivy_aggregations_tpu.models import flagship

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
idx = Index.open(os.path.join(CACHE, "idx_10000000_4_42"))
searcher = idx.searcher()
B = searcher.config.max_batch

for cfg in (1, 4, 5):
    name, query, aggs = flagship.judged_configs()[cfg - 1]
    searcher.agg_search(query, aggs)
    prog = searcher._program_for(query, aggs)
    queries = [query] * B

    t0 = time.perf_counter()
    for _ in range(4):
        raw = prog.submit_many(queries, aggs, pad_to=B)
    jax.block_until_ready(raw)
    sub = (time.perf_counter() - t0) / 4

    staged = prog.stage(raw, aggs)
    t0 = time.perf_counter()
    for _ in range(4):
        outs = prog.finalize_many(raw, aggs, B, staged=staged)
    fin = (time.perf_counter() - t0) / 4

    t0 = time.perf_counter()
    for _ in range(4):
        plist = []
        from tantivy_aggregations_tpu.query import compile as qc
        for q in queries:
            params = qc.extract_params(q, prog.dindex)
            prog._extract_filter_params(aggs, ("a",), params)
            plist.append(params)
        stacked = {k: np.stack([p[k] for p in plist]) for k in plist[0]}
    prep = (time.perf_counter() - t0) / 4

    print(f"c{cfg}: submit_many(64) {sub*1000:.2f}ms "
          f"({sub/B*1e6:.0f}us/q) | finalize_many {fin*1000:.2f}ms "
          f"({fin/B*1e6:.0f}us/q) | param prep {prep*1000:.2f}ms")

# profile the finalize path of c5 (heaviest)
name, query, aggs = flagship.judged_configs()[4]
prog = searcher._program_for(query, aggs)
raw = prog.submit_many([query] * B, aggs, pad_to=B)
staged = prog.stage(raw, aggs)
pr = cProfile.Profile()
pr.enable()
for _ in range(8):
    prog.finalize_many(raw, aggs, B, staged=staged)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(18)
