import os, sys, time, cProfile, pstats
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from tantivy_aggregations_tpu import Index
from tantivy_aggregations_tpu.models import flagship

idx = Index.open(os.path.join(CACHE, "idx_10000000_4_42"))
searcher = idx.searcher()
B = searcher.config.max_batch
cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 1
name, query, aggs = flagship.judged_configs()[cfg - 1]
searcher.agg_search(query, aggs)
prog = searcher._program_for(query, aggs)
raw = prog.submit_many([query] * B, aggs, pad_to=B)
staged = prog.stage(raw, aggs)
jax.block_until_ready(raw)
for _ in range(2):
    prog.finalize_many(raw, aggs, B, staged=staged)
t0 = time.perf_counter()
for _ in range(8):
    prog.finalize_many(raw, aggs, B, staged=staged)
dt = (time.perf_counter() - t0) / 8
print(f"c{cfg} finalize_many({B}): {dt*1000:.2f}ms = {dt/B*1e6:.0f}us/q")
pr = cProfile.Profile()
pr.enable()
for _ in range(8):
    prog.finalize_many(raw, aggs, B, staged=staged)
pr.disable()
pstats.Stats(pr).sort_stats("tottime").print_stats(14)
