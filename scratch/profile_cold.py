"""Profile the bench cold start: where do the first-call seconds go?

Run from /root/repo:  timeout 900 python scratch/profile_cold.py [--clear-jax]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # safe: this is a TPU script run with cwd import
os.chdir(REPO)
CACHE = os.path.join(REPO, ".bench_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t = {}
t0 = time.time()


def lap(name):
    global t0
    t[name] = round(time.time() - t0, 2)
    print(f"[prof] {name}: {t[name]}s", file=sys.stderr, flush=True)
    t0 = time.time()


from tantivy_aggregations_tpu import Index  # noqa: E402
from tantivy_aggregations_tpu.models import flagship  # noqa: E402

lap("imports")
idx = Index.open(os.path.join(CACHE, "idx_10000000_4_42"))
lap("Index.open")

from tantivy_aggregations_tpu.index.loader import load_device_index  # noqa: E402
import cProfile, pstats  # noqa: E402

pr = cProfile.Profile()
pr.enable()
dindex = load_device_index(idx)
pr.disable()
lap("load_device_index")
st = pstats.Stats(pr, stream=sys.stderr)
st.sort_stats("cumulative").print_stats(25)

searcher = idx.searcher()
searcher._device_index = dindex
searcher._device_epoch = idx.epoch

for i, (name, query, aggs) in enumerate(flagship.judged_configs(), start=1):
    pr = cProfile.Profile()
    pr.enable()
    r = searcher.agg_search(query, aggs)
    pr.disable()
    lap(f"c{i} first call")
    if t[f"c{i} first call"] > 15:
        st = pstats.Stats(pr, stream=sys.stderr)
        st.sort_stats("cumulative").print_stats(20)
for i, name, query, aggs in flagship.extra_configs():
    pr = cProfile.Profile()
    pr.enable()
    r = searcher.agg_search(query, aggs)
    pr.disable()
    lap(f"c{i} first call")
    if t[f"c{i} first call"] > 15:
        st = pstats.Stats(pr, stream=sys.stderr)
        st.sort_stats("cumulative").print_stats(20)

print(json.dumps(t))
