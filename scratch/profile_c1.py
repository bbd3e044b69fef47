"""Decompose c1's (MatchAll count+sum) 10M-doc stream cost on the real TPU.

Times, per 64-query msearch batch:
  - the full submit_many + finalize path (what bench.py measures),
  - the raw vmapped device fn (blocking), isolating device compute,
  - a single-query submit (blocking) for the unbatched floor,
  - hand-rolled variants of the metric reduction to find the gap vs roofline.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
import numpy as np

from tantivy_aggregations_tpu import Index
from tantivy_aggregations_tpu.models import flagship

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
idx = Index.open(os.path.join(CACHE, "idx_10000000_4_42"))
print("devices:", jax.devices(), file=sys.stderr)

searcher = idx.searcher()
name, query, aggs = flagship.judged_configs()[0]
r = searcher.agg_search(query, aggs)  # compile
B = searcher.config.max_batch
print("max_batch:", B, file=sys.stderr)

prog = searcher._program_for(query, aggs)
reqs = [(query, aggs)] * B

def t(fn, n=12):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


# full stream path (amortized, as bench does)
def full():
    list(searcher.agg_search_stream(iter(reqs * 6), lookahead=6))
ms = t(full, 4)
print(f"stream 6x{B}: {ms:.1f}ms total, {ms/(6*B)*1000:.0f}us/q")

# submit_many alone (async dispatch + block)
stacked_run = None
def submit_block():
    raw = prog.submit_many([query] * B, aggs, pad_to=B)
    jax.block_until_ready(raw)
print(f"submit_many({B}) blocked: {t(submit_block):.2f}ms")

def submit1():
    raw = prog.submit(query, aggs)
    jax.block_until_ready(raw)
print(f"submit(1) blocked: {t(submit1):.2f}ms")

# raw column reduction floors
arrays = prog._arrays if hasattr(prog, "_arrays") else None
col = None
for k, v in (arrays.items() if arrays else []):
    if k.startswith("amount"):
        print("  array:", k, getattr(v, "shape", None), getattr(v, "dtype", None), file=sys.stderr)

w = arrays.get("amount:w")
if w is None:
    for k in arrays:
        print(k, file=sys.stderr)
else:
    Tn = w.shape[0]
    print(f"amount:w shape {w.shape} dtype {w.dtype}; bytes {w.size*4/1e6:.0f}MB")
    f_sum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    print(f"plain i32 sum over T: {t(lambda: jax.block_until_ready(f_sum(w))):.2f}ms")
    from tantivy_aggregations_tpu.ops import pallas_kernels as PK
    mask = jnp.ones((Tn,), dtype=jnp.int8)
    f_fm = jax.jit(lambda m, p: PK.fused_metrics(m, p, max_abs=2**25))
    print(f"fused_metrics 1q: {t(lambda: jax.block_until_ready(f_fm(mask, w))):.2f}ms")
    # vmapped over B identical masks — what submit_many effectively does
    masks = jnp.ones((B, Tn), dtype=jnp.int8)
    f_fmB = jax.jit(jax.vmap(lambda m: PK.fused_metrics(m, w, max_abs=2**25)))
    print(f"fused_metrics vmap B={B}: {t(lambda: jax.block_until_ready(f_fmB(masks))):.2f}ms")
