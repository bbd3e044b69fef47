"""c5 device-side decomposition: which eval stage dominates the vmapped
batch? Times jitted sub-programs built from the same arrays."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bench_cache")
jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE, "jaxcache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from tantivy_aggregations_tpu import Index
from tantivy_aggregations_tpu.models import flagship
from tantivy_aggregations_tpu.ops import reductions as R

idx = Index.open(os.path.join(CACHE, "idx_10000000_4_42"))
searcher = idx.searcher()
B = searcher.config.max_batch
name, query, aggs = flagship.judged_configs()[4]
searcher.agg_search(query, aggs)
prog = searcher._program_for(query, aggs)
arrays = prog._arrays

def t(fn, *a, n=8):
    r = fn(*a); jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); r = fn(*a); jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000

# full vmapped submit
def full():
    return prog.submit_many([query] * B, aggs, pad_to=B)
print(f"full submit_many({B}): {t(full, n=4):.1f}ms")

# pieces over the value-layout permuted plane (percentiles rank path)
pfx = prog.plan[("a", "p")]["prefix"]
vm_plane = arrays[pfx + "lvalid"]
Rn = vm_plane.shape[0]
print("Rn:", Rn)
amount_w = arrays[pfx + "amount:w"] if pfx + "amount:w" in arrays else None
print("perm plane keys:", [k for k in arrays if k.startswith(pfx)][:8])

mask_b = jnp.ones((B, Rn), dtype=bool)

@jax.jit
def cum64_batch(mb):
    with jax.enable_x64(True):
        return jax.vmap(lambda m: jnp.cumsum(R.block32_counts(m).astype(jnp.int64)))(mb)

@jax.jit
def cum32_batch(mb):
    return jax.vmap(lambda m: jnp.cumsum(R.block32_counts(m)))(mb)

@jax.jit
def mask_only(mb):
    return jax.vmap(lambda m: R.block32_counts(m).sum())(mb)

print(f"vmapped block32+cumsum INT64 [B={B}, {Rn}]: {t(cum64_batch, mask_b):.1f}ms")
print(f"vmapped block32+cumsum INT32: {t(cum32_batch, mask_b):.1f}ms")
print(f"vmapped block32 only: {t(mask_only, mask_b):.1f}ms")

# mask eval cost: a range compare over the permuted plane, vmapped w/ params
w = arrays[pfx + "amount:w"]
los = jnp.arange(B, dtype=jnp.int32)

@jax.jit
def masks(los):
    return jax.vmap(lambda lo: (w >= lo) & (w <= 900000))(los)
print(f"vmapped range-mask over perm plane: {t(masks, los):.1f}ms")
