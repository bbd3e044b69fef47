"""Component-cost decomposition of bench c5/c9 on the real TPU.

Runs the cached 10M-doc bench index; for each agg-subtree subset of the
config, measures the sustained msearch-stream per-query time (the bench
metric), isolating which node costs what. Run from /root/repo:
    python scripts/profile_c5.py [c5|c9] [subset ...]
"""
import sys
import time

sys.path.insert(0, ".")  # cwd import only; PYTHONPATH stays unset


def main():
    import tantivy_aggregations_tpu as tat
    from tantivy_aggregations_tpu.models import flagship
    from tantivy_aggregations_tpu.engine_config import EngineConfig

    which = sys.argv[1] if len(sys.argv) > 1 else "c5"
    import jax
    jax.config.update("jax_compilation_cache_dir", ".bench_cache/jaxcache")
    idx = tat.Index.open(".bench_cache/idx_10000000_4_42")
    cfg = EngineConfig(msearch_dedup=False)
    s = idx.searcher(config=cfg)

    if which == "c5":
        _, _, aggs = flagship.judged_configs()[4]
        cfg_i = 5
    else:
        _, _, _, aggs = [e for e in flagship.extra_configs() if e[0] == 9][0]
        cfg_i = 9

    names = sys.argv[2:] or None
    subsets = ([{k: aggs[k] for k in names}] if names else
               [{k: v} for k, v in aggs.items()] + [aggs])
    B = 256
    for sub in subsets:
        reqs = [(q, sub) for q, _ in flagship.varied_requests(cfg_i, sub, B)]
        list(s.agg_search_stream(iter(reqs), lookahead=6))  # warm
        t0 = time.time()
        list(s.agg_search_stream(iter(reqs), lookahead=6))
        dt = (time.time() - t0) / B * 1e3
        print(f"{which} subset={sorted(sub)}: {dt:.3f} ms/q", flush=True)


if __name__ == "__main__":
    main()
