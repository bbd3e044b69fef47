"""Interpret-mode coverage of the fused chain-counts Pallas path
(ops/pallas_kernels.py chain_counts + the rank-percentile integration in
aggs/compile.py). The CPU suite can't lower Mosaic, so these run the kernel
under pallas interpret mode and assert bit-parity with the oracle; the
real-TPU lane (tests/test_tpu_parity.py) covers the compiled lowering.

Replaces nothing: the non-Pallas rank path keeps its own coverage via the
default-config tests (CPU backend plans pallas_counts=False)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tantivy_aggregations_tpu as tat
from tantivy_aggregations_tpu.engine_config import EngineConfig
from tantivy_aggregations_tpu.ops import pallas_kernels as PK

from fixtures import random_index


def test_chain_counts_kernel_unit():
    R = 32768 * 2
    rng = np.random.default_rng(0)
    w = rng.integers(0, 1000, R).astype(np.int32)
    av = (rng.random(R) < 0.9).astype(np.int8)

    def mask_of(vals, pv):
        return (vals["w"] >= pv[0]) & (vals["w"] <= pv[1]) & (vals["av"] > 0)

    cc = PK.make_chain_counts(mask_of, interpret=True)
    planes = {"w": jnp.asarray(PK.transpose_groups(w)),
              "av": jnp.asarray(PK.transpose_groups(av))}
    out = cc(jnp.asarray([100, 700], jnp.int32), planes)
    ref = ((w >= 100) & (w <= 700) & (av > 0)).reshape(-1, 128).sum(1)
    np.testing.assert_array_equal(np.asarray(out), ref)

    # the custom_vmap rule: one batched kernel call, planes unbatched
    pmat = jnp.asarray([[100, 700], [0, 50], [900, 999], [500, 499]],
                       jnp.int32)
    outs = jax.jit(jax.vmap(lambda p: cc(p, planes)))(pmat)
    for b in range(4):
        lo, hi = int(pmat[b, 0]), int(pmat[b, 1])
        refb = ((w >= lo) & (w <= hi) & (av > 0)).reshape(-1, 128).sum(1)
        np.testing.assert_array_equal(np.asarray(outs[b]), refb)


@pytest.fixture(scope="module")
def pidx():
    return random_index(seed=11, n_docs=40_000)


@pytest.fixture(scope="module")
def psearch(pidx):
    # use_cube=False: this module pins the PALLAS chain_counts path, which
    # the value-domain cube supersedes on cube-able chains (ops/cube.py);
    # the kernel still serves non-cube-able chains and non-integer
    # percents. test_cube.py covers the cube's own rank-percentile path.
    return (pidx.searcher(config=EngineConfig(pallas_interpret=True,
                                              use_cube=False)),
            pidx.oracle_searcher())


CASES = [
    (tat.MatchAllQuery(), "price", (1, 25, 50, 75, 99)),
    (tat.RangeQuery("qty", 10, 900000), "price", (5, 50, 95)),
    (tat.RangeQuery("qty", 10, 900000), "qty", (2.5, 50.0, 97.5)),
    (tat.TermQuery("cat", "c3"), "delta", (50,)),
    (tat.TermQuery("cat", "zzz-missing"), "price", (50,)),  # m == 0
    (tat.BooleanQuery(must=[tat.RangeQuery("qty", 100, 900000)],
                      must_not=[tat.TermQuery("cat", "c1")]),
     "ts", (25, 50, 75)),
    (tat.BooleanQuery(should=[tat.TermQuery("cat", "c1"),
                              tat.TermQuery("cat", "c2")]),
     "price", (50, 99.9)),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_rank_percentiles_via_kernel(psearch, case):
    s, o = psearch
    q, field, pc = CASES[case]
    tree = {"p": tat.percentiles_agg(field, percents=list(pc))}
    prog = s._program_for(q, tree)
    assert prog.plan[("a", "p")].get("pallas_counts"), (q, field)
    assert s.agg_search(q, tree) == o.agg_search(q, tree)


def test_cube_supersedes_kernel_on_cubeable_chains(pidx):
    """With the default config (use_cube=True), integer-percent rank
    paths over cube-able chains plan the MXU block-histogram (pcube) and
    the kernel stays on for the rest — both bit-identical."""
    s = pidx.searcher(config=EngineConfig(pallas_interpret=True))
    o = pidx.oracle_searcher()
    for case, want_cube in [(1, True), (2, False), (3, True), (0, False)]:
        q, field, pc = CASES[case]
        tree = {"p": tat.percentiles_agg(field, percents=list(pc))}
        prog = s._program_for(q, tree)
        planned_cube = prog.plan[("a", "p")].get("pcube") is not None
        assert planned_cube == want_cube, (case, q, field)
        assert s.agg_search(q, tree) == o.agg_search(q, tree)


def test_rank_percentiles_kernel_msearch(psearch):
    s, o = psearch
    for pc in ([5, 50, 95], [2.5, 50.0, 97.5]):  # in-trace + lazy phase-2
        reqs = [(tat.RangeQuery("qty", 10 + k, 900000 - k),
                 {"p": tat.percentiles_agg("price", percents=pc)})
                for k in range(6)]
        outs = s.agg_search_batch(reqs)
        for (q, t), rd in zip(reqs, outs):
            assert rd == o.agg_search(q, t)


def test_rank_percentiles_kernel_msearch_matchall(psearch):
    # empty param chain: exercises _cc_vmap's unbatched-pvec broadcast
    # branch (the dummy zeros(1) vector is constant across the batch)
    s, o = psearch
    for pc in ([5, 50, 95], [2.5, 50.0, 97.5]):
        reqs = [(tat.MatchAllQuery(),
                 {"p": tat.percentiles_agg("price", percents=pc)})] * 4
        outs = s.agg_search_batch(reqs)
        for (q, t), rd in zip(reqs, outs):
            assert rd == o.agg_search(q, t)
