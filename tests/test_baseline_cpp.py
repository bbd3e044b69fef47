"""Integration test of the benchmark plumbing: the C++ single-core baseline
(baseline_cpp/engine) must produce fruits EQUAL to the oracle and the device
engine on a small on-disk flagship index — the same identity gate bench.py
applies at 10M docs, exercised in the suite at 20k docs."""

import json
import shutil
import subprocess

import pytest

import bench as bench_mod
from tantivy_aggregations_tpu.models import flagship


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bench") / "idx")
    idx = flagship.build_bench_index(path, 20_000, seed=7, card=500,
                                     n_segments=3)
    # add deletes so the baseline's alive handling is exercised
    w = idx.writer()
    w.delete_term("status", "deleted")
    w.commit()
    return idx, path


@pytest.mark.skipif(shutil.which("make") is None, reason="no make")
def test_cpp_baseline_identity(small_index):
    idx, path = small_index
    exe = bench_mod.build_baseline()
    manifest = bench_mod.write_manifest(idx, path)
    oracle = idx.oracle_searcher()
    dev = idx.searcher()
    for cfg, (name, query, aggs) in enumerate(flagship.judged_configs(),
                                              start=1):
        out = subprocess.run([exe, manifest, str(cfg), "1"],
                             capture_output=True, text=True, check=True)
        got_cpp = bench_mod.finalize_cpp(cfg, json.loads(out.stdout)["result"])
        want = oracle.agg_search(query, aggs)
        got_dev = dev.agg_search(query, aggs)
        assert got_cpp == want, f"{name}: cpp != oracle"
        assert got_dev == want, f"{name}: device != oracle"
