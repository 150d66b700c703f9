"""tools/merge_scaling.py — the cross-run rep merge must implement the
PRE-DECLARED estimator exactly (per-level minimum over the union of all
reps), keep every rep auditable in the merged arrays, and refuse to mix
reps from different work definitions (corpus sizes)."""
import json
import subprocess
import sys
from pathlib import Path

import pytest

TOOL = Path(__file__).resolve().parents[1] / "tools" / "merge_scaling.py"


def _block(times1, times4, cpu1, cpu4, n_docs=1000, weak=None, probes=None):
    pair = {
        "levels": [1, 4],
        "n_docs": n_docs,
        "reps": len(times1),
        "all_times_sec": {"1": times1, "4": times4},
        "all_steal_sec": {"1": [0.0] * len(times1), "4": [0.0] * len(times4)},
        "all_tree_cpu_sec": {"1": cpu1, "4": cpu4},
        "local1": {"cpus": 1, "sec": min(times1), "docs_per_sec": 1.0},
        "local4": {"cpus": 4, "sec": min(times4), "docs_per_sec": 4.0},
    }
    out = {"pairs": [pair]}
    if weak:
        out["weak"] = weak
    if probes:
        out.update(probes)
    return out


def _run(tmp_path, blocks):
    paths = []
    for i, b in enumerate(blocks):
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps({"scaling": b}))
        paths.append(str(p))
    r = subprocess.run(
        [sys.executable, str(TOOL), *paths],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout)["scaling"]


def test_min_over_union_of_reps(tmp_path):
    # run A has the fastest 1-core rep; run B the fastest 4-core rep —
    # the merged efficiency must combine minima ACROSS runs
    a = _block([100.0, 110.0], [30.0, 31.0], [100.0, 108.0], [101.0, 104.0])
    b = _block([120.0, 130.0], [25.0, 28.0], [118.0, 128.0], [99.0, 102.0])
    m = _run(tmp_path, [a, b])
    p = m["pairs"][0]
    assert p["reps"] == 4
    assert p["all_times_sec"]["1"] == [100.0, 110.0, 120.0, 130.0]
    # efficiency = min T1 / (4 * min T4) = 100 / (4 * 25)
    assert p["efficiency"] == 1.0
    # cpu-work = min cpu1 / min cpu4 = 100 / 99
    assert p["efficiency_cpu_work"] == round(100.0 / 99.0, 3)
    # per-level summary follows each level's min-wall run
    assert p["local1"]["sec"] == 100.0
    assert p["local4"]["sec"] == 25.0
    # cpu_ms_per_doc from min tree CPU over the union
    assert p["cpu_ms_per_doc"]["4"] == round(99.0 * 1000 / 1000, 3)


def test_self_merge_is_identity_on_estimates(tmp_path):
    a = _block([100.0, 110.0], [30.0, 31.0], [100.0, 108.0], [101.0, 104.0])
    one = _run(tmp_path, [a])
    two = _run(tmp_path, [a, a])
    p1, p2 = one["pairs"][0], two["pairs"][0]
    for key in ("efficiency", "efficiency_cpu_work", "cpu_ms_per_doc"):
        assert p1[key] == p2[key]


def test_refuses_different_corpus_sizes(tmp_path):
    a = _block([100.0], [30.0], [100.0], [101.0], n_docs=1000)
    b = _block([100.0], [30.0], [100.0], [101.0], n_docs=2000)
    pa = tmp_path / "a.json"
    pb = tmp_path / "b.json"
    pa.write_text(json.dumps({"scaling": a}))
    pb.write_text(json.dumps({"scaling": b}))
    r = subprocess.run(
        [sys.executable, str(TOOL), str(pa), str(pb)],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "different corpus sizes" in r.stderr


def test_weak_merge_min_ref_and_min_group(tmp_path):
    weak_a = {
        "nodes": 4, "cpus_per_node": 4, "n_docs_per_node": 1000,
        "reps": 1, "all_ref_sec": [40.0], "all_group_max_sec": [55.0],
        "all_group_node_sec": [[50.0, 55.0, 52.0, 51.0]],
        "all_group_steal_sec": [1.0],
    }
    weak_b = dict(weak_a, all_ref_sec=[42.0], all_group_max_sec=[50.0],
                  all_group_node_sec=[[50.0, 49.0, 48.0, 47.0]],
                  all_group_steal_sec=[2.0])
    a = _block([100.0], [30.0], [100.0], [101.0], weak=weak_a)
    b = _block([100.0], [30.0], [100.0], [101.0], weak=weak_b)
    m = _run(tmp_path, [a, b])
    w = m["weak"]
    assert w["reps"] == 2
    assert w["ref_sec"] == 40.0 and w["group_sec"] == 50.0
    assert w["efficiency_weak"] == 0.8
    # 4 nodes x 1000 docs / 50 s
    assert w["group_docs_per_sec"] == 80.0


def test_probe_merge_takes_quietest_window_and_rebases(tmp_path):
    probes_a = {"bw_probe": {
        "1": {"workers": 1, "aggregate_gbps": 10.0, "per_core_gbps": 10.0,
              "per_core_vs_1core": 1.0},
        "4": {"workers": 4, "aggregate_gbps": 32.0, "per_core_gbps": 8.0,
              "per_core_vs_1core": 0.8},
    }}
    probes_b = {"bw_probe": {
        "1": {"workers": 1, "aggregate_gbps": 12.0, "per_core_gbps": 12.0,
              "per_core_vs_1core": 1.0},
        "4": {"workers": 4, "aggregate_gbps": 28.0, "per_core_gbps": 7.0,
              "per_core_vs_1core": 0.583},
    }}
    a = _block([100.0], [30.0], [100.0], [101.0], probes=probes_a)
    b = _block([100.0], [30.0], [100.0], [101.0], probes=probes_b)
    m = _run(tmp_path, [a, b])
    bw = m["bw_probe"]
    # per level: max per-core across runs; ratios rebased on merged level-1
    assert bw["1"]["per_core_gbps"] == 12.0
    assert bw["4"]["per_core_gbps"] == 8.0
    assert bw["4"]["per_core_vs_1core"] == round(8.0 / 12.0, 3)


def test_merged_from_runs_provenance(tmp_path):
    a = _block([100.0], [30.0], [100.0], [101.0])
    m = _run(tmp_path, [a, a, a])
    assert m["merged_from_runs"] == 3


def test_arrow_merge_keeps_widest_level(tmp_path):
    a = _block([100.0], [30.0], [100.0], [101.0])
    a["arrow_batch_wide"] = {"level": 16, "n_docs": 800, "reps": 2,
                             "arrow_batch_rows": 2048,
                             "cpu_ms_per_doc_2048": 0.6,
                             "cpu_ms_per_doc_8192": 0.62,
                             "wall_sec_2048": 30.0, "wall_sec_8192": 31.0}
    b = _block([100.0], [30.0], [100.0], [101.0])
    b["arrow_batch_wide"] = {"level": 4, "n_docs": 400, "reps": 2,
                             "arrow_batch_rows": 2048,
                             "cpu_ms_per_doc_2048": 0.3,
                             "cpu_ms_per_doc_8192": 0.31,
                             "wall_sec_2048": 30.0, "wall_sec_8192": 31.0}
    m = _run(tmp_path, [a, b])
    # the level-4 dict has lower cpu_ms but must NOT displace level-16
    assert m["arrow_batch_wide"]["level"] == 16
    assert m["arrow_batch_wide"]["cpu_ms_per_doc_2048"] == 0.6
