"""Merge the scaling blocks of two or more recorded bench runs under the
PRE-DECLARED estimator (bench.py run_scaling: per-level minimum over all
reps). The methodology doc has said since round 3 that "multiple
sessions' reps may be merged under the same min estimator" — this tool
is that merge, done transparently: it concatenates the per-rep arrays
(wall / steal / tree-CPU) per level and recomputes every derived figure
from the combined arrays. Nothing is dropped: the merged block carries
the full concatenated arrays, so the numbers remain auditable.

Probe sections (bw/lat/spin/llc) and arrow_batch_wide are point
measurements, not rep arrays: for each level the run with the QUIETEST
window wins — i.e. the max per-core figure (co-tenant interference only
ever lowers a pinned probe's throughput; for arrow_batch_wide the min
cpu_ms_per_doc per batch size wins, same argument).

Usage:
    python tools/merge_scaling.py runA.json runB.json [...] [-o out.json]

Inputs may be full bench side files (scaling under the "scaling" key)
or bare scaling blocks. Output (stdout or -o) is a full side-file
document cloned from the FIRST input with its scaling section replaced
by the merge, plus a "merged_from_runs" count for provenance.
"""
from __future__ import annotations

import json
import sys


def _scaling(doc: dict) -> dict:
    return doc["scaling"] if "scaling" in doc else doc


def _merge_pairs(pairs_by_run: list[list[dict]]) -> list[dict]:
    by_levels: dict[tuple, list[dict]] = {}
    for pairs in pairs_by_run:
        for p in pairs:
            by_levels.setdefault(tuple(p["levels"]), []).append(p)
    out = []
    for levels, ps in by_levels.items():
        a, b = levels
        docs = {p["n_docs"] for p in ps}
        if len(docs) != 1:
            raise SystemExit(
                f"pair {levels}: runs used different corpus sizes {docs}; "
                "refusing to merge reps across different work definitions"
            )
        nd = docs.pop()
        merged: dict = {"levels": list(levels), "n_docs": nd}
        times: dict[str, list] = {}
        steal: dict[str, list] = {}
        cpu: dict[str, list] = {}
        for p in ps:
            for lv, arr in p["all_times_sec"].items():
                times.setdefault(lv, []).extend(arr)
            for lv, arr in p.get("all_steal_sec", {}).items():
                steal.setdefault(lv, []).extend(arr)
            for lv, arr in p.get("all_tree_cpu_sec", {}).items():
                cpu.setdefault(lv, []).extend(arr)
        # the cpu-derived figures below index cpu[lv] positionally
        # against times[lv]: a run contributing wall reps without
        # matching tree-CPU reps would crash or, worse, attribute the
        # wrong rep's CPU — refuse instead of guessing
        if {lv: len(v) for lv, v in cpu.items()} != {
            lv: len(v) for lv, v in times.items()
        }:
            raise SystemExit(
                f"pair {levels}: tree-CPU rep counts do not match wall "
                "rep counts across the input runs; refusing to merge "
                "(every recorded run since the tracking landed carries "
                "all_tree_cpu_sec — check the inputs)"
            )
        merged["reps"] = min(len(v) for v in times.values())
        merged["all_times_sec"] = times
        merged["all_steal_sec"] = steal
        merged["all_tree_cpu_sec"] = cpu
        la, lb = str(a), str(b)
        min_t = {lv: min(arr) for lv, arr in times.items()}
        min_c = {lv: min(arr) for lv, arr in cpu.items()}
        merged["efficiency"] = round(min_t[la] / ((b / a) * min_t[lb]), 3)
        merged["efficiency_cpu_work"] = round(min_c[la] / min_c[lb], 3)
        # tree CPU of each level's min-WALL rep (the companion audit)
        mw_cpu = {
            lv: cpu[lv][times[lv].index(min_t[lv])] for lv in times
        }
        merged["efficiency_cpu_work_minwall_rep"] = round(
            mw_cpu[la] / mw_cpu[lb], 3
        )
        merged["min_tree_cpu_sec"] = {lv: round(v, 1) for lv, v in min_c.items()}
        merged["cpu_ms_per_doc"] = {
            lv: round(v * 1000.0 / nd, 3) for lv, v in min_c.items()
        }
        # carry each level's summary dict from the run contributing its
        # min-wall rep (docs_per_sec etc. stay consistent with min wall)
        for lv_key in (f"local{a}", f"local{b}"):
            lv = lv_key[5:]
            best = None
            for p in ps:
                cand = p.get(lv_key)
                if cand and (best is None or cand["sec"] <= best["sec"]):
                    best = cand
            if best:
                merged[lv_key] = best
        out.append(merged)
    out.sort(key=lambda p: p["levels"])
    return out


def _merge_weak(weaks: list[dict]) -> dict | None:
    weaks = [w for w in weaks if w]
    if not weaks:
        return None
    shape = {
        (w["nodes"], w["cpus_per_node"], w["n_docs_per_node"]) for w in weaks
    }
    if len(shape) != 1:
        raise SystemExit(f"weak phases differ in shape {shape}; not merging")
    merged = dict(weaks[0])
    for key in ("all_ref_sec", "all_group_max_sec", "all_group_node_sec",
                "all_group_steal_sec"):
        merged[key] = [x for w in weaks for x in w.get(key, [])]
    merged["reps"] = len(merged["all_ref_sec"])
    ref = min(merged["all_ref_sec"])
    grp = min(merged["all_group_max_sec"])
    merged["ref_sec"] = ref
    merged["group_sec"] = grp
    merged["efficiency_weak"] = round(ref / grp, 3)
    nd = merged["n_docs_per_node"] * merged["nodes"]
    merged["group_docs_per_sec"] = round(nd / grp, 1)
    return merged


def _merge_probes(blocks: list[dict], key: str, per_core_key: str) -> dict | None:
    probes = [b.get(key) for b in blocks if b.get(key)]
    if not probes:
        return None
    levels = sorted({lv for p in probes for lv in p}, key=int)
    out = {}
    for lv in levels:
        cands = [p[lv] for p in probes if lv in p]
        out[lv] = max(cands, key=lambda d: d[per_core_key])
    if "1" in out:
        base = out["1"][per_core_key]
        for d in out.values():
            d["per_core_vs_1core"] = round(d[per_core_key] / base, 3)
    return out


def main(argv: list[str]) -> None:
    out_path = None
    if "-o" in argv:
        i = argv.index("-o")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) < 1:
        raise SystemExit(__doc__)
    docs = [json.load(open(p)) for p in argv]
    blocks = [_scaling(d) for d in docs]

    merged = dict(blocks[0])
    merged["pairs"] = _merge_pairs([b.get("pairs", []) for b in blocks])
    weak = _merge_weak([b.get("weak") for b in blocks])
    if weak:
        merged["weak"] = weak
    for key, pck in (("bw_probe", "per_core_gbps"),
                     ("lat_probe", "per_core_mlookups_per_sec"),
                     ("llc_probe", "per_core_mlookups_per_sec"),
                     ("spin_probe", "per_core_mops_per_sec")):
        m = _merge_probes(blocks, key, pck)
        if m:
            merged[key] = m
    abs_ = [b.get("arrow_batch_wide") for b in blocks if b.get("arrow_batch_wide")]
    if abs_:
        # the probe's subject is the WIDEST level: keep only dicts at the
        # max level across runs (a pair-1-only run produces a level-4
        # dict that must not displace level-16 evidence), then take the
        # quietest window's within-run comparison
        top = max(d["level"] for d in abs_)
        abs_ = [d for d in abs_ if d["level"] == top]
        best = min(abs_, key=lambda d: d["cpu_ms_per_doc_2048"])
        merged["arrow_batch_wide"] = best
    if merged["pairs"]:
        p1 = merged["pairs"][0]
        merged["efficiency_N_to_4N"] = p1["efficiency"]
        merged["efficiency_cpu_work"] = p1["efficiency_cpu_work"]
    merged["merged_from_runs"] = len(blocks)

    result = dict(docs[0]) if "scaling" in docs[0] else {"scaling": None}
    result["scaling"] = merged
    text = json.dumps(result, indent=2)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text)
        print(f"wrote {out_path}")
    else:
        print(text)


if __name__ == "__main__":
    main(sys.argv[1:])
