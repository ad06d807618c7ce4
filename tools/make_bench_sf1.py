#!/usr/bin/env python3
"""Merge two same-config Bench runs a decade of scale apart into
BENCH_SF1.json: per-scenario time(big)/time(small) scaling factors (10x
data -> factor ~10 means exponent ~1.0) plus both runs' byte invariants,
so the 100x plan-shape claims carry a measured exponent instead of an
argument. Usage: make_bench_sf1.py <small.json> <big.json> <out.json>
[rows_factor=10] [pair_tag]

The out file is MERGED, not overwritten: entries this invocation
produces replace same-key entries; pre-existing entries that carry a
"pair" tag different from this invocation's (e.g. the queries-only
maintained-index pair vs the scenario pair) are preserved — so
re-running the documented scenario-pair flow never silently drops the
evidence a separately-run pair contributed (review r12). Pass pair_tag
to stamp this invocation's entries (e.g. "queries-only"); untagged
entries belong to the default scenario pair.
"""
import json
import math
import sys

SCN_KEYS = [
    "scn_nochange_sync", "scn_5pct_incremental", "scn_multitable_8x_noop",
    "scn_compact_partial_4commits", "scn_compact_4commits",
    "scn_full_reload", "scn_40pct_truncate",
    "q_dedup_prefix", "q_sim_ivfpq",
    # IVM family (r11 verdict #5): maintained-count and maintained-BM25 —
    # the O(changes) claims get a measured exponent (expect well below 1.0
    # for a fixed change fraction)
    "q_cdf_maintain", "q_cdf_maintain_bm25",
    # replica chain (r12): downstream lake-to-lake sync through the
    # version-pruned wide fetch — the read side is O(changed commits)
    "scn_lake_to_lake_5pct",
    # maintained-index trio + feature table (r12): O(changes) claims of
    # the derivedRows family, measured from a queries-only pair
    "q_cdf_maintain_ivf", "q_cdf_maintain_minhash",
    "q_cdf_maintain_docfeatures",
]
BYTE_KEYS = [
    "nochange_read_reduction_x", "pct5_read_reduction_x",
    "pct5_write_reduction_x", "control_bytes_per_row",
    "full_bytes_per_row", "truncate_vs_full_bytes",
    "compact_amortized_vs_full_bytes", "compact_scattered_vs_full_bytes",
]


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    out_path = sys.argv[3]
    factor = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    pair_tag = sys.argv[5] if len(sys.argv) > 5 else None

    scaling = {}
    for k in SCN_KEYS:
        a = small["queries"].get(k)
        b = big["queries"].get(k)
        if a and b and a > 0 and b > 0:
            scaling[k] = {
                "small_s": round(a, 3),
                "big_s": round(b, 3),
                "time_factor": round(b / a, 3),
                # exponent e with time ~ rows^e: e = log(tb/ta)/log(factor)
                "scaling_exponent": round(math.log(b / a) / math.log(factor), 3),
            }
            # CPU-domain twin when both runs carry it: wall exponents on
            # this box confound code scaling with the writeback-throttle
            # regime; the CPU exponent is the regime-immune corroboration
            ac = small.get("queries_cpu", {}).get(k)
            bc = big.get("queries_cpu", {}).get(k)
            if ac and bc and ac > 0 and bc > 0:
                scaling[k]["small_cpu_s"] = round(ac, 3)
                scaling[k]["big_cpu_s"] = round(bc, 3)
                scaling[k]["scaling_exponent_cpu"] = round(
                    math.log(bc / ac) / math.log(factor), 3)
    bytes_block = {
        k: {"small": round(small["ratios"][k], 4), "big": round(big["ratios"][k], 4)}
        for k in BYTE_KEYS
        if k in small.get("ratios", {}) and k in big.get("ratios", {})
    }
    if pair_tag:
        for v in scaling.values():
            v["pair"] = pair_tag
    # merge semantics (see module doc): keep other pairs' tagged entries
    kept = {}
    try:
        prev = json.load(open(out_path))
        kept = {k: v for k, v in prev.get("scaling", {}).items()
                if k not in scaling and v.get("pair") != pair_tag}
    except (FileNotFoundError, ValueError):
        pass
    result = {
        "metric": "sf_scaling",
        "rows_factor": factor,
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "scaling": {**kept, **scaling},
        "byte_invariants": bytes_block,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
