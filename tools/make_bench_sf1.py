#!/usr/bin/env python3
"""Merge two same-config Bench runs a decade of scale apart into
BENCH_SF1.json: per-scenario time(big)/time(small) scaling factors (10x
data -> factor ~10 means exponent ~1.0) plus both runs' byte invariants,
so the 100x plan-shape claims carry a measured exponent instead of an
argument. Usage: make_bench_sf1.py <small.json> <big.json> <out.json>
[rows_factor=10]
"""
import json
import math
import sys

SCN_KEYS = [
    "scn_nochange_sync", "scn_5pct_incremental", "scn_multitable_8x_noop",
    "scn_compact_partial_4commits", "scn_compact_4commits",
    "scn_full_reload", "scn_40pct_truncate",
    "q_dedup_prefix", "q_sim_ivfpq",
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
    bytes_block = {
        k: {"small": round(small["ratios"][k], 4), "big": round(big["ratios"][k], 4)}
        for k in BYTE_KEYS
        if k in small.get("ratios", {}) and k in big.get("ratios", {})
    }
    result = {
        "metric": "sf_scaling",
        "rows_factor": factor,
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "scaling": scaling,
        "byte_invariants": bytes_block,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
