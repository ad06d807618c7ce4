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
    # r13: the token-budget curation gate served from the maintained
    # feature table — the SERVE side reads the replayed final state by
    # design (its exponent is ~1 in state size); the O(changes) claim
    # lives on the q_cdf_maintain_* MAINTENANCE rows above
    "q_token_budget_maintained_serve",
    # r15: the probe-before-pay routed prefix join — wall/cpu exponents of
    # the route the probe actually picks at each scale (read the hot
    # corpus's exponent against its OUTPUT growth: exact-dup families
    # densify with corpus size, so the qualifying-pair floor grows ~rows^2)
    "q_dedup_prefix_routed", "q_dedup_prefix_routed_hot",
]
BYTE_KEYS = [
    "nochange_read_reduction_x", "pct5_read_reduction_x",
    "pct5_write_reduction_x", "control_bytes_per_row",
    "full_bytes_per_row", "truncate_vs_full_bytes",
    "compact_amortized_vs_full_bytes", "compact_scattered_vs_full_bytes",
]


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__.strip())
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    for path, art in ((sys.argv[1], small), (sys.argv[2], big)):
        if "queries" not in art:
            sys.exit(f"artifact has no 'queries' block: {path}")
    out_path = sys.argv[3]
    # optional MID point for a three-point fit (--mid <mid.json> <mid_factor>,
    # mid_factor = mid rows / small rows): distinguishes a one-time regime
    # step from a power law — two segment exponents instead of one secant
    # (VERDICT r12 #1: a two-point fit can't tell spill-step from O(n^1.6)).
    mid, mid_factor = None, None
    pos = sys.argv[4:]
    if "--mid" in pos:
        i = pos.index("--mid")
        # --mid takes exactly two operands; a missing one used to surface
        # as a bare IndexError/ValueError traceback (ADVICE r14)
        if len(pos) < i + 3:
            sys.exit("--mid needs two operands: --mid <mid.json> <mid_factor>")
        mid_path = pos[i + 1]
        try:
            mid = json.load(open(mid_path))
        except (FileNotFoundError, ValueError) as e:
            sys.exit(f"--mid artifact unreadable: {mid_path}: {e}")
        try:
            mid_factor = float(pos[i + 2])
        except ValueError:
            sys.exit(f"--mid factor must be numeric, got: {pos[i + 2]!r}")
        pos = pos[:i] + pos[i + 3:]
        if "queries" not in mid:
            sys.exit(f"--mid artifact has no 'queries' block: {mid_path}")
    try:
        factor = float(pos[0]) if len(pos) > 0 else 10.0
    except ValueError:
        sys.exit(f"rows_factor must be numeric, got: {pos[0]!r}")
    if factor <= 1.0:
        sys.exit(f"rows_factor must exceed 1 (log-ratio base), got: {factor}")
    # mid_factor must sit strictly between 1 and the big factor: equal to
    # factor makes the mid->big segment divide by log(1)=0, and outside the
    # interval the segment exponents are arithmetic nonsense (ADVICE r13)
    if mid_factor is not None and not (1.0 < mid_factor < factor):
        sys.exit(f"--mid factor {mid_factor} must satisfy 1 < mid < {factor}")
    # --all-queries: compute exponents for EVERY query name present in both
    # artifacts instead of the curated SCN_KEYS list — the full-suite scale
    # sweep mode (r15). The curated list stays the default so the headline
    # file keeps its focus.
    all_queries = "--all-queries" in pos
    if all_queries:
        pos = [p for p in pos if p != "--all-queries"]
    pair_tag = pos[1] if len(pos) > 1 else None

    def expo(a, b, f):
        return round(math.log(b / a) / math.log(f), 3)

    scaling = {}
    keys = (sorted(set(small["queries"]) & set(big["queries"]))
            if all_queries else SCN_KEYS)
    for k in keys:
        a = small["queries"].get(k)
        b = big["queries"].get(k)
        if a and b and a > 0 and b > 0:
            scaling[k] = {
                "small_s": round(a, 3),
                "big_s": round(b, 3),
                "time_factor": round(b / a, 3),
                # exponent e with time ~ rows^e: e = log(tb/ta)/log(factor)
                "scaling_exponent": expo(a, b, factor),
                # per-entry provenance (ADVICE r12): merged files mix pairs
                # produced with different rows_factor values, so the factor
                # an exponent was computed against must travel WITH it —
                # the file-level header only describes the last invocation
                "rows_factor": factor,
                "small_sf": small.get("sf"),
                "big_sf": big.get("sf"),
            }
            # CPU-domain twin when both runs carry it: wall exponents on
            # this box confound code scaling with the writeback-throttle
            # regime; the CPU exponent is the regime-immune corroboration
            ac = small.get("queries_cpu", {}).get(k)
            bc = big.get("queries_cpu", {}).get(k)
            if ac and bc and ac > 0 and bc > 0:
                scaling[k]["small_cpu_s"] = round(ac, 3)
                scaling[k]["big_cpu_s"] = round(bc, 3)
                scaling[k]["scaling_exponent_cpu"] = expo(ac, bc, factor)
            # USER-cpu twin (r13): the near-deterministic instruction-work
            # component — total process CPU on this box carries episodic
            # kernel/IO-path (sys) inflation that confounds exponents
            # (r13 measured a big full-reload draw at user 280 + sys 1560)
            au = small.get("queries_cpu_user", {}).get(k)
            bu = big.get("queries_cpu_user", {}).get(k)
            if au and bu and au > 0 and bu > 0:
                scaling[k]["small_user_cpu_s"] = round(au, 3)
                scaling[k]["big_user_cpu_s"] = round(bu, 3)
                scaling[k]["scaling_exponent_user_cpu"] = expo(au, bu, factor)
            m = mid["queries"].get(k) if mid else None
            if m and m > 0:
                seg = {
                    "mid_s": round(m, 3), "mid_sf": mid.get("sf"),
                    "mid_rows_factor": mid_factor,
                    "exponent_small_to_mid": expo(a, m, mid_factor),
                    "exponent_mid_to_big": expo(m, b, factor / mid_factor),
                }
                mc = mid.get("queries_cpu", {}).get(k)
                if mc and mc > 0 and ac and bc:
                    seg["mid_cpu_s"] = round(mc, 3)
                    seg["exponent_cpu_small_to_mid"] = expo(ac, mc, mid_factor)
                    seg["exponent_cpu_mid_to_big"] = expo(mc, bc, factor / mid_factor)
                mu = mid.get("queries_cpu_user", {}).get(k)
                if mu and mu > 0 and au and bu:
                    seg["mid_user_cpu_s"] = round(mu, 3)
                    seg["exponent_user_cpu_small_to_mid"] = expo(au, mu, mid_factor)
                    seg["exponent_user_cpu_mid_to_big"] = expo(mu, bu, factor / mid_factor)
                scaling[k]["three_point"] = seg
    bytes_block = {
        k: {"small": round(small["ratios"][k], 4), "big": round(big["ratios"][k], 4)}
        for k in BYTE_KEYS
        if k in small.get("ratios", {}) and k in big.get("ratios", {})
    }
    if pair_tag:
        for v in scaling.values():
            v["pair"] = pair_tag
    # merge semantics (see module doc): keep other pairs' tagged entries,
    # and keep the previous byte_invariants wherever this invocation didn't
    # produce a value (ADVICE r12: a queries-only pair run used to replace
    # the scenario pair's byte block with an empty one — the same silent
    # evidence drop the scaling merge was added to prevent)
    kept = {}
    kept_bytes = {}
    try:
        prev = json.load(open(out_path))
        kept = {k: v for k, v in prev.get("scaling", {}).items()
                if k not in scaling and v.get("pair") != pair_tag}
        kept_bytes = {k: v for k, v in prev.get("byte_invariants", {}).items()
                      if k not in bytes_block}
    except (FileNotFoundError, ValueError):
        pass
    result = {
        "metric": "sf_scaling",
        "rows_factor": factor,
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "scaling": {**kept, **scaling},
        "byte_invariants": {**kept_bytes, **bytes_block},
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
