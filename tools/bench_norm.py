#!/usr/bin/env python3
"""Sentinel-normalized bench comparison (r17, VERDICT r16 #2 follow-up;
r19 dual-ratio, VERDICT r18 #1).

Usage: bench_norm.py OLD.json NEW.json [top_n]

Both files are Bench output lines (the FULL line with "queries" /
"queries_min", e.g. bench_full.json or a BENCH_r{N}.json that carries
it). Each artifact carries up to TWO host-speed ratios: the 3-query
latency `sentinel_ratio` and the sustained 32-thread `sentinel_tp_ratio`
(r19 — the latency probe under-captures memory-bandwidth contention:
r18's ratio read the host FAST while sustained sweeps ran ~15% SLOW,
overstating the normalized delta ~25%). A query's true profile — fixed
latencies vs sustained bandwidth — is unknown per query, so each query
is normalized by WHICHEVER of the two ratio pairs leaves its cross-round
ratio CLOSER TO PARITY: exactly the conservative disposition the
r17/r18 manual fresh-JVM/ABA always reached. A mover that survives the
conservative choice is worth a code look; totals are reported under
both ratios plus raw.

Exit code 0 always — this is a lens, not a gate; the bench's own
suspects/ABA protocol remains the escalation path.
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read()
    # take the parseable JSON object line with the LARGEST queries map
    # (r18, VERDICT r17 #6): idle artifacts carry both a full per-query
    # map and a truncated top-15 summary line — "last parseable" picked
    # the summary and silently compared 12 shared queries instead of
    # ~293. Ties keep the later line (the fresher sweep).
    best = None
    best_n = -1
    for line in txt.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "queries" not in d and "queries_min" not in d:
            continue
        n = len(d.get("queries_min") or d.get("queries") or {})
        if n >= best_n:
            best, best_n = d, n
    if best is None:
        raise SystemExit(f"{path}: no parseable bench line with a queries map")
    return best


def ratios(d):
    """(latency_ratio, tp_ratio); tp falls back to latency for pre-r19
    artifacts so the conservative choice degenerates to the old
    single-ratio behavior."""
    lat = d.get("sentinel_ratio")
    if not lat or lat <= 0:
        lat = 1.0
    tp = d.get("sentinel_tp_ratio")
    if not tp or tp <= 0:
        tp = lat
    return lat, tp


def qmap(d):
    return d.get("queries_min") or d.get("queries") or {}


def main():
    old_d, new_d = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old_q, new_q = qmap(old_d), qmap(new_d)
    old_lat, old_tp = ratios(old_d)
    new_lat, new_tp = ratios(new_d)
    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    print(f"sentinel ratios: old lat={old_lat} tp={old_tp} | "
          f"new lat={new_lat} tp={new_tp} "
          f"(1.0 = pinned reference host speed; tp absent pre-r19 = lat)")
    tot_old_raw = sum(old_q[k] for k in shared)
    tot_new_raw = sum(new_q[k] for k in shared)
    print(f"shared-query totals (min-of-reps, {len(shared)} queries):")
    print(f"  raw:            {tot_old_raw:.1f}s -> {tot_new_raw:.1f}s "
          f"({tot_new_raw / tot_old_raw:.2f}x)")
    print(f"  lat-normalized: {tot_old_raw / old_lat:.1f}s -> "
          f"{tot_new_raw / new_lat:.1f}s "
          f"({(tot_new_raw / new_lat) / (tot_old_raw / old_lat):.2f}x)")
    print(f"  tp-normalized:  {tot_old_raw / old_tp:.1f}s -> "
          f"{tot_new_raw / new_tp:.1f}s "
          f"({(tot_new_raw / new_tp) / (tot_old_raw / old_tp):.2f}x)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    def conservative(k):
        """Cross-round ratio under the normalization closest to parity.

        Both candidates apply ONE profile consistently across rounds
        (lat/lat or tp/tp) — mixing profiles across rounds would
        compare different physical quantities."""
        if old_q[k] <= 0:
            return float("inf"), "lat"
        r_lat = (new_q[k] / new_lat) / (old_q[k] / old_lat)
        r_tp = (new_q[k] / new_tp) / (old_q[k] / old_tp)
        return (r_lat, "lat") if abs_log(r_lat) <= abs_log(r_tp) else (r_tp, "tp")

    def abs_log(r):
        import math
        return abs(math.log(r)) if r > 0 else float("inf")

    movers = sorted(((conservative(k), k) for k in shared), reverse=True)
    # tiny queries ratio-swing on noise alone — flag only meaningful ones
    big = [(r, prof, k) for (r, prof), k in movers
           if max(old_q[k], new_q[k]) >= 0.25 and (r >= 1.3 or r <= 1 / 1.3)]
    slower = [(r, p, k) for r, p, k in big if r > 1][:top_n]
    faster = [(r, p, k) for r, p, k in reversed(big) if r < 1][:top_n]
    if slower:
        print("\nslower (conservative-normalized, >=1.3x, >=0.25s):")
        for r, p, k in slower:
            print(f"  {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s "
                  f"({r:.2f}x via {p} ratio)")
    if faster:
        print("\nfaster (conservative-normalized, >=1.3x, >=0.25s):")
        for r, p, k in faster:
            print(f"  {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s "
                  f"({1 / r:.2f}x via {p} ratio)")
    if not slower and not faster:
        print("\nno meaningful conservative-normalized movers "
              "(>=1.3x and >=0.25s)")


if __name__ == "__main__":
    main()
