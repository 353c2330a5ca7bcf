#!/usr/bin/env python3
"""Sentinel-normalized bench comparison (r17, VERDICT r16 #2 follow-up).

Usage: bench_norm.py OLD.json NEW.json [top_n]

Both files are Bench output lines (the FULL line with "queries" /
"queries_min", e.g. bench_full.json or a BENCH_r{N}.json that carries
it). Each side's per-query numbers divide by its own sentinel_ratio
(1.0 when absent — pre-r17 artifacts), so cross-session host speed
cancels and the printed ratios move with the CODE. Queries are compared
on min-of-reps (the contention-resistant stat); the report lists the
biggest normalized movers both ways plus totals.

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


def qmap(d):
    m = d.get("queries_min") or d.get("queries") or {}
    r = d.get("sentinel_ratio")
    if not r or r <= 0:
        r = 1.0
    return {k: v / r for k, v in m.items()}, r


def main():
    old_d, new_d = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    old_q, old_r = qmap(old_d)
    new_q, new_r = qmap(new_d)
    shared = sorted(set(old_q) & set(new_q))
    added = sorted(set(new_q) - set(old_q))
    removed = sorted(set(old_q) - set(new_q))
    print(f"sentinel_ratio: old={old_r} new={new_r} "
          f"(1.0 = pinned reference host speed; absent pre-r17 = 1.0)")
    tot_old = sum(old_q[k] for k in shared)
    tot_new = sum(new_q[k] for k in shared)
    print(f"shared-query normalized total (min-of-reps): "
          f"{tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x over {len(shared)} queries)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    movers = sorted(
        ((new_q[k] / old_q[k] if old_q[k] > 0 else float("inf"), k)
         for k in shared),
        reverse=True)
    # tiny queries ratio-swing on noise alone — flag only meaningful ones
    big = [(r, k) for r, k in movers
           if max(old_q[k], new_q[k]) >= 0.25 and (r >= 1.3 or r <= 1 / 1.3)]
    slower = [(r, k) for r, k in big if r > 1][:top_n]
    faster = [(r, k) for r, k in reversed(big) if r < 1][:top_n]
    if slower:
        print(f"\nslower (normalized, >=1.3x, >=0.25s):")
        for r, k in slower:
            print(f"  {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s ({r:.2f}x)")
    if faster:
        print(f"\nfaster (normalized, >=1.3x, >=0.25s):")
        for r, k in faster:
            print(f"  {k}: {old_q[k]:.2f}s -> {new_q[k]:.2f}s ({1 / r:.2f}x)")
    if not slower and not faster:
        print("\nno meaningful normalized movers (>=1.3x and >=0.25s)")


if __name__ == "__main__":
    main()
