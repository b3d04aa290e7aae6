"""Render the round's per-query floor movement as a markdown table.

Usage: python tools/floor_delta.py <round-start-git-rev> [sf_key]

Compares `.bench_query_floor.json` at the given revision vs the working
tree and prints query | start floor | end floor | delta — the min-only
floors are the storm-proof record of what each query can do on this
machine, so their movement is the round's per-query evidence.
"""

from __future__ import annotations

import json
import subprocess
import sys


def main() -> int:
    rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    key = sys.argv[2] if len(sys.argv) > 2 else "0.1"
    old = json.loads(
        subprocess.run(
            ["git", "show", f"{rev}:.bench_query_floor.json"],
            capture_output=True, text=True, check=True,
        ).stdout
    ).get(key, {})
    new = json.load(open(".bench_query_floor.json")).get(key, {})
    rows = []
    for n in sorted(set(old) | set(new)):
        o, w = old.get(n), new.get(n)
        if o is None or w is None:
            rows.append((0.0, n, o, w))
            continue
        rows.append(((o - w) / o if o else 0.0, n, o, w))
    rows.sort(reverse=True)
    print("| query | start floor (s) | end floor (s) | change |")
    print("|---|---|---|---|")
    for frac, n, o, w in rows:
        oo = f"{o:.3f}" if o is not None else "—"
        ww = f"{w:.3f}" if w is not None else "—"
        ch = f"−{frac:.0%}" if frac > 0.005 else ("0%" if abs(frac) <= 0.005 else f"+{-frac:.0%}")
        print(f"| {n} | {oo} | {ww} | {ch} |")
    tot_o = sum(v for v in old.values() if v)
    tot_w = sum(v for v in new.values() if v)
    print(f"\nfloor-sum: {tot_o:.1f} s -> {tot_w:.1f} s "
          f"({(tot_o - tot_w) / tot_o:+.0%} improvement)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
