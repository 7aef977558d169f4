"""Driver-window freshness report (VERDICT r5 #8).

The driver hash-checks only the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so with 200+ declared queries
stale-green accumulates by design. This tool makes each round's rotation
arithmetic mechanical instead of hand-counted: for every declared query
it reports the latest round with a driver correctness row (from the
repo's ``CORRECTNESS_r*.json`` files), then prints the suggested
next-round front-load — queries with NO driver row first (in current
priority order), then rows from the stalest round upward, clipped to the
50-slot window.

Usage: python tools/window_report.py [--full]
  default: summary + the suggested 50-row front-load
  --full:  also the per-query table (query, latest round, position)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> int:
    full = "--full" in sys.argv[1:]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    latest: dict[str, int] = {}
    rounds_seen = []
    for f in sorted(os.listdir(here)):
        m = re.match(r"CORRECTNESS_r0*(\d+)\.json$", f)
        if not m:
            continue
        n = int(m.group(1))
        rounds_seen.append(n)
        with open(os.path.join(here, f)) as fh:
            for q, row in json.load(fh).items():
                # only a GREEN row counts as driver coverage
                if row.get("hash_match") or (
                    row.get("rows_match") and row.get("err") is None
                ):
                    latest[q] = max(latest.get(q, 0), n)

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    pos = {q: i for i, q in enumerate(names)}

    never = [q for q in names if q not in latest]
    stale = sorted(
        (q for q in names if q in latest),
        key=lambda q: (latest[q], pos[q]),
    )

    cur = max(rounds_seen) if rounds_seen else 0
    by_round: dict[int, int] = {}
    for q in names:
        by_round[latest.get(q, 0)] = by_round.get(latest.get(q, 0), 0) + 1
    print(f"declared queries: {len(names)}; driver rounds recorded: {rounds_seen}")
    print(
        "latest-green histogram (0 = never driver-checked): "
        + ", ".join(f"r{k}:{v}" for k, v in sorted(by_round.items()))
    )

    frontload = never + [q for q in stale if latest[q] < cur]
    print(f"\nsuggested round-{cur + 1} front-load (window={WINDOW}):")
    for i, q in enumerate(frontload[:WINDOW]):
        tag = "never" if q in set(never) else f"r{latest[q]}"
        print(f"  {i:2d}. {q:36s} [{tag}]")
    spill = frontload[WINDOW:]
    if spill:
        print(f"  ... {len(spill)} more past the window: {', '.join(spill[:10])}"
              + (" ..." if len(spill) > 10 else ""))

    if full:
        print(f"\n{'query':36s} latest  window-pos")
        for q in names:
            tag = "never" if q not in latest else f"r{latest[q]}"
            inwin = "*" if pos[q] < WINDOW else ""
            print(f"{q:36s} {tag:6s} {pos[q]:4d}{inwin}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
