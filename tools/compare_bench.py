"""Per-query bench regression gate.

Usage: python tools/compare_bench.py NEW.json OLD.json [ratio]

Compares per-query timings between two bench.py outputs and fails (exit 1)
when any query regressed by more than `ratio` (default 1.5x). Queries under
an absolute floor (0.3 s in BOTH rounds) are ignored — at that size the
timing is Spark job-scheduling jitter, not plan cost. New queries (absent
from OLD) are reported informationally and never fail the gate.
"""

from __future__ import annotations

import json
import sys

FLOOR_SEC = 0.3


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(p):
        with open(p) as f:
            text = f.read()
        # bench.py emits TWO JSON lines (full map first, compact summary
        # last — truncation-proofing); take the first line carrying a
        # per-query map. Falls back to whole-file JSON for driver
        # BENCH_r{N}.json, which wraps bench.py's output under "parsed".
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if isinstance(d.get("queries"), dict):
                    return d
        d = json.loads(text)
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        return d

    new, old = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    nq, oq = new["queries"], old["queries"]
    regressions = []
    for name, t_new in sorted(nq.items()):
        if name not in oq:
            print(f"  new  {name}: {t_new:.3f}s (no baseline)")
            continue
        t_old = oq[name]
        if t_new <= FLOOR_SEC and t_old <= FLOOR_SEC:
            continue
        r = t_new / t_old if t_old > 0 else float("inf")
        if r > ratio:
            regressions.append((name, t_old, t_new, r))
            print(f"REGRESSION {name}: {t_old:.3f}s -> {t_new:.3f}s ({r:.2f}x)")

    print(
        f"\ntotal: {old['value']:.1f}s -> {new['value']:.1f}s; "
        f"{len(regressions)} regression(s) over {ratio}x"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
