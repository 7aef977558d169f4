"""Per-query bench regression gate.

Usage: python tools/compare_bench.py NEW.json OLD.json [ratio]

Compares per-query timings between two bench.py outputs and fails (exit 1)
when any query regressed by more than `ratio` (default 1.5x). Queries under
an absolute floor (0.3 s in BOTH rounds) are ignored — at that size the
timing is Spark job-scheduling jitter, not plan cost. New queries (absent
from OLD) are reported informationally and never fail the gate.

Sentinel normalization (VERDICT r12 #3): when BOTH artifacts record a
`sentinel` series (bench.py re-times one fixed control query at every
family boundary — round 12+), OLD per-query timings are scaled by
median(new sentinel)/median(old sentinel) before the gate, so a uniform
machine-speed shift between captures does not read as per-query
regressions (r12's gate run flagged 7 "regressions", all sub-2.4 s
queries untouched by the round's diff — pure ambient drift). The applied
ratio is printed; when either side lacks a sentinel the gate runs raw,
exactly as before.
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
        # Prefer the repo-persisted full per-query map (bench.py writes
        # BENCHDETAIL_r{N}.json — VERDICT r5 #6) over the driver's
        # possibly-clipped BENCH_r{N}.json capture.
        import os
        import re as _re2

        m = _re2.search(r"BENCH_r0*(\d+)\.json$", p)
        if m:
            n = int(m.group(1))
            d = os.path.dirname(os.path.abspath(p))
            for cand in (f"BENCHDETAIL_r{n}.json", f"BENCHDETAIL_r0{n}.json"):
                full = os.path.join(d, cand)
                if os.path.exists(full):
                    p = full
                    break
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
        whole = json.loads(text)
        d = whole
        if "queries" not in d and isinstance(d.get("parsed"), dict) and \
                "queries" in d["parsed"]:
            d = d["parsed"]
        if "queries" not in d and isinstance(whole.get("tail"), str):
            d = whole
            # driver wrappers from truncation-era rounds carry only a
            # "tail" fragment of the per-query map — recover what's
            # visible so old baselines stay comparable
            import re as _re

            parsed = whole.get("parsed") or {}
            d = {
                "value": parsed.get("value", whole.get("value")),
                "queries": {
                    m.group(1): float(m.group(2))
                    for m in _re.finditer(
                        r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', d["tail"]
                    )
                },
            }
        return d

    def t_of(v):
        """Per-query value: plain float, {'min': x, 'runs': [...]}, or a
        raw [a, b] runs pair (min is the steady-state headline)."""
        if isinstance(v, dict):
            return float(v.get("min", min(v.get("runs", [float("inf")]))))
        if isinstance(v, list):
            return float(min(v))
        return float(v)

    new, old = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    # Sentinel normalization happens BEFORE the gate (VERDICT r12 #3): the
    # sentinel series is the machine-speed anchor — a flat-but-shifted
    # sentinel means the machine, not the plans, moved.
    def sent_stats(d):
        s = [e["sec"] for e in d.get("sentinel", []) if isinstance(e, dict)]
        if not s:
            return None
        s2 = sorted(s)
        return (s2[len(s2) // 2], min(s2), max(s2))

    so, sn = sent_stats(old), sent_stats(new)
    norm = 1.0
    if so and sn and so[0] > 0:
        norm = sn[0] / so[0]
        print(f"sentinel normalization: old timings scaled by "
              f"{norm:.3f}x (new median {sn[0]:.3f}s / old median {so[0]:.3f}s)")
    elif so or sn:
        print("sentinel: only one artifact records a series — gate runs raw")

    nq, oq = new["queries"], old["queries"]
    regressions = []
    for name, v_new in sorted(nq.items()):
        t_new = t_of(v_new)
        if name not in oq:
            print(f"  new  {name}: {t_new:.3f}s (no baseline)")
            continue
        t_old_raw = t_of(oq[name])
        t_old = t_old_raw * norm
        if t_new <= FLOOR_SEC and t_old <= FLOOR_SEC:
            continue
        r = t_new / t_old if t_old > 0 else float("inf")
        if r > ratio:
            regressions.append((name, t_old, t_new, r))
            adj = (f" (raw {t_old_raw:.3f}s x {norm:.3f})"
                   if norm != 1.0 else "")
            print(f"REGRESSION {name}: {t_old:.3f}s{adj} -> "
                  f"{t_new:.3f}s ({r:.2f}x)")

    # Cold-cost diff (VERDICT r13 #3): min-of-2 headline numbers exclude
    # session-artifact build costs, which land in run1 only. families_cold
    # (sum of FIRST runs per family) is where a memo that got cheaper to
    # read but costlier to BUILD shows up — at 100 TB the build IS the
    # job, so a cold regression is a real regression even when the warm
    # headline improves. Sentinel-normalized like the per-query gate;
    # informational (does not affect the exit code — cold run1s at sf0.1
    # carry JVM/session warmup noise the warm gate is designed to dodge).
    oc, nc = old.get("families_cold"), new.get("families_cold")
    if isinstance(oc, dict) and isinstance(nc, dict):
        print("\nfamilies_cold (sum of first runs, sentinel-normalized old):")
        for fam in sorted(set(oc) | set(nc)):
            a, b = oc.get(fam), nc.get(fam)
            if a is None or b is None:
                print(f"  {fam:5s} {'-' if a is None else round(a*norm,1)}"
                      f" -> {'-' if b is None else b}")
                continue
            an = a * norm
            flag = " <-- cold regression" if b > an * 1.3 and b - an > 3 else ""
            print(f"  {fam:5s} {an:7.1f}s -> {b:7.1f}s ({b/an:.2f}x){flag}")
        to, tn = sum(oc.values()) * norm, sum(nc.values())
        print(f"  total {to:7.1f}s -> {tn:7.1f}s ({tn/to:.2f}x)")

    ov, nv = old.get("value"), new.get("value")
    tot = (
        f"{ov:.1f}s -> {nv:.1f}s" if ov is not None and nv is not None else "(partial baseline)"
    )
    if ov is not None and nv is not None and norm != 1.0:
        tot += f" ({nv / (ov * norm):.2f}x sentinel-normalized)"
    print(f"\ntotal: {tot}; {len(regressions)} regression(s) over {ratio}x")

    if so or sn:
        def fmt(x):
            return (
                f"median {x[0]:.3f}s (min {x[1]:.3f}, max {x[2]:.3f})"
                if x else "none recorded"
            )
        print(f"sentinel old: {fmt(so)}")
        print(f"sentinel new: {fmt(sn)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
