#!/usr/bin/env python3
"""Scale-probe ratio gate (dev tool, paired with tools/scale_probe.sh).

Compares a full-suite bench at 10x data (ScaleUp'd sf1) against the same
round's sf0.1 bench, and optionally against the PRIOR round's pair to
catch growth-rate regressions the per-round sf0.1 bench can't see.

    python3 tools/scale_ratio.py SF01.json SF1.json [PRIOR_SF01.json PRIOR_SF1.json]

Flags (exit 1 if any):
  - ratio > 15x at 10x data AND sf1 time > 1s  (superlinear red line)
  - ratio-of-ratios > 2x vs the prior round AND sf1 time > 1s
    (an entry whose growth RATE doubled round-over-round)
Sub-second sf1 entries are never flagged: at that size the "ratio" is
session/JIT noise, not an asymptote.
"""
import sys, json

def qmap(path):
    return json.load(open(path))["queries"]

def main():
    sf01, sf1 = qmap(sys.argv[1]), qmap(sys.argv[2])
    prior = None
    if len(sys.argv) > 4:
        p01, p1 = qmap(sys.argv[3]), qmap(sys.argv[4])
        prior = {q: p1[q] / p01[q] for q in p1 if q in p01 and p01[q] > 0 and p1[q] > 0}
    ratios = {q: sf1[q] / sf01[q] for q in sf1
              if q in sf01 and sf01[q] > 0 and sf1[q] > 0}
    flags = []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if sf1[q] <= 1.0:
            continue
        if r > 15:
            flags.append(f"{q}: {r:.1f}x at 10x data (sf1 {sf1[q]:.1f}s) — superlinear")
        elif prior and q in prior and prior[q] > 0 and r / prior[q] > 2:
            flags.append(f"{q}: growth rate {prior[q]:.1f}x -> {r:.1f}x round-over-round")
    t01 = sum(v for v in sf01.values() if v > 0)
    t1 = sum(v for v in sf1.values() if v > 0)
    print(f"suite: sf0.1 {t01:.1f}s -> sf1 {t1:.1f}s ({t1 / t01:.2f}x at 10x data, "
          f"{len(ratios)} comparable entries)")
    print("top ratios:")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {q:32s} {r:5.1f}x  ({sf01[q]:.2f}s -> {sf1[q]:.2f}s)")
    if flags:
        print("\nFLAGS:")
        for f in flags:
            print("  " + f)
        sys.exit(1)
    print("\nno flags")

if __name__ == "__main__":
    main()
