#!/usr/bin/env python3
"""Growth-exponent fit across three scale decades (r12 verdict item 6).

Given per-query timings at sf0.1 (BENCH_FULL), sf1 (BENCH_SF1, 10x) and
sf3 (30x, synthesized by ScaleUp factor 30), fit per-entry growth
exponents on each decade:

    e_01_1 = log(t_1 / t_01) / log(10)
    e_1_3  = log(t_3 / t_1)  / log(3)

An entry that is linear in data volume shows e <= ~1 once per-query
fixed overhead (plan/launch, ~0.2-0.4 s) stops dominating; a quadratic
term invisible between sf0.1 and sf1 shows its exponent in the second
decade. Fixed overhead is subtracted via --overhead (default 0.25 s,
the measured empty-plan launch cost) and floored at 0.05 s.

    python3 tools/scale_fit.py BENCH_FULL.json BENCH_SF1.json BENCH_SF3.json [names...]
"""
import json, math, sys


def load(path):
    return json.load(open(path))["queries"]


def main(argv):
    overhead = 0.25
    if argv and argv[0] == "--overhead":
        overhead = float(argv[1]); argv = argv[2:]
    q01, q1, q3 = load(argv[0]), load(argv[1]), load(argv[2])
    names = argv[3:] or sorted(set(q3) & set(q1) & set(q01))
    rows = []
    for n in names:
        if n not in q01 or n not in q1 or n not in q3:
            continue
        t01 = max(q01[n] - overhead, 0.05)
        t1 = max(q1[n] - overhead, 0.05)
        t3 = max(q3[n] - overhead, 0.05)
        e01 = math.log(t1 / t01) / math.log(10)
        e13 = math.log(t3 / t1) / math.log(3)
        rows.append((n, q01[n], q1[n], q3[n], e01, e13))
    rows.sort(key=lambda r: -r[5])
    print(f"{'entry':34s} {'sf0.1':>7s} {'sf1':>7s} {'sf3':>7s} {'e(.1-1)':>8s} {'e(1-3)':>8s}")
    for n, a, b, c, e01, e13 in rows:
        flag = "  <-- super-linear tail" if e13 > 1.3 else ""
        print(f"{n:34s} {a:7.2f} {b:7.2f} {c:7.2f} {e01:8.2f} {e13:8.2f}{flag}")
    bad = [r[0] for r in rows if r[5] > 1.3]
    print(f"\n{len(rows)} entries fitted; {len(bad)} with e(1-3) > 1.3: {bad}")


if __name__ == "__main__":
    main(sys.argv[1:])
