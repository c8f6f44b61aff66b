#!/usr/bin/env python3
"""Paired analysis of the interleaved r15-vs-r16 bench A/B.

Pairs p2..p4 are the clean captures (p1 started while the warmup's
load was still draining; it is reported but excluded from the
verdict). For each query in the shared set, we compare the per-pair
deltas (r16 - r15) against the same-code swing band (max-min across a
side's own runs).
"""
import json, sys, glob, statistics

def load(tag):
    try:
        return json.load(open(f"/tmp/ab/out/{tag}.json"))
    except FileNotFoundError:
        return None

pairs = []
for p in ["p1", "p2", "p3", "p4"]:
    a, b = load(f"{p}_r15"), load(f"{p}_r16")
    if a and b:
        pairs.append((p, a, b))

if not pairs:
    sys.exit("no complete pairs yet")

shared = sorted(set(pairs[0][1]["queries"]) & set(pairs[0][2]["queries"]))
clean = [(p, a, b) for p, a, b in pairs if p != "p1"] or pairs

print(f"pairs complete: {[p for p,_,_ in pairs]}; verdict uses {[p for p,_,_ in clean]}")
print(f"shared queries: {len(shared)}")
for p, a, b in pairs:
    t15 = sum(a["queries"][q] for q in shared if a["queries"][q] >= 0)
    t16 = sum(b["queries"][q] for q in shared if b["queries"][q] >= 0)
    f15 = [q for q in shared if a["queries"][q] < 0]
    f16 = [q for q in shared if b["queries"][q] < 0]
    print(f"{p}: r15 {t15:8.1f}s (load {a['load_before']:.2f})  "
          f"r16 {t16:8.1f}s (load {b['load_before']:.2f})  "
          f"ratio {t16/t15:.3f}  fails r15={f15} r16={f16}")

# per-query: median per side over clean pairs, paired deltas,
# same-side swing
rows = []
for q in shared:
    v15 = [a["queries"][q] for _, a, _ in clean if a["queries"][q] >= 0]
    v16 = [b["queries"][q] for _, _, b in clean if b["queries"][q] >= 0]
    if not v15 or not v16:
        continue
    m15, m16 = statistics.median(v15), statistics.median(v16)
    swing = max(max(v15) - min(v15), max(v16) - min(v16))
    deltas = [b["queries"][q] - a["queries"][q] for _, a, b in clean
              if a["queries"][q] >= 0 and b["queries"][q] >= 0]
    # signal: every paired delta exceeds the same-side swing, same sign
    consistent = (all(d > swing for d in deltas) or
                  all(d < -swing for d in deltas))
    rows.append((q, m15, m16, m16 - m15, swing, consistent, deltas))

tot15 = sum(r[1] for r in rows)
tot16 = sum(r[2] for r in rows)
print(f"\nclean-pair medians: r15 {tot15:.1f}s  r16 {tot16:.1f}s  "
      f"ratio {tot16/tot15:.3f}")

sig = [r for r in rows if r[5] and abs(r[3]) > 0.15]
print(f"\nqueries whose per-pair delta consistently exceeds the "
      f"same-code swing band (|median delta| > 0.15s): {len(sig)}")
for q, m15, m16, d, swing, _, deltas in sorted(sig, key=lambda r: -abs(r[3]))[:20]:
    print(f"  {q:45s} r15 {m15:7.2f}  r16 {m16:7.2f}  "
          f"delta {d:+6.2f}  swing {swing:5.2f}  pairs {['%+.2f'%x for x in deltas]}")

# biggest absolute deltas regardless of significance, for the record
print("\ntop-10 absolute median deltas (signal or noise):")
for q, m15, m16, d, swing, cons, deltas in sorted(rows, key=lambda r: -abs(r[3]))[:10]:
    print(f"  {q:45s} r15 {m15:7.2f}  r16 {m16:7.2f}  delta {d:+6.2f}  "
          f"swing {swing:5.2f}  consistent={cons}")
