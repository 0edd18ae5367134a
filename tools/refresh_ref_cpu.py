#!/usr/bin/env python3
"""Refresh the committed quiet-host per-query CPU map (the classpath
resource graft.Bench reads to self-report contamination).

Usage: python3 tools/refresh_ref_cpu.py <bench_json>... [--rebase q1,q2]

Merges the given Bench artifacts (full-line JSON with a "cpu" map) into
src/main/resources/graft/bench_ref_cpu.json:
  - existing queries keep min(committed, observed...) — the map is a
    quiet-host FLOOR, so a faster reading tightens it and a slower one
    (contended run) never loosens it;
  - brand-new queries enter at their observed min;
  - --rebase queries take the observed min even if HIGHER than the
    committed value (for operators whose plan legitimately changed —
    e.g. a serial pass parallelized: wall down, cpu up).
Prints a summary of every change.
"""
import json
import sys

RES = "src/main/resources/graft/bench_ref_cpu.json"


def main(argv):
    rebase = set()
    paths = []
    i = 0
    while i < len(argv):
        if argv[i] == "--rebase":
            i += 1
            rebase |= set(argv[i].split(","))
        else:
            paths.append(argv[i])
        i += 1
    ref = json.load(open(RES))
    obs = {}
    for p in paths:
        art = json.load(open(p))
        for q, c in art.get("cpu", {}).items():
            c = float(c)
            if q not in obs or c < obs[q]:
                obs[q] = c
    n_new = n_tight = n_rebase = 0
    for q, c in sorted(obs.items()):
        if q not in ref:
            ref[q] = c
            n_new += 1
            print(f"new     {q}: {c:.3f}")
        elif q in rebase:
            if ref[q] != c:
                print(f"rebase  {q}: {ref[q]:.3f} -> {c:.3f}")
                ref[q] = c
                n_rebase += 1
        elif c < ref[q]:
            print(f"tighten {q}: {ref[q]:.3f} -> {c:.3f}")
            ref[q] = c
            n_tight += 1
    dropped = [q for q in ref if q not in obs]
    with open(RES, "w") as f:
        json.dump({k: round(v, 3) for k, v in sorted(ref.items())}, f,
                  indent=0)
        f.write("\n")
    print(f"\n{len(ref)} entries ({n_new} new, {n_tight} tightened, "
          f"{n_rebase} rebased; {len(dropped)} committed-only kept)")


if __name__ == "__main__":
    main(sys.argv[1:])
