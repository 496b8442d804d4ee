#!/usr/bin/env python
"""2×-envelope breach check, gated on MEDIAN ratios only.

Usage:
    python scripts/bench_breach_check.py [current] [baseline]

Defaults: current = BENCH_local.json (written by bench.py, carries
per-query {med, iqr, runs} dispersion), baseline = BENCH_r01.json (the
standing baseline per BASELINE.md — the reference publishes no query
timings, so round 1's recording is the envelope anchor).

Verdict policy (BASELINE.md round-5 note): this sandbox shares a host
and sub-second queries swing 3-4× between sessions on unchanged code,
so a single-run ratio near 2× carries no signal. A query is reported
as a BREACH only when its MEDIAN exceeds 2× baseline; queries whose
IQR exceeds half their median are additionally tagged "unstable" so a
reader knows the median itself is soft. Exit code 1 iff any breach.
"""

from __future__ import annotations

import json
import os
import sys

ENVELOPE = 2.0
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def query_map(doc: dict) -> dict[str, float]:
    """Per-query seconds from either bench format: bench.py's own
    {"queries": {...}} or the driver's BENCH_r{N}.json, whose "tail"
    holds a (possibly truncated) stdout capture — recover every
    complete "q_name": float pair by regex; a name cut mid-token at
    the truncation boundary is dropped."""
    if doc.get("queries"):
        return dict(doc["queries"])
    import re

    tail = doc.get("tail", "")
    return {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q_[a-z0-9_]+)": ([0-9.]+)', tail)
    }


def main() -> int:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "BENCH_local.json")
    base_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "BENCH_r01.json")
    cur, base = load(cur_path), load(base_path)
    cur_q = query_map(cur)
    disp = cur.get("dispersion", {})
    base_q = query_map(base)

    shared = sorted(set(cur_q) & set(base_q))
    if not shared:
        print("no overlapping queries between current and baseline")
        return 1

    ratios = []
    breaches = []
    for name in shared:
        b = base_q[name]
        if not b:
            continue
        r = cur_q[name] / b
        d = disp.get(name, {})
        unstable = bool(d) and d.get("iqr", 0.0) > 0.5 * max(d.get("med", cur_q[name]), 1e-9)
        ratios.append(r)
        if r > ENVELOPE:
            breaches.append((name, r, unstable))

    ratios.sort()
    med_ratio = ratios[len(ratios) // 2]
    print(f"queries compared: {len(ratios)}  median ratio: {med_ratio:.2f}x")
    for name, r, unstable in sorted(breaches, key=lambda t: -t[1]):
        tag = " [unstable: iqr > med/2 — treat as noise candidate]" if unstable else ""
        print(f"BREACH {name}: {r:.2f}x{tag}")
    if not breaches:
        print("no median-ratio breaches of the 2x envelope")
    return 1 if breaches else 0


if __name__ == "__main__":
    sys.exit(main())
