#!/usr/bin/env python3
"""Per-query bench comparison: current run vs previous round vs committed base.

Usage:
    python3 tools/bench_diff.py [CURRENT] [PREVIOUS] [--base=BENCH_BASE.json]

CURRENT defaults to BENCH_LOCAL.json, PREVIOUS to the highest BENCH_r*.json.
Accepts any mix of artifact shapes: BENCH_LOCAL.json (full names, full
precision), BENCH_BASE.json ({"queries": {...}}), or the driver's
BENCH_r{N}.json (a "tail" of truncated stdout with short q-keys). Queries are
joined on the short key (the leading "qNN"), so short- and full-name sources
line up. Rows print slowest-current first with the current run's `suspect`
annotations, so a verdict (or the driver) reads regressions off one table
instead of re-deriving deltas from raw tails.
"""
import glob
import re
import sys


def short(name):
    m = re.match(r"(q\d+)", name)
    return m.group(1) if m else name


def load(path):
    """-> (times: {shortkey: sec}, suspects: {shortkey}) from any artifact shape."""
    with open(path) as f:
        txt = f.read()
    # the driver's BENCH_r{N}.json embeds the stdout tail as a JSON string,
    # so the query keys arrive quote-ESCAPED (\"q112\") — unescape before
    # matching or every prev column reads "-"
    txt = txt.replace('\\"', '"')
    times, suspects = {}, set()
    # suspect list: last "suspect":[...] wins (full line overrides tail echo)
    for m in re.finditer(r'"suspect"\s*:\s*\[([^\]]*)\]', txt):
        suspects = {short(q) for q in re.findall(r'"([^"]+)"', m.group(1))}
    # per-query seconds: every "qNN...": <number> pair outside the suspect
    # list; first occurrence wins (BENCH_LOCAL's full line precedes echoes)
    body = re.sub(r'"suspect"\s*:\s*\[[^\]]*\]', "", txt)
    for m in re.finditer(r'"(q\d+[a-z0-9_]*)"\s*:\s*(-?[0-9][0-9.eE+-]*)', body):
        times.setdefault(short(m.group(1)), float(m.group(2)))
    return times, suspects


def fmt(v):
    return f"{v:8.3f}" if v is not None else f"{'-':>8}"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base_path = "BENCH_BASE.json"
    for a in sys.argv[1:]:
        if a.startswith("--base="):
            base_path = a.split("=", 1)[1]
    cur_path = args[0] if len(args) > 0 else "BENCH_LOCAL.json"
    if len(args) > 1:
        prev_path = args[1]
    else:
        rounds = sorted(glob.glob("BENCH_r*.json"))
        prev_path = rounds[-1] if rounds else None

    cur, cur_sus = load(cur_path)
    prev, _ = load(prev_path) if prev_path else ({}, set())
    base, _ = load(base_path)

    print(f"# bench_diff: cur={cur_path} prev={prev_path} base={base_path}")
    print(f"{'query':6} {'cur':>8} {'prev':>8} {'base':>8} {'cur/base':>8}  flags")
    tot_c = 0.0
    flagged = []
    for q, c in sorted(cur.items(), key=lambda kv: -kv[1]):
        p, b = prev.get(q), base.get(q)
        tot_c += c
        flags = []
        if q in cur_sus:
            flags.append("SUSPECT")  # the run itself flagged contention
        elif b is not None and c > max(3.0 * b, b + 1.0):
            flags.append("over-base")  # guard-level regression
        if b is None:
            flags.append("new")
        if flags:
            flagged.append(q)
        ratio = f"{c / b:8.2f}" if b else f"{'-':>8}"
        print(f"{q:6} {fmt(c)} {fmt(p)} {fmt(b)} {ratio}  {' '.join(flags)}")
    n_prev = sum(v for q, v in prev.items() if q in cur)
    n_base = sum(v for q, v in base.items() if q in cur)
    print(f"\ntotal  {tot_c:8.3f} (prev common {n_prev:.3f}, "
          f"base common {n_base:.3f}); flagged: {flagged or 'none'}")


if __name__ == "__main__":
    main()
