#!/usr/bin/env python3
"""Per-query diff of two bench records — surfaces regressions in the
round record without a manual A/B.

Accepts either format for each side:
  - a driver BENCH_r{N}.json ({"rc","tail","parsed",...}: per-query
    times are pulled from parsed.queries if present, else regex-mined
    from the captured tail: both the flushed {"query":...,"sec":...}
    lines and the legacy "name":[min,max] map entries)
  - a raw local bench log (one {"query":...} JSON line per query)

Usage: bench_diff.py OLD NEW [--flag 2.0] [--adjudicate [SF_DIR]]
Prints queries slower by more than the flag factor (default 2x),
new/gone queries, and totals. Exit code 1 if anything was flagged —
cron-able as a regression tripwire.

--adjudicate makes the tripwire self-adjudicating: every flagged
query is re-run k=3 times in ONE fresh in-session JVM
(graft.Bench with SPARK_GRAFT_BENCH_REPEAT=3 against SF_DIR,
default /root/testdata/sf0.1) and re-classified on the stable min —
REGRESSED if the re-measured min still exceeds flag x old,
NOISY otherwise (a contended-run artifact, not a code regression).
Exit code 1 only for REGRESSED queries, so a cron invocation no
longer needs a human to adjudicate sandbox contention spikes.
"""
import json
import os
import re
import subprocess
import sys


def full_record(path):
    """For a driver BENCH_r{N}.json, find the matching complete
    per-query sidecar (bench_full_r{N}.json) written by graft.Bench —
    the driver record keeps only a truncated stdout tail, so without
    the sidecar the diff covers a fraction of the suite."""
    m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    if not m:
        return None
    name = f"bench_full_r{m.group(1)}.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(os.path.dirname(os.path.abspath(path)), name),
                 os.path.join(repo, name)):
        if os.path.exists(cand):
            try:
                doc = json.load(open(cand))
            except ValueError:
                continue
            if isinstance(doc.get("queries"), dict):
                return {k: float(v) for k, v in doc["queries"].items()}
    return None


def parse(path):
    times = {}
    text = open(path).read()
    try:
        doc = json.loads(text)
    except ValueError:
        doc = None
    if isinstance(doc, dict) and isinstance(doc.get("queries"), dict) \
            and "tail" not in doc:
        # a bare bench_full sidecar passed directly
        return {k: float(v) for k, v in doc["queries"].items()}
    if isinstance(doc, dict) and "tail" in doc:
        full = full_record(path)
        if full:
            times.update(full)
        parsed = doc.get("parsed") or {}
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            times.update({k: float(v) for k, v in parsed["queries"].items()})
        blob = doc.get("tail") or ""
    else:
        blob = text
    for m in re.finditer(r'\{"query":"([a-z0-9_]+)","sec":([0-9.]+)', blob):
        times[m.group(1)] = float(m.group(2))
    for m in re.finditer(r'"([a-z0-9_]+)":\[([0-9.]+),[0-9.]+\]', blob):
        times.setdefault(m.group(1), float(m.group(2)))
    return times


def adjudicate(flagged, sf_dir, repeat=3):
    """Re-run the flagged queries in one fresh JVM, k runs each, and
    return {query: stable_min_seconds}. A query missing from the rerun
    output (e.g. renamed away) adjudicates as regressed-by-absence."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = " ".join(q for q, _, _ in flagged)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_REPEAT=str(repeat))
    proc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Bench {names}"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    remeasured = {}
    for m in re.finditer(r'\{"query":"([a-z0-9_]+)","sec":([0-9.]+)',
                         proc.stdout):
        remeasured[m.group(1)] = float(m.group(2))
    if not remeasured:
        sys.exit("adjudication rerun produced no per-query lines:\n"
                 + proc.stdout[-2000:] + proc.stderr[-500:])
    return remeasured


def main():
    argv = sys.argv[1:]
    flag = 2.0
    if "--flag" in argv:
        i = argv.index("--flag")
        flag = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]  # drop the flag AND its value
    adj_dir = None
    if "--adjudicate" in argv:
        i = argv.index("--adjudicate")
        has_val = i + 1 < len(argv) and not argv[i + 1].startswith("--") \
            and os.path.isdir(argv[i + 1])
        adj_dir = argv[i + 1] if has_val else "/root/testdata/sf0.1"
        argv = argv[:i] + argv[i + (2 if has_val else 1):]
    args = [a for a in argv if not a.startswith("--")]
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = parse(args[0]), parse(args[1])
    if not old or not new:
        sys.exit(f"no per-query data (old={len(old)}, new={len(new)} queries)")
    flagged = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        # ignore sub-100ms noise: a 0.02->0.05s "regression" is jitter
        if n > flag * o and n - o > 0.1:
            flagged.append((q, o, n))
            print(f"SLOWER  {q}: {o:.2f}s -> {n:.2f}s  (x{n / o:.1f})")
    for q in sorted(set(new) - set(old)):
        print(f"NEW     {q}: {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"GONE    {q} (was {old[q]:.2f}s)")
    both = set(old) & set(new)
    print(f"totals over {len(both)} shared queries: "
          f"{sum(old[q] for q in both):.1f}s -> {sum(new[q] for q in both):.1f}s; "
          f"{len(flagged)} flagged (>{flag}x and >0.1s)")
    if flagged and adj_dir:
        print(f"adjudicating {len(flagged)} flagged queries: "
              f"k=3 fresh-JVM reruns against {adj_dir} ...")
        remeasured = adjudicate(flagged, adj_dir)
        regressed = []
        for q, o, n in flagged:
            r = remeasured.get(q)
            if r is not None and (r <= flag * o or r - o <= 0.1):
                print(f"NOISY     {q}: {o:.2f}s -> {n:.2f}s, "
                      f"stable min {r:.2f}s (within {flag}x)")
            else:
                regressed.append(q)
                shown = "absent from rerun" if r is None else f"{r:.2f}s"
                print(f"REGRESSED {q}: {o:.2f}s -> {n:.2f}s, "
                      f"stable min {shown} (still >{flag}x)")
        print(f"adjudication: {len(regressed)} REGRESSED, "
              f"{len(flagged) - len(regressed)} NOISY")
        sys.exit(1 if regressed else 0)
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
