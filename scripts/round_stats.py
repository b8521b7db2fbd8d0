#!/usr/bin/env python3
"""Round-closing counts FROM THE ARTIFACTS, not hand-typed (r13 verdict
#8: BASELINE.md's table said 201 queries / 242 tests while the tree
shipped 214 / 246 — doc drift that reads as a false claim).

Usage: python3 scripts/round_stats.py [verifyOutDir]

- queries / oracles: counted from the Verify output directory (one
  subdir per SparkEntry.queries entry; oracle_sql.json keys = oracleSql
  entries). Default dir: /tmp/out (run graft.Verify first).
- tests: `test(` call sites across src/test (AnyFunSuite registers one
  test per call, so this equals sbt's reported test count).
- envelope: query count and total seconds per SF section of
  BENCH_ENVELOPE.json.

Emits one JSON line — paste-ready for BASELINE.md's round table.
"""
import glob, json, os, re, sys


def main(out_dir="/tmp/out"):
    stats = {}
    if os.path.isdir(out_dir):
        qdirs = [d for d in glob.glob(f"{out_dir}/*/") if os.path.isdir(d)]
        stats["queries"] = len(qdirs)
        osql = f"{out_dir}/oracle_sql.json"
        if os.path.exists(osql):
            with open(osql) as f:
                stats["oracles"] = len(json.load(f))
    tests = 0
    suites = 0
    for p in glob.glob("src/test/scala/**/*.scala", recursive=True):
        with open(p) as f:
            src = f.read()
        n = len(re.findall(r'(?m)^\s*test\(', src))
        tests += n
        suites += 1 if n else 0
    stats["tests"] = tests
    stats["suites"] = suites
    if os.path.exists("BENCH_ENVELOPE.json"):
        with open("BENCH_ENVELOPE.json") as f:
            env = json.load(f)
        for k, v in env.items():
            if not k.endswith("_bytes") and isinstance(v, dict):
                stats[f"envelope_{k}_queries"] = len(v)
                stats[f"envelope_{k}_total_sec"] = round(sum(v.values()), 1)
        # paste-ready fragment for the BASELINE.md envelope table row —
        # the row is script-OWNED (r14 verdict #7: the r14 row was
        # hand-typed from a pre-q234 snapshot and drifted)
        frags = [
            f"{k}: {stats[f'envelope_{k}_total_sec']} s / "
            f"{stats[f'envelope_{k}_queries']} queries"
            for k in sorted(env)
            if not k.endswith("_bytes") and isinstance(env[k], dict)
        ]
        stats["envelope_row"] = "; ".join(frags)
    print(json.dumps(stats))


if __name__ == "__main__":
    main(*sys.argv[1:])
