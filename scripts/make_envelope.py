#!/usr/bin/env python3
"""(Re)generate BENCH_ENVELOPE.json from bench output files.

Usage: python3 scripts/make_envelope.py sf0.01=/path/bench_sf001.json \
           sf0.1=/path/bench_sf01.json [...]

Each bench file is graft.Bench's SPARK_GRAFT_OUT (first line = full JSON
with the per-query "queries" min map). The envelope keeps, per query, the
MIN of the existing committed value and the new reading — a regeneration
on a noisy host can only leave envelopes alone or tighten them, never
ratchet them up. New queries simply get their first reading.
"""
import json, sys, os

ENVELOPE = os.path.join(os.path.dirname(__file__), "..", "BENCH_ENVELOPE.json")

def main(args):
    env = {}
    if os.path.exists(ENVELOPE):
        with open(ENVELOPE) as f:
            env = json.load(f)
    for a in args:
        sf, path = a.split("=", 1)
        with open(path) as f:
            bench = json.loads(f.readline())
        qs = bench["queries"]
        cur = env.setdefault(sf, {})
        for q, sec in qs.items():
            cur[q] = round(min(cur.get(q, float("inf")), sec), 4)
        # second dimension (r10): per-query shuffle bytes from the same
        # sweep, min-merged like time (improvements ratchet the envelope
        # down; the Bench/spec drift gates flag growth past 1.25x + 1 MiB)
        for q, b in bench.get("shuffle_bytes", {}).items():
            byt = env.setdefault(f"{sf}_bytes", {})
            byt[q] = int(min(byt.get(q, float("inf")), b))
    with open(ENVELOPE, "w") as f:
        json.dump({sf: dict(sorted(m.items())) for sf, m in sorted(env.items())},
                  f, indent=1)
        f.write("\n")
    for sf, m in env.items():
        print(f"{sf}: {len(m)} queries")

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
