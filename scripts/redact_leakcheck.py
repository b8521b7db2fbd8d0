#!/usr/bin/env python3
"""Redact LEAKCHECK.json in place (r14 verdict #1, made mechanical).

The driver regenerates LEAKCHECK.json each round by walking `git log -p`;
every hit is a GITLOG-sourced recursively-escaped echo of one historical
hostname quoted by early-round artifacts, and committing the raw strings
doubles them in history next round. This script collapses every non-empty
hit category to {count, sources, sha256_of_sorted_hits, note} so the
committed file carries no raw hit string. Idempotent: a file that is
already redacted is left unchanged.

Usage: python3 scripts/redact_leakcheck.py [path]   (default LEAKCHECK.json)
Run as part of the round-closing workflow, right before the closing commit,
alongside scripts/round_stats.py.
"""
import hashlib
import json
import sys

NOTE = (
    "raw hit strings redacted in-tree (r13/r14 verdicts: every hit is a "
    "GITLOG-sourced recursively-escaped echo of one historical hostname "
    "quoted by early-round artifacts; live tree is clean). Redacted "
    "mechanically by scripts/redact_leakcheck.py."
)


def redact(path: str) -> None:
    with open(path) as f:
        data = json.load(f)

    if "hits_redacted" in data and "hits" not in data:
        print(f"{path}: already redacted ({data.get('n_hits', '?')} hits)")
        return

    hits = data.pop("hits", {})
    redacted = {}
    for category, entries in hits.items():
        if not entries:
            redacted[category] = []
            continue
        sources = sorted({e.split(":", 1)[0] for e in entries})
        digest = hashlib.sha256(
            "\n".join(sorted(entries)).encode("utf-8")
        ).hexdigest()
        redacted[category] = {
            "count": len(entries),
            "sources": sources,
            "sha256_of_sorted_hits": digest,
            "note": NOTE,
        }
    data["hits_redacted"] = redacted

    with open(path, "w") as f:
        json.dump(data, f, indent=1)
        f.write("\n")
    total = sum(
        v["count"] for v in redacted.values() if isinstance(v, dict)
    )
    print(f"{path}: redacted {total} raw hit strings")


if __name__ == "__main__":
    redact(sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK.json")
