#!/usr/bin/env python3
"""Reconstruct the per-query map from a positional BENCH_r{N}.json.

The bench's last-tier headline carries per-query integer-ms values as
a positional array in lexicographic name order plus "qsha" — the
first 8 bytes of sha256 over the sorted name list joined by '\n'.
This script re-derives the name list (from graft.Names or a saved
names file), VERIFIES the digest, and prints the name→ms map — so a
driver artifact is decodable and its alignment provable even though
the ~2000-char retained tail cannot hold 300 names.

Usage: python3 tools/bench_names.py BENCH_rNN.json [names_file]
"""
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def names(names_file):
    if names_file:
        lines = open(names_file).read().splitlines()
    else:
        out = subprocess.run(
            ["bash", os.path.join(REPO, "tools", "run_main.sh"),
             "graft.Names"],
            capture_output=True, text=True, check=True)
        lines = out.stdout.splitlines()
    return [ln.split("\t")[0] for ln in lines if ln.strip()]


def main():
    bench = json.load(open(sys.argv[1]))
    parsed = bench.get("parsed", bench)
    qms = parsed.get("qms")
    if not qms:
        sys.exit("no positional qms array in this artifact "
                 "(named map present? nothing to reconstruct)")
    ns = sorted(names(sys.argv[2] if len(sys.argv) > 2 else None))
    if len(ns) != parsed.get("qn"):
        sys.exit(f"registry size {len(ns)} != artifact qn "
                 f"{parsed.get('qn')} — wrong checkout for this run")
    digest = hashlib.sha256("\n".join(ns).encode()).hexdigest()[:16]
    qsha = parsed.get("qsha")
    if qsha and qsha != digest:
        sys.exit(f"qsha mismatch: artifact {qsha} vs registry {digest} "
                 f"— the checkout's registry is NOT the one benched")
    verdict = "verified" if qsha else "UNVERIFIED (pre-r13 artifact)"
    print(json.dumps({
        "qsha": qsha, "alignment": verdict,
        "queries": {n: ms for n, ms in zip(ns, qms)},
    }, indent=None))


if __name__ == "__main__":
    main()
