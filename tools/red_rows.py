#!/usr/bin/env python3
"""Round-start tripwire: scan the LATEST CORRECTNESS_r*.json in the repo
root and print every red row (any of rows/schema/hash false, or err set).
Exit 1 if any exist — run this FIRST each round so a driver-side red row
can never again go unnoticed for a whole round (g_assortativity sat red
through rounds 10-11 because nothing surfaced it).
Usage: red_rows.py [repo_root]
"""
import sys, os, re, json, glob

root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
files = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
if not files:
    print("no CORRECTNESS_r*.json found")
    sys.exit(0)
latest = max(files, key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
board = json.load(open(latest))
red = {n: v for n, v in board.items()
       if not (v.get("rows_match") and v.get("schema_match")
               and v.get("hash_match")) or v.get("err")}
print(f"{os.path.basename(latest)}: {len(board)} rows, {len(red)} red")
for n, v in sorted(red.items()):
    flags = ",".join(k for k in ("rows_match", "schema_match", "hash_match")
                     if not v.get(k))
    print(f"  RED {n}: fail[{flags}] err={v.get('err')}")
sys.exit(1 if red else 0)
