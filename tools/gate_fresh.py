#!/usr/bin/env python3
"""Gate-freshness check: every `SparkEntry.queries` key in the SOURCE
must have a green row in the committed CLOSE_GATE.json.

This is the enforcement half of the round-close rule (SURVEY §7): the
r9 and r10 rounds each shipped entries AFTER the last green close_gate
run, leaving them outside any committed gate record until a judge
re-run. close_gate.py makes an empty/partial record impossible to
close on; THIS check makes a STALE record impossible to close on — a
queries key with no (or a failed) CLOSE_GATE row fails the round.

Key extraction is textual ("<key>" -> ((s: SparkSession) over
src/main/scala/graft/queries/*.scala — the one registration idiom every
entry uses; SparkEntry.queries is the union of those maps.

Usage: python3 tools/gate_fresh.py            # repo root
Exits non-zero listing ungated or failed keys.
"""
import json, os, re, sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
qdir = os.path.join(repo, "src/main/scala/graft/queries")
pat = re.compile(r'"([a-z0-9_]+)"\s*->\s*\(\(s\s*:\s*SparkSession')

keys = set()
for f in os.listdir(qdir):
    if f.endswith(".scala"):
        keys |= set(pat.findall(open(os.path.join(qdir, f)).read()))
if not keys:
    print("GATE FRESHNESS FAIL: no queries keys found under", qdir)
    sys.exit(1)

gate = json.load(open(os.path.join(repo, "CLOSE_GATE.json")))["queries"]
ungated = sorted(k for k in keys if k not in gate)
red = sorted(k for k in keys if k in gate and not (
    gate[k].get("ok", False) or
    (gate[k].get("rows_match", False) and gate[k].get("schema_match", False)
     and gate[k].get("values_match", False))))
# Fail-CLOSED against extraction rot: the gate's key list is RUNTIME
# truth (close_gate reads it from a Verify dump of SparkEntry.queries).
# A gate row whose key the source regex cannot find means either the
# registration idiom drifted past the regex (fix the regex — otherwise
# future keys in that idiom silently escape this very check) or the
# entry was removed after the gate ran (gate is stale). Either way the
# round must not close on it.
unextracted = sorted(k for k in gate if k not in keys)
print(f"{len(keys)} queries keys in source, {len(gate)} rows in CLOSE_GATE.json")
if ungated or red or unextracted:
    if ungated:
        print("GATE FRESHNESS FAIL — keys with NO gate row (gate is stale,"
              " re-run Verify + close_gate at HEAD):", ungated)
    if red:
        print("GATE FRESHNESS FAIL — keys with a FAILED gate row:", red)
    if unextracted:
        print("GATE FRESHNESS FAIL — gate rows with no extractable source"
              " key (registration idiom escaped the regex, or the entry was"
              " removed after the gate ran):", unextracted)
    sys.exit(1)
print("GATE FRESHNESS OK: every queries key has a green CLOSE_GATE row"
      " and every gate row maps back to a source key")
