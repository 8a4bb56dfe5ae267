#!/usr/bin/env python3
"""Freeze first-green per-query baselines into baseline_queries.json.

Reads a full bench record (default bench_out.json) and ADDS any query
missing from the ledger at its quiet-normalized time
(measured_sec * calib_ref / calib_sec). Existing entries are NEVER
rewritten -- the ledger is the frozen "first green" reference the 2x
regression bound (Bench's perf_weak stamp) compares against.

Usage: tools/freeze_baseline.py [bench_record.json] [--refreeze qNN,qNN,...]

--refreeze drops the named entries BEFORE the add pass, so they re-freeze
from this record. The one legitimate use is correcting an entry whose
first-green run carried a flagged calibration (measured under host load,
baseline inflated, the 2x alarm effectively sitting at 3-4x): pass a
CLEAN record and name the affected queries. Regular entries stay frozen.
"""
import json
import os
import sys

positional = []
refreeze = set()
argv = sys.argv[1:]
i = 0
while i < len(argv):
    if argv[i] == "--refreeze":
        refreeze = set(q.strip() for q in argv[i + 1].split(",") if q.strip())
        i += 2
    else:
        positional.append(argv[i])
        i += 1
bench_path = positional[0] if positional else "bench_out.json"
bench = json.load(open(bench_path))
ledger_path = "baseline_queries.json"

if os.path.exists(ledger_path):
    ledger = json.load(open(ledger_path))
else:
    ledger = {"calib_ref": 0.090, "sf": "sf0.1", "queries": {}}

calib = bench["extras"]["calib_sec"]
sf = os.path.basename(bench["sf"].rstrip("/"))
if sf != ledger["sf"]:
    sys.exit(f"refusing: bench sf '{sf}' != ledger sf '{ledger['sf']}'")
if calib <= 0:
    sys.exit("refusing: bench record has no positive calib_sec")

dropped = [q for q in refreeze if ledger["queries"].pop(q, None) is not None]
if dropped:
    print(f"re-freezing {len(dropped)}: " + ", ".join(sorted(dropped)))

added = []
for name, sec in bench["queries"].items():
    if sec < 0:
        continue  # errored query: no baseline until it runs green
    if name not in ledger["queries"]:
        ledger["queries"][name] = round(sec * ledger["calib_ref"] / calib, 4)
        added.append(name)

ledger["queries"] = dict(sorted(ledger["queries"].items()))
with open(ledger_path, "w") as f:
    json.dump(ledger, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"{len(added)} added, {len(ledger['queries'])} total "
      f"(calib {calib}, scale {ledger['calib_ref'] / calib:.3f}): "
      + ", ".join(added[:12]) + (" ..." if len(added) > 12 else ""))
