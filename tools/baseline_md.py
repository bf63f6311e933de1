#!/usr/bin/env python3
"""Regenerate BASELINE.md's in-suite table from BENCH_FULL.json.

Keeps everything above the '## In-suite table' header (methodology +
drift notes) verbatim; rewrites the header line, the table, and prints
the old-vs-new common-gate drift for the closing prose (which the
operator edits by hand — it is a judgment note, not a number dump).
"""
import json, re, sys, datetime

bench = json.load(open("BENCH_FULL.json"))
qs = bench["queries"]
total = bench["value"]

src = open("BASELINE.md").read()
head, _, rest = src.partition("## In-suite table")
if not rest:
    sys.exit("BASELINE.md: '## In-suite table' header not found")

# old table for the drift note
old = dict(re.findall(r"^\| (q\S+) \| ([0-9.]+) \|$", rest, re.M))
common = set(old) & set(qs)
if common:
    o = sum(float(old[k]) for k in common)
    n = sum(qs[k] for k in common)
    print(f"common {len(common)} gates: old {o:.1f} s, new {n:.1f} s "
          f"(drift {n / o:.2f}x)")

date = datetime.date.today().isoformat()
table = "\n".join(f"| {k} | {qs[k]:.3f} |" for k in sorted(qs))
tail_prose = rest.partition("**Total:")[2]
if not tail_prose:
    sys.exit("BASELINE.md: closing '**Total:' prose not found — refusing "
             "to regenerate (would silently drop the hand-written note)")
closing = "**Total:" + tail_prose
out = (f"{head}## In-suite table (sf0.1, {len(qs)} gates, "
       f"total {total:.1f} s, recorded {date})\n\n"
       f"| gate | sec |\n|---|---|\n{table}\n\n{closing}")
open("BASELINE.md", "w").write(out)
print(f"wrote table: {len(qs)} gates, total {total:.1f} s")
