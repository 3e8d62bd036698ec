#!/usr/bin/env python3
"""Rewrite every `file:line` reference in COVERAGE.md from the source.

A query id's anchor line is where its string literal "q_..." appears in
src/main/scala (the Q(...) registration). Run after adding/moving
queries so the id -> file:line map never drifts.
"""
import re
import subprocess
import sys

out = subprocess.run(
    ["grep", "-rn", "--exclude=Bench.scala", '-e', r'"q_[a-z0-9_]*",',
     "src/main/scala"],
    capture_output=True, text=True).stdout
loc = {}
for line in out.splitlines():
    m = re.match(r'([^:]+):(\d+):\s*"(q_[a-z0-9_]+)",', line)
    if m:
        f, n, qid = m.group(1), int(m.group(2)), m.group(3)
        # the Q( sits one line above the name literal
        loc[qid] = f"{f}:{n - 1}"

text = open("COVERAGE.md").read()
fixed = 0
def repl(m):
    global fixed
    qid = m.group(1)
    if qid in loc and m.group(2) != loc[qid]:
        fixed += 1
        return f"| `{qid}` | `{loc[qid]}` |"
    return m.group(0)

text = re.sub(r"\| `(q_[a-z0-9_]+)` \| `([^`]+)` \|", repl, text)
open("COVERAGE.md", "w").write(text)
print(f"updated {fixed} refs; {len(loc)} ids known")
