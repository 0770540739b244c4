#!/usr/bin/env python3
"""Red-suite tripwire (r11 verdict Next #2): a snapshot commit may never
carry a red test again.

Usage: python3 tools/tripwire.py <sbt-test-log> [...more logs]

Run `sbt -batch test > /tmp/sbt_test.log 2>&1` and point this at the
log BEFORE committing an end-of-round snapshot. Exits non-zero (prints
RED + why) unless the log proves a fully green run:

  - a ScalaTest summary line `Tests: succeeded N, failed M, ...` must
    be present (a run that died mid-suite has no summary — that is RED,
    not unknown),
  - `failed` and `canceled` must be 0 on the LAST summary line,
  - the suites line `Suites: completed X, aborted Y` must show 0
    aborted (an aborted suite's tests never counted as failed),
  - sbt's terminal marker must be `[success]`, not `[error]`
    (compile errors produce no summary at all).

With multiple logs every one must be green.
"""
import re
import sys


def check(path):
    try:
        with open(path, errors="replace") as f:
            text = f.read()
    except OSError as e:
        return [f"cannot read log: {e}"]
    problems = []
    summaries = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), "
        r"ignored (\d+), pending (\d+)", text)
    if not summaries:
        problems.append("no ScalaTest summary line — the run never finished")
    else:
        ok, failed, canceled, ignored, pending = map(int, summaries[-1])
        if failed:
            problems.append(f"{failed} FAILED test(s) (succeeded {ok})")
        if canceled:
            problems.append(f"{canceled} canceled test(s)")
        # zero tests executed is RED, not green: a bad testOnly filter or
        # discovery misconfiguration still prints a summary + [success],
        # and that is exactly the red-slips-through mode this tool exists
        # to prevent (r12 review find). Canceled runs skip this second
        # diagnosis (already reported red above), but an ALL-IGNORED run
        # (ok=0, failed=0, canceled=0, ignored>0) must be red too —
        # nothing else flags it (r13 advice).
        if not ok and not failed and not canceled:
            if ignored:
                problems.append(
                    f"0 tests executed, {ignored} ignored — all-ignored "
                    "run proves nothing")
            else:
                problems.append("0 tests executed — wrong command or filter?")
        if not failed and not canceled and ok:
            print(f"  {path}: {ok} succeeded, 0 failed, 0 canceled "
                  f"({ignored} ignored, {pending} pending)")
    suites = re.findall(r"Suites: completed (\d+), aborted (\d+)", text)
    if suites and int(suites[-1][1]):
        problems.append(f"{suites[-1][1]} ABORTED suite(s)")
    # the last sbt status marker must be [success]
    marks = re.findall(r"^\[(success|error)\]", text, re.M)
    if not marks:
        problems.append("no sbt [success]/[error] marker — log truncated?")
    elif marks[-1] == "error":
        problems.append("sbt ended with [error]")
    # the [error]-line scrape is DIAGNOSIS for a run the checks above
    # already judged red, not an independent gate: sbt forwards forked
    # stderr at [error] level, so a green run's log can legitimately
    # carry '[error] graft.X' lines (expected exception toStrings from
    # fault-injection fixtures) — flagging on them alone would block a
    # green snapshot (r12 review find)
    if problems:
        failed_tests = re.findall(r"\[error\]\s+(graft\.\S+)", text)
        if failed_tests:
            problems.append(
                "failing: " + ", ".join(sorted(set(failed_tests))[:10]))
    return problems


def main(paths):
    if not paths:
        print("usage: tripwire.py <sbt-test-log> [...]", file=sys.stderr)
        return 2
    red = 0
    for p in paths:
        probs = check(p)
        for msg in probs:
            print(f"RED   {p}: {msg}")
        red += bool(probs)
    if red:
        print(f"\nTRIPWIRE RED — {red} log(s) not green; do NOT snapshot")
        return 1
    print("\nTRIPWIRE GREEN — suite fully green, snapshot may proceed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
