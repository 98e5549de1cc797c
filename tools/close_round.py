"""Atomic round close (round-10 #4): ONE command on the FINAL tree
(refuses dirty), re-running every close artifact with the commit stamped
into each record. Steps (each a subprocess): matrix -> MATRIX_r{N}.json;
bench -> BENCH_warm_r{N}.json; parity (exact and --offload comparators
must AGREE over the full catalog at $SPARK_GRAFT_SF_DIR, r12 #4); ledger;
audit -> docs/EXPLAIN_AUDIT.md regenerated. Writes CLOSE_r{N}.json; exit
0 iff all green. Usage: python tools/close_round.py N [--warm 3]
[--skip matrix,bench,...]"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], timeout: int = 7200) -> tuple[int, str]:
    try:
        p = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=timeout,
                           env={**os.environ, "TZ": "UTC"})
        return p.returncode, p.stdout
    except subprocess.TimeoutExpired:
        return -1, ""


def close(n: int, warm: int, skip: set[str]) -> int:
    dirty = _run(["git", "status", "--porcelain"])[1].strip()
    if dirty:
        print(f"REFUSED: tree is dirty — commit first so the stamp is "
              f"meaningful:\n{dirty}")
        return 2
    commit = _run(["git", "rev-parse", "HEAD"])[1].strip()
    print(f"closing round {n} on {commit[:12]}", flush=True)

    def matrix():
        out = f"MATRIX_r{n:02d}.json"
        rc, _ = _run([sys.executable, "tools/robustness_matrix.py", "--out", out])
        path = os.path.join(REPO, out)
        if not os.path.exists(path):
            return False, f"{out} not written (rc={rc})"
        rec = json.load(open(path))
        rec["commit"] = commit
        json.dump(rec, open(path, "w"), indent=1)
        return rc == 0 and rec.get("all_green", False), out

    def bench():
        out = f"BENCH_warm_r{n:02d}.json"
        rc, stdout = _run([sys.executable, "bench.py", "--warm", str(warm)])
        line = next((ln for ln in reversed(stdout.splitlines())
                     if ln.startswith('{"metric"')), None)
        if line is None:
            return False, f"no JSON line (rc={rc})"
        rec = json.loads(line)
        rec["commit"] = commit
        json.dump(rec, open(os.path.join(REPO, out), "w"), indent=1)
        return rc == 0 and rec.get("errors") == 0, f"{out} total={rec['value']}s"

    def parity():
        sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        verdicts = {}
        for mode, extra in (("exact", []), ("offload", ["--offload"])):
            rc, stdout = _run(
                [sys.executable, "tools/check_correctness.py", sf] + extra)
            lines = stdout.replace("\r", "\n").splitlines()
            fails = sorted({ln.split()[1].rstrip(":") for ln in lines
                            if ln.startswith("FAIL")})
            # the trailing "N failures" summary proves the gate ran to
            # completion — a mid-run crash must not read as agreement
            done = any(ln.strip().endswith("failures")
                       or " failures:" in ln for ln in lines)
            verdicts[mode] = {"rc": rc, "fails": fails, "complete": done}
        ok = all(v["rc"] == 0 and not v["fails"] and v["complete"]
                 for v in verdicts.values())
        steps["parity_verdicts"] = verdicts
        disagree = sorted(set(verdicts["exact"]["fails"])
                          ^ set(verdicts["offload"]["fails"]))
        return ok, (f"sf={sf} both gates green" if ok else
                    f"sf={sf} disagree={disagree} verdicts={verdicts}")

    def ledger():
        rc, stdout = _run([sys.executable, "tools/loc_ledger.py"], timeout=120)
        if rc != 0:
            return False, f"rc={rc}"
        steps["ledger_counts"] = json.loads(stdout)
        return True, f"total={steps['ledger_counts']['total']}"

    def audit():
        rc, stdout = _run([sys.executable, "tools/explain_audit.py"])
        path = os.path.join(REPO, "docs", "EXPLAIN_AUDIT.md")
        if rc != 0 or not os.path.exists(path):
            return False, f"rc={rc}"
        text = open(path).read()
        # Round-11 #4: every catalog query pinned by name in
        # test_plan_expectations.py must be documented in the audit — the
        # audit is the only human-readable record that the plans are the
        # 100x-safe ones, and pinned-but-undocumented families drift.
        import re
        sys.path.insert(0, REPO)
        from nursing_home_data_etl_pipeline_spark.plans import catalog
        tsrc = open(os.path.join(REPO, "tests",
                                 "test_plan_expectations.py")).read()
        pinned = set(re.findall(r'"([a-z0-9_]{3,})"', tsrc)) & set(
            catalog.entries())
        documented = set(re.findall(r"^## (\w+)", text, re.M))
        missing = sorted(pinned - documented)
        if missing:
            return False, f"audit missing pinned plan families: {missing}"
        lines = text.splitlines()
        lines.insert(1, f"\nGenerated on commit `{commit}`.")
        open(path, "w").write("\n".join(lines))
        return True, stdout.strip().splitlines()[-1] if stdout else ""

    steps: dict[str, dict] = {}
    for name, fn in (("matrix", matrix), ("bench", bench),
                     ("parity", parity), ("ledger", ledger),
                     ("audit", audit)):
        if name in skip:
            steps[name] = {"status": "skipped"}
            continue
        t0 = time.time()
        try:
            ok, detail = fn()
        except Exception as ex:
            ok, detail = False, repr(ex)[:300]
        steps[name] = {"status": "pass" if ok else "fail", "detail": detail,
                       "seconds": round(time.time() - t0, 1)}
        print(f"{steps[name]['status']:5s} {name} "
              f"({steps[name]['seconds']}s) {detail}", flush=True)

    # A skipped step is NOT green: --skip closes used to stamp
    # all_green=true without ever running matrix/bench (ADVICE r10),
    # undercutting the atomic-close guarantee. `complete` records whether
    # every step actually ran.
    all_green = all(s["status"] == "pass"
                    for s in steps.values() if "status" in s)
    record = {"round": n, "commit": commit, "warm": warm, "steps": steps,
              "complete": not skip, "all_green": all_green}
    out = os.path.join(REPO, f"CLOSE_r{n:02d}.json")
    json.dump(record, open(out, "w"), indent=1)
    print(f"{'ALL GREEN' if all_green else 'FAILURES'} -> {out}")
    return 0 if all_green else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--skip", default="", help="comma-separated step names")
    args = ap.parse_args()
    return close(args.round, args.warm, {s for s in args.skip.split(",") if s})


if __name__ == "__main__":
    raise SystemExit(main())
