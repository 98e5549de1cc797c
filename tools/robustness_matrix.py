"""One-command robustness matrix: the full 50-query oracle gate on every
axis (clean sfs, adversarial, derived skew/empty/single-row/all-dup/
reversed, cpus3, seeded fuzz incl. pinned class-discovery seeds); each
axis a subprocess so a JVM crash fails that axis only. Inventory: AXES
below; rationale: docs/TOOLS.md#robustness-matrix. Usage:
python tools/robustness_matrix.py [--out F] [--axes a,b] [--workdir D]
[--testdata D]; exit 0 iff every selected axis passes."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import adversarial_fixture as af  # noqa: E402
import fuzz_fixture as ff  # noqa: E402
from check_correctness import EXPECTED_CATALOG  # noqa: E402

AXIS_TIMEOUT_S = 1800

#: Fixed seeds for the randomized axes — arbitrary but PINNED, so the
#: matrix record is reproducible. Fresh seeds belong in ad-hoc sweeps
#: (python tools/fuzz_fixture.py N; python tools/check_correctness.py ...).
FUZZ_SEEDS = (101, 202, 303)


def axis_specs(testdata: str, workdir: str) -> dict[str, dict]:
    """name -> {build: fn|None, dir: path, env: extra-env}. Build lazily so
    --axes only pays for what it runs."""
    sf = {n: f"{testdata}/sf{n}" for n in ("0.001", "0.01", "0.1")}
    d = lambda name: os.path.join(workdir, name)  # noqa: E731
    return {
        "clean-sf0.001": {"dir": sf["0.001"]},
        "clean-sf0.01": {"dir": sf["0.01"]},
        "clean-sf0.1": {"dir": sf["0.1"]},
        "adversarial-sf0.001": {"dir": d("adv001"), "build": lambda p: af.build(sf["0.001"], p)},
        "adversarial-sf0.1": {"dir": d("adv1"), "build": lambda p: af.build(sf["0.1"], p)},
        "skew": {"dir": d("skew"), "build": lambda p: af.derive_skew(sf["0.001"], p)},
        "empty": {"dir": d("empty"), "build": lambda p: af.derive_empty(sf["0.001"], p)},
        "single-row": {"dir": d("single"), "build": lambda p: af.derive_single_row(sf["0.001"], p)},
        "all-duplicates": {"dir": d("alldup"), "build": lambda p: af.derive_all_duplicates(sf["0.001"], p)},
        "row-order-reversed": {"dir": d("reversed"), "build": lambda p: af.derive_reversed(sf["0.001"], p)},
        "cpus3": {"dir": sf["0.001"], "env": {"SPARK_GRAFT_CPUS": "3"}},
        **{
            f"fuzz-s{s}": {
                "dir": d(f"fuzz{s}"),
                "build": lambda p, s=s: ff.build(sf["0.001"], p, s),
            }
            for s in FUZZ_SEEDS
        },
        # axis 15 (round 9): pinned SHAPE-mutation seed — all-NULL
        # o_totalprice + duplicate-key orders; found the top-k ordering-
        # totality class (the dedup_exact re-delivery class from the same
        # sweep is pinned by its contract test)
        "fuzz-shape-s2028": {
            "dir": d("fuzzshape2028"),
            "build": lambda p: ff.build(sf["0.001"], p, 2028, shape=True),
        },
        # axis 16 (round 10): pinned CORR-sweep seed — all-identical texts
        # PLUS verbatim duplicate doc_ids; found the per-row shingle-window
        # class (a doc_id-partitioned LEAD window interleaves duplicate
        # copies' word positions into garbage shingles)
        "fuzz-corr-s4102": {
            "dir": d("fuzzcorr4102"),
            "build": lambda p: ff.build(sf["0.001"], p, 4102, shape=True,
                                        corr=True),
        },
        # axis 17 (round 11): pinned CORR-sweep seed — duplicated lineitem
        # rows whose group variance is exactly 0; found the decimal->double
        # CAST divergence (unscaled > 2^53 double-rounds differently per
        # engine; fixed by routing the cast through VARCHAR on both sides)
        "fuzz-corr-s5284": {
            "dir": d("fuzzcorr5284"),
            "build": lambda p: ff.build(sf["0.001"], p, 5284, shape=True,
                                        corr=True),
        },
    }


def run_axis(name: str, spec: dict, repo_root: str) -> dict:
    t0 = time.time()
    # Build INSIDE the axis's failure domain: a fixture-build crash used to
    # abort the whole matrix process — later axes never ran and --out was
    # never written, leaving a previous round's all-green record in place
    # (round-8 tooling review, execution-confirmed).
    if "build" in spec:
        try:
            spec["build"](spec["dir"])
        except Exception as ex:
            return {
                "status": "error",
                "dir": spec["dir"],
                "passed": 0,
                "failures": [f"fixture build failed: {ex!r:.300}"],
                "seconds": round(time.time() - t0, 1),
            }
    env = {**os.environ, **spec.get("env", {})}
    try:
        proc = subprocess.run(
            [sys.executable, "tools/check_correctness.py", spec["dir"]],
            capture_output=True, text=True, cwd=repo_root,
            env=env, timeout=AXIS_TIMEOUT_S,
        )
        out = proc.stdout
        rc = proc.returncode
    except subprocess.TimeoutExpired as ex:
        out = (ex.stdout or b"").decode(errors="replace") if isinstance(ex.stdout, bytes) else (ex.stdout or "")
        rc = -1
    failures = [
        line.split()[1].rstrip(":")
        for line in out.splitlines()
        if line.startswith("FAIL ")
    ]
    passed = sum(1 for line in out.splitlines() if line.startswith(("PASS", "ok?")))
    # rc != 0 with no FAIL lines = the gate itself died (JVM crash, timeout,
    # unknown query name) — never report that as green. A green exit that
    # checked fewer than the contractual 50 queries is ALSO not a pass
    # (defense in depth on top of the gate's own registry-count floor).
    status = "pass" if rc == 0 and passed == EXPECTED_CATALOG else (
        "fail" if failures else "error"
    )
    return {
        "status": status,
        "dir": spec["dir"],
        "passed": passed,
        "failures": failures,
        "seconds": round(time.time() - t0, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MATRIX.json")
    ap.add_argument("--axes", default=None, help="comma-separated subset")
    ap.add_argument("--workdir", default=None, help="fixture scratch dir")
    ap.add_argument("--testdata", default="/root/testdata")
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = args.workdir or tempfile.mkdtemp(prefix="matrix_")
    specs = axis_specs(args.testdata, workdir)
    names = args.axes.split(",") if args.axes else list(specs)
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"ERROR: unknown axes {unknown}; known: {list(specs)}")
        return 2

    record: dict = {"axes": {}}
    for name in names:
        res = run_axis(name, specs[name], repo_root)
        record["axes"][name] = res
        tail = "" if not res["failures"] else f" {res['failures']}"
        print(f"{res['status']:5s} {name:22s} {res['passed']:3d} green "
              f"({res['seconds']}s){tail}", flush=True)

    record["all_green"] = all(a["status"] == "pass" for a in record["axes"].values())
    with open(os.path.join(repo_root, args.out), "w") as f:
        json.dump(record, f, indent=1)
    print(f"\n{'ALL GREEN' if record['all_green'] else 'FAILURES'} -> {args.out}")
    return 0 if record["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
