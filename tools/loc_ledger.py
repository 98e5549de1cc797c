"""Generated LoC ledger (round-9 #3a) — one JSON line; paste the numbers,
don't type them. product = package + bench.py + __spark_entry__.py (what
ships); tools = tools/*.py (judged separately); total = all non-test."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "nursing_home_data_etl_pipeline_spark"


def _count(path: str) -> int:
    with open(path, encoding="utf-8") as f:
        return sum(1 for _ in f)


def collect() -> dict:
    product, tools, per_file = 0, 0, {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                n = _count(p)
                product += n
                per_file[os.path.relpath(p, REPO)] = n
    for f in ("bench.py", "__spark_entry__.py"):
        n = _count(os.path.join(REPO, f))
        product += n
        per_file[f] = n
    tdir = os.path.join(REPO, "tools")
    for f in sorted(os.listdir(tdir)):
        if f.endswith(".py"):
            n = _count(os.path.join(tdir, f))
            tools += n
            per_file[f"tools/{f}"] = n
    top = dict(sorted(per_file.items(), key=lambda kv: -kv[1])[:8])
    return {"product": product, "tools": tools, "total": product + tools,
            "top_files": top}


if __name__ == "__main__":
    json.dump(collect(), sys.stdout, separators=(",", ":"))
    print()
