"""Probe the driver testdata for physical-schema drift.

The testdata parquet is regenerated between rounds and its physical types
have already shifted once (events.ts: TIMESTAMP(NANOS) -> plain micros,
which Spark 4 infers as TIMESTAMP_NTZ — that silently broke every
epoch-arithmetic query and shifted streaming windows 1000x). This probe
prints, per scale factor and table, the row count and the parquet-level
column types (pyarrow, no Spark session needed — runs in ~1s), and flags
the drift-prone columns against the shapes the engine currently handles.

Run at round start:  python tools/testdata_probe.py [/root/testdata]
Exit code 1 on any flagged drift.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

#: column -> physical types the engine's readers are known to handle.
HANDLED = {
    ("events", "ts"): {
        "timestamp[ns]",  # nanosAsLong path
        "timestamp[us]",  # NTZ/LTZ normalize path
        "timestamp[us, tz=UTC]",
    },
    ("embeddings", "embedding"): {"list<element: float>", "list<item: float>"},
    ("documents", "text"): {"string", "large_string"},
}


def main(root: str = "/root/testdata") -> int:
    drift = 0
    for sf_dir in sorted(glob.glob(os.path.join(root, "sf*"))):
        print(f"== {sf_dir}")
        for path in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            table = os.path.splitext(os.path.basename(path))[0]
            f = pq.ParquetFile(path)
            cols = [(c.name, str(c.type)) for c in f.schema_arrow]
            print(f"  {table:12s} {f.metadata.num_rows:>9} rows  "
                  + ", ".join(f"{n}:{t}" for n, t in cols))
            for name, typ in cols:
                known = HANDLED.get((table, name))
                if known is not None and typ not in known:
                    drift += 1
                    print(f"  !! DRIFT {table}.{name} = {typ!r} "
                          f"not in handled set {sorted(known)}")
            # Semantic invariants the exact oracles assume. events.event_id
            # uniqueness backs the streaming-dedup contract (one surviving
            # row per key == SELECT * FROM events): a fixture generation
            # with duplicate ids would fail the correctness gate cryptically
            # — flag it here instead.
            if table == "events":
                ids = f.read(columns=["event_id"]).column("event_id")
                n_distinct = len(ids.unique())
                if n_distinct != len(ids):
                    drift += 1
                    print(f"  !! DRIFT events.event_id not unique "
                          f"({len(ids) - n_distinct} duplicate rows) — the "
                          "streaming_join_dedup oracle assumes uniqueness")
    if drift:
        print(f"{drift} drifted column(s) — check sources/readers.py "
              "normalization before trusting CORRECTNESS results")
    return 1 if drift else 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
