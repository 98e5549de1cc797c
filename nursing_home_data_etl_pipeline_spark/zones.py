"""Five-zone (medallion) table layout.

The reference models table lifecycle as five S3 buckets — source (raw CSV),
staging (cleaned Parquet), transform (dimension-shaped Parquet), processed
(archived raw), error (quarantine) — declared at
``/root/reference/cloudformation/00_glue-iam-buckets.yml:13-36``. The engine
keeps the same zone semantics as a path convention ``{root}/{zone}/{domain}/``
over any Hadoop-compatible filesystem (local, S3A, HDFS); nothing below is
S3-specific.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

#: The reference's five buckets plus a ``warehouse`` zone — the engine
#: replaces the out-of-Spark Snowflake star schema (reference README.md
#: :183-282) with merged Parquet dims, so the warehouse becomes a sixth
#: path zone instead of an external system.
ZONES = ("source", "staging", "transform", "processed", "error", "warehouse")


@dataclass(frozen=True)
class ZoneLayout:
    """Path layout for one deployment root."""

    root: str
    zones: tuple[str, ...] = field(default=ZONES)

    def path(self, zone: str, domain: str | None = None) -> str:
        if zone not in self.zones:
            raise ValueError(f"unknown zone {zone!r}; expected one of {self.zones}")
        return f"{self.root}/{zone}/{domain}" if domain else f"{self.root}/{zone}"

    # Zone shorthands -----------------------------------------------------
    def source(self, domain: str | None = None) -> str:
        return self.path("source", domain)

    def staging(self, domain: str | None = None) -> str:
        return self.path("staging", domain)

    def transform(self, domain: str | None = None) -> str:
        return self.path("transform", domain)

    def processed(self, domain: str | None = None) -> str:
        return self.path("processed", domain)

    def error(self, domain: str | None = None) -> str:
        return self.path("error", domain)

    def warehouse(self, domain: str | None = None) -> str:
        return self.path("warehouse", domain)

    def list_domains(self, zone: str) -> list[str]:
        """Enumerate immediate child domains of a zone.

        Catalog discovery — the engine analog of the reference's
        ``list_objects_v2(Delimiter='/')`` prefix walk
        (``nh-etl-universal-cleaning.py:58-63``, ``move_sources_files.py:16-17``).
        Local-filesystem implementation; an object-store deployment swaps in a
        listing client behind the same signature.
        """
        base = Path(self.path(zone))
        if not base.exists():
            return []
        return sorted(p.name for p in base.iterdir() if p.is_dir())

    def ensure(self) -> None:
        for z in self.zones:
            os.makedirs(self.path(z), exist_ok=True)
