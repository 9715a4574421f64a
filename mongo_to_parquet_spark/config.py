"""Reference-compatible job configuration.

Mirrors the reference's ``AppConfig`` (reference main.py:15-43) with its
bugs fixed, semantics kept:

  - ``include_databases`` XOR ``exclude_databases`` (main.py:35-36) — kept.
  - ``batch_size`` — the reference reads the misspelled key ``"bacth_size"``
    (main.py:31) so the documented knob is dead; here the correct spelling
    works and the misspelling is still honored for old configs.
  - global ``start_date``/``end_date`` ISO-8601 strings, inclusive on both
    ends (main.py:25-26,40-43,291,293).
  - ``date_collections``: flat ``{collection: date_field}`` map (main.py:38).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path


def _parse_date(value: str | None) -> datetime | None:
    """ISO-8601 → datetime; None-safe (reference main.py:40-43)."""
    return datetime.fromisoformat(value) if value else None


@dataclass
class JobConfig:
    mongo_uri: str = "mongodb://localhost:27017"
    output_dir: str = "./output"
    start_date: datetime | None = None
    end_date: datetime | None = None
    include_databases: list[str] = field(default_factory=list)
    exclude_databases: list[str] = field(default_factory=list)
    date_collections: dict[str, str] = field(default_factory=dict)
    batch_size: int = 10_000          # reference default (main.py:31,301)
    row_group_size: int = 400_000     # write buffer / row group (main.py:32)
    #: file roll point. The reference has no independent knob — it rolls at
    #: row_group_size × 10 (main.py:225 ``rows_in_file >= self.row_group_size
    #: * 10``), so None derives exactly that; pass a value to override.
    max_rows_per_file: int | None = None
    compression: str = "zstd"         # (main.py:23)

    def __post_init__(self) -> None:
        if self.include_databases and self.exclude_databases:
            # reference main.py:35-36 — mutually exclusive, validated
            raise ValueError("include_databases and exclude_databases are mutually exclusive")
        if self.max_rows_per_file is None:
            # reference semantics: roll point follows the row-group knob
            self.max_rows_per_file = self.row_group_size * 10

    @classmethod
    def from_json(cls, path: str | Path) -> "JobConfig":
        raw = json.loads(Path(path).read_text())
        # honor the reference's misspelled key for old configs, but prefer
        # the correct one (the reference does the opposite: only the typo works)
        if "bacth_size" in raw and "batch_size" not in raw:
            raw["batch_size"] = raw.pop("bacth_size")
        raw.pop("bacth_size", None)
        # reference configs address Mongo as host+port (main.py:20-21), not
        # a URI — synthesize mongo_uri so "the SAME cfg.json works
        # unchanged" (MIGRATION.md) holds for the connection keys too
        if "mongo_uri" not in raw and "mongodb_host" in raw:
            raw["mongo_uri"] = (
                f"mongodb://{raw['mongodb_host']}:{raw.get('mongodb_port', 27017)}"
            )
        known = {f for f in cls.__dataclass_fields__}
        cfg = cls(**{k: v for k, v in raw.items() if k in known})
        cfg.start_date = _parse_date(raw.get("start_date"))
        cfg.end_date = _parse_date(raw.get("end_date"))
        return cfg

    def select_databases(self, all_names: list[str]) -> list[str]:
        """Include ∩ / exclude − set algebra (reference main.py:250-258)."""
        names = set(all_names)
        if self.include_databases:
            names &= set(self.include_databases)
        elif self.exclude_databases:
            names -= set(self.exclude_databases)
        return sorted(names)
