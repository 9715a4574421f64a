"""Reference-compatible JSON-lines job log (reference main.py:49-58).

The reference writes every job event to ``mongodb_to_parquet.log`` as one
JSON object per line — ``{"ts": ..., "level": ..., "msg": ...}`` — and
downstream tooling (log shippers, cron wrappers) parses exactly that
shape. ``create_logger`` reproduces the format and default filename;
``ExportJob`` emits the reference's START/END lines through it with the
same msg content — ``START {db}.{coll} | query={...}`` / ``END
{db}.{coll} | documents=N`` (main.py:295,309) — so a user's existing
log parsing keeps working at BOTH levels: the JSON envelope and the
msg-content grammar (pass ``database=`` to ExportJob for the
qualifier; sources with no database notion log the bare collection).

Spark-first note: this is the JOB-level log only (per-collection
lifecycle + row totals). Task-level progress lives in the Spark UI /
event log, which no single-process log file could represent; the
reference's per-flush "Wrote N rows" line (main.py:230-232) maps to the
``export_partitioned_observed`` Observation metrics instead.
"""

from __future__ import annotations

import logging
import os

#: the reference's hardcoded log filename (main.py:52)
DEFAULT_LOG_PATH = "mongodb_to_parquet.log"

#: the reference's formatter string, byte-for-byte (main.py:53-55)
_FORMAT = '{"ts":"%(asctime)s","level":"%(levelname)s","msg":"%(message)s"}'


def create_logger(log_path: str = DEFAULT_LOG_PATH) -> logging.Logger:
    """The reference's ``create_logger`` (main.py:49-58): INFO-level
    ``mongo_to_parquet`` logger appending JSON lines to ``log_path``.

    Idempotent per path — calling twice (or from CLI + library code in
    one process) attaches one handler, not duplicates; the reference
    re-attaches and double-logs on a second call.
    """
    logger = logging.getLogger("mongo_to_parquet")
    logger.setLevel(logging.INFO)
    abspath = os.path.abspath(log_path)
    if not any(
        isinstance(h, logging.FileHandler) and h.baseFilename == abspath
        for h in logger.handlers
    ):
        handler = logging.FileHandler(log_path)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
    return logger
