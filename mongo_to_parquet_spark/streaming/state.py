"""Ledger-committed compaction for append-only streaming state.

``stream_dedup_incremental`` and ``stream_assembly`` persist
corpus-growing state as per-batch subdirectories (``index/batch=<id>``,
``hashes/batch=<id>``, ...) under a ledger of commit markers — correct
and append-only, but after thousands of micro-batches every read lists
and opens one directory per batch of ingest age: the per-batch listing
cost and small-file count grow linearly forever (round-8 verdict
finding #2 — the one unbounded term left in the streaming designs).

This module bounds it with the SAME exactly-once machinery the folds
already rely on: a COMPACTION merges every committed per-batch directory
at or below a watermark ``W`` (plus any older compacted artifact) into
one ``compact/<sub>/upto=<W>`` directory, and publishes it by renaming a
marker into ``compact/ledger/<W>`` strictly LAST. Readers resolve state
as ``compacted(W) ∪ per-batch dirs above W``, so

- a TORN compaction (parquet written, marker missing) is invisible —
  readers keep using the per-batch dirs, and the next compaction
  overwrites the orphan and commits;
- a VACUUM may then delete everything the watermark supersedes
  (per-batch dirs ≤ W, ledger markers ≤ W, older compacted dirs) —
  replay-skip stays sound because ``is_committed`` treats any batch id
  ≤ W as committed by construction (only committed batches compact);
- cumulative reads are row-identical before and after (the compacted
  dir is a pure union), pinned in tests/test_streaming.py.

Batch ids from foreachBatch are processed in order, so while a batch
``bid`` is being (re)computed nothing ≥ ``bid`` is committed and the
watermark is strictly below it — ``read_sub(..., below=bid)`` asserts
that contract instead of silently mixing the torn batch's own rows in.

At 100 TB: compaction cost is one sequential union write of
hash/signature-sized rows (text never enters these states), amortized
over however many batches the operator lets accumulate between
compactions; reads go from O(ingest age) directories to O(1) + O(batches
since last compaction).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: compacted state lives under <state_dir>/compact/<sub>/upto=<W>,
#: published by <state_dir>/compact/ledger/<W>
COMPACT = "compact"


def _ids(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    return sorted(int(f) for f in os.listdir(path) if f.isdigit())


def ledger_ids(state_dir: str) -> list[int]:
    """Per-batch commit markers still on disk (markers at or below the
    compaction watermark may have been vacuumed — they are implicit)."""
    return _ids(os.path.join(state_dir, "ledger"))


def compact_watermark(state_dir: str) -> int | None:
    """Largest COMMITTED compaction watermark, or None."""
    ws = _ids(os.path.join(state_dir, COMPACT, "ledger"))
    return ws[-1] if ws else None


def is_committed(state_dir: str, bid: int) -> bool:
    """True iff batch ``bid``'s artifacts are committed — by its own
    ledger marker, or implicitly by a compaction watermark ≥ bid (only
    committed batches ever compact, so ≤ W means committed even after
    the marker itself was vacuumed)."""
    w = compact_watermark(state_dir)
    if w is not None and bid <= w:
        return True
    return os.path.exists(os.path.join(state_dir, "ledger", str(bid)))


def last_committed(state_dir: str) -> int | None:
    """Largest committed batch id (ledger or compaction-implied)."""
    led = ledger_ids(state_dir)
    w = compact_watermark(state_dir)
    cands = ([led[-1]] if led else []) + ([w] if w is not None else [])
    return max(cands) if cands else None


def read_sub(
    spark: SparkSession,
    state_dir: str,
    sub: str,
    schema: str,
    below: int | None = None,
) -> DataFrame:
    """All committed rows of append-only sub-state ``sub``: the compacted
    artifact (everything ≤ W) plus committed per-batch directories above
    W. ``below`` restricts to batches strictly before it (the fold's
    "everything prior to me" read) — legal only while nothing ≥ below is
    committed, which sequential foreachBatch guarantees."""
    w = compact_watermark(state_dir)
    if below is not None and w is not None and w >= below:
        raise ValueError(
            f"compaction watermark {w} >= in-flight batch {below}: "
            f"batches must commit in order before they compact"
        )
    paths = []
    if w is not None:
        paths.append(os.path.join(state_dir, COMPACT, sub, f"upto={w}"))
    paths += [
        os.path.join(state_dir, sub, f"batch={b}")
        for b in ledger_ids(state_dir)
        if (w is None or b > w) and (below is None or b < below)
    ]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*paths)


def compact(
    spark: SparkSession,
    state_dir: str,
    subs: dict[str, str],
    upto: int | None = None,
    extra: dict | None = None,
) -> int | None:
    """Merge committed per-batch dirs of every sub in ``subs`` (a
    {sub: schema} map) at or below ``upto`` — default: everything
    committed — into one compacted dir per sub; marker renamed LAST.
    Returns the new watermark, or None if there is nothing new to cover.
    Idempotent: a torn run leaves only orphan dirs the next run
    overwrites; recompacting an already-covered watermark is a no-op."""
    w_old = compact_watermark(state_dir)
    led = ledger_ids(state_dir)
    if upto is None:
        upto = last_committed(state_dir)
    if upto is None or (w_old is not None and upto <= w_old):
        return None
    if w_old is not None and upto < w_old:
        raise ValueError(f"cannot compact to {upto} below watermark {w_old}")
    cover = [b for b in led if (w_old is None or b > w_old) and b <= upto]
    uncommitted = [
        b
        for b in cover
        if not os.path.exists(os.path.join(state_dir, "ledger", str(b)))
    ]
    if uncommitted:  # unreachable via ledger_ids, kept as the contract
        raise ValueError(f"uncommitted batches in range: {uncommitted}")
    for sub, schema in subs.items():
        parts = []
        if w_old is not None:
            parts.append(os.path.join(state_dir, COMPACT, sub, f"upto={w_old}"))
        parts += [os.path.join(state_dir, sub, f"batch={b}") for b in cover]
        existing = [p for p in parts if os.path.isdir(p)]
        df = (
            spark.read.parquet(*existing)
            if existing
            else spark.createDataFrame([], schema)
        )
        df.write.mode("overwrite").parquet(
            os.path.join(state_dir, COMPACT, sub, f"upto={upto}")
        )
    led_dir = os.path.join(state_dir, COMPACT, "ledger")
    os.makedirs(led_dir, exist_ok=True)
    marker = os.path.join(led_dir, str(upto))
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"upto": upto, "subs": sorted(subs), **(extra or {})}, fh)
    os.replace(tmp, marker)
    return upto


def marker_field(state_dir: str, field: str):
    """Read ``field`` from the NEWEST committed marker that carries it —
    the last per-batch ledger marker, falling back to the compaction
    marker (vacuum deletes ledger markers at or below the watermark, so
    fold-carried metadata must survive through the compaction marker's
    ``extra``). None if no committed marker records the field."""
    led = ledger_ids(state_dir)
    for b in reversed(led):
        with open(os.path.join(state_dir, "ledger", str(b))) as fh:
            meta = json.load(fh)
        if field in meta:
            return meta[field]
    w = compact_watermark(state_dir)
    if w is not None:
        with open(os.path.join(state_dir, COMPACT, "ledger", str(w))) as fh:
            meta = json.load(fh)
        if field in meta:
            return meta[field]
    return None


def vacuum(
    state_dir: str,
    subs: list[str],
    swap_subs: list[str] = (),
) -> list[str]:
    """Delete everything the committed compaction watermark supersedes:
    per-batch dirs of ``subs`` ≤ W, their ledger markers ≤ W, compacted
    dirs and markers of OLDER watermarks, and — for ``swap_subs``
    (whole-state-per-batch layouts like the pack fill state) — every
    committed batch dir but the newest. Returns deleted paths. Safe at
    any time: readers resolve through the watermark first, and a torn
    compaction (no marker) vacuums nothing."""
    deleted = []

    def rm(path: str) -> None:
        if os.path.isdir(path):
            shutil.rmtree(path)
            deleted.append(path)
        elif os.path.isfile(path):
            os.remove(path)
            deleted.append(path)

    w = compact_watermark(state_dir)
    if w is not None:
        for sub in subs:
            for b in _ids_under(state_dir, sub):
                if b <= w:
                    rm(os.path.join(state_dir, sub, f"batch={b}"))
            for v in _ids_under(os.path.join(state_dir, COMPACT), sub):
                if v < w:
                    rm(os.path.join(state_dir, COMPACT, sub, f"upto={v}"))
        for b in ledger_ids(state_dir):
            if b <= w:
                rm(os.path.join(state_dir, "ledger", str(b)))
        for v in _ids(os.path.join(state_dir, COMPACT, "ledger")):
            if v < w:
                rm(os.path.join(state_dir, COMPACT, "ledger", str(v)))
    last = last_committed(state_dir)
    for sub in swap_subs:
        for b in _ids_under(state_dir, sub):
            if last is not None and b < last and is_committed(state_dir, b):
                rm(os.path.join(state_dir, sub, f"batch={b}"))
    return deleted


def _ids_under(root: str, sub: str) -> list[int]:
    path = os.path.join(root, sub)
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        for prefix in ("batch=", "upto="):
            if d.startswith(prefix) and d[len(prefix) :].isdigit():
                out.append(int(d[len(prefix) :]))
    return sorted(out)
