"""Compaction for the idempotent foreachBatch sink's per-batch directories.

``streaming/sinks.py`` lands every micro-batch in its own ``batch_id=N``
directory — exactly-once under at-least-once replay, but the directory
count grows with batch cadence: a 30-second trigger is ~2,900 directories
a day, and at 100 TB the NameNode/listing cost of a million tiny
directories dominates the read path long before the data does. This
module folds cold batches into one compacted store without ever breaking
the reader's exactly-once view.

Crash-safe protocol (no transaction log, single atomic primitive =
``os.replace`` of a manifest file — the same publish trick as Spark's own
file-sink manifest and Hive's rename commit):

1. read the current manifest (``covered``: highest batch id already
   compacted; ``epoch``: generation counter of the compacted store);
2. read compacted ``epoch=K`` data UNION batch dirs in
   ``(covered, new_covered]`` and write them as ``epoch=K+1`` —
   *alongside* the live data, referenced by nothing;
3. atomically publish the new manifest (tmp file + ``os.replace``);
4. best-effort cleanup of the folded batch dirs and the old epoch.

A crash before (3) leaves the old manifest: readers still see old epoch +
all uncovered batch dirs — the orphaned ``epoch=K+1`` directory is
unreferenced and harmless (re-running compaction overwrites it). A crash
after (3) leaves covered-but-undeleted batch dirs: readers use the new
manifest, which skips them. Cleanup is therefore re-runnable and never
correctness-bearing. Readers are correct at every instant because each
row is reachable through exactly one of {published epoch, uncovered
batch dirs} under whichever manifest they loaded.

Writer concurrency: compaction may run CONCURRENTLY with the stream (cron
beside foreachBatch). Two rules make that loss-free: (1) only batch dirs
whose write committed (Spark's ``_SUCCESS`` marker) are folded — an
in-flight write, or an at-least-once replay that deleted its dir's
``_SUCCESS`` for the rewrite, is skipped; (2) the max live batch id is
never folded — Structured Streaming replays at most the LAST uncommitted
micro-batch, which is always the max id, so excluding it closes the
residual check-then-read race. ``covered`` therefore never advances past
rows that land after the compaction pass.

At cluster scale the same protocol works on any store with atomic rename
(HDFS) — on S3, publish the manifest via a conditional PUT instead; the
data files never need atomicity because they are invisible until
published.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["compact_sink", "maybe_compact", "read_sink", "sink_stats"]

_MANIFEST = "_compaction/manifest.json"
_BATCH_RE = re.compile(r"batch_id=(\d+)$")


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _load_manifest(path: str) -> dict:
    try:
        with open(_manifest_path(path)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"covered": -1, "epoch": -1}


def _publish_manifest(path: str, manifest: dict) -> None:
    """Atomic publish: readers see either the old or the new manifest,
    never a partial write."""
    mp = _manifest_path(path)
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, mp)


def _live_batch_dirs(path: str, committed_only: bool = False) -> dict[int, str]:
    """Batch directories under the sink. ``committed_only`` keeps only dirs
    whose write COMMITTED (Spark's ``_SUCCESS`` marker) — the gate that
    makes compaction safe to run concurrently with the writer: an in-flight
    micro-batch (or an at-least-once replay, which deletes and rewrites its
    dir, removing ``_SUCCESS`` until recommit) is never folded, so
    ``covered`` can never advance past rows that land afterward."""
    out: dict[int, str] = {}
    for d in glob.glob(os.path.join(path, "batch_id=*")):
        m = _BATCH_RE.search(d)
        if m and os.path.isdir(d):
            if committed_only and not os.path.exists(os.path.join(d, "_SUCCESS")):
                continue
            out[int(m.group(1))] = d
    return out


def _epoch_dir(path: str, epoch: int) -> str:
    return os.path.join(path, "_compaction", f"epoch={epoch}")


# Derived floors for LEGACY manifests (written before "floor" existed),
# memoized per (path, epoch): the epoch data is immutable once published,
# so one driver-side read answers every later call. NOT written back into
# the manifest from readers — a reader republishing the manifest could
# race a concurrent compaction's publish and roll covered/epoch BACK to
# a generation whose directories step-4 cleanup already deleted.
_FLOOR_CACHE: dict[tuple[str, int], int | None] = {}


def _epoch_floor(path: str, epoch: int) -> int | None:
    """True min(batch_id) present in a compacted epoch — the coverage
    floor for legacy manifests without a ``floor`` key. Driver-side
    pyarrow column read (no Spark job — same contract as the directory
    checks around it); ``batch_id`` is a materialized column in the
    compacted store, so the parquet files carry it directly. Returns
    None when the epoch holds no rows (claiming anything for an empty
    epoch would route batches to an index tier with zero rows)."""
    key = (os.path.abspath(path), epoch)
    if key in _FLOOR_CACHE:
        return _FLOOR_CACHE[key]
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lo: int | None = None
    for f in glob.glob(os.path.join(_epoch_dir(path, epoch), "*.parquet")):
        try:
            m = pc.min(
                pq.read_table(f, columns=["batch_id"]).column("batch_id")
            ).as_py()
        except Exception:  # noqa: BLE001 — unreadable file: claim nothing
            continue
        if m is not None and (lo is None or m < lo):
            lo = int(m)
    _FLOOR_CACHE[key] = lo
    return lo


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Exactly-once view of the sink: published compacted store UNION
    batch directories newer than its coverage. ``batch_id`` survives as a
    regular column (partition-dir value in live batches, materialized
    column in the compacted store)."""
    manifest = _load_manifest(path)
    covered, epoch = manifest["covered"], manifest["epoch"]
    parts: list[DataFrame] = []
    if epoch >= 0:
        parts.append(spark.read.parquet(_epoch_dir(path, epoch)))
    # committed_only: an in-flight (or replaying) micro-batch's partial
    # files are invisible until its _SUCCESS lands — the reader's view is
    # always a prefix of committed batches.
    live = [
        d
        for bid, d in sorted(_live_batch_dirs(path, committed_only=True).items())
        if bid > covered
    ]
    if live:
        # basePath keeps the batch_id partition column when reading leaf dirs
        df = spark.read.option("basePath", path).parquet(*live)
        parts.append(df.withColumn("batch_id", F.col("batch_id").cast("long")))
    if not parts:
        raise FileNotFoundError(f"empty sink at {path}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_sink(
    spark: SparkSession,
    path: str,
    min_batches: int = 2,
    target_files: int = 1,
    include_max_live: bool = False,
) -> dict:
    """Fold all currently-covered-by-nothing COMMITTED batch directories
    into the compacted store. Returns stats; a no-op (too few new batches)
    returns ``{"compacted": False, ...}``. Safe to re-run at any time,
    including after a mid-compaction crash, and safe to run concurrently
    with the streaming writer (see module docstring).

    ``include_max_live`` folds the max live batch id too. Default False —
    the max id is the only batch Structured Streaming can replay, so a
    concurrent (cron) compactor must leave it alone. Pass True when the
    writer is quiesced, or when compacting inline inside the foreachBatch
    callback that just committed that batch (a replay of it would rewrite
    a dir the manifest already skips, with identical rows — converges)."""
    manifest = _load_manifest(path)
    covered, epoch = manifest["covered"], manifest["epoch"]
    # Fold only COMMITTED dirs (_SUCCESS present), and never the max live
    # batch id: Structured Streaming replays at most the last uncommitted
    # micro-batch, which is always the max id — excluding it closes the
    # check-then-read race where a replay deletes/rewrites a dir between
    # our _SUCCESS check and the Spark read. Together the two rules make
    # concurrent compaction (cron beside the stream) loss-free.
    all_live = _live_batch_dirs(path)
    committed = _live_batch_dirs(path, committed_only=True)
    max_live = max(all_live) if all_live else -1
    # Belt-and-braces: never advance covered past an EXISTING uncommitted
    # dir (can't occur with sequential micro-batches, but a corrupted or
    # manual write below max would otherwise be orphaned permanently).
    # Only dirs ABOVE current coverage count: a partially-deleted folded
    # dir at/below covered (step-4 cleanup is best-effort — rmtree can
    # remove _SUCCESS then crash) is already-folded debris, and letting it
    # pin the ceiling would wedge compaction permanently (every future run
    # returns compacted=False while batch dirs grow without bound).
    uncommitted = sorted(
        b for b in set(all_live) - set(committed) if b > covered
    )
    ceiling = uncommitted[0] if uncommitted else max_live + (1 if include_max_live else 0)
    live = {
        bid: d for bid, d in committed.items()
        if bid > covered and bid < ceiling
    }
    if len(live) < min_batches:
        return {"compacted": False, "covered": covered, "epoch": epoch,
                "new_batches": len(live)}

    new_covered = max(live)
    new_epoch = epoch + 1
    # The first compaction pins the store's coverage FLOOR: the lowest
    # batch id ever folded. A store enabled mid-stream (e.g. a signature
    # index turned on at batch 2) has no rows for earlier batches, and
    # coverage consumers (ingest_dedup._store_bids) must not assume the
    # compacted epoch reaches back to batch 0. Later compactions carry
    # the floor forward unchanged. A LEGACY manifest (pre-floor code,
    # epoch already published) derives the floor from the epoch data's
    # true min(batch_id): min(live) here would be > covered (the folded
    # dirs are deleted) and would permanently orphan the epoch's batch
    # range from every coverage consumer. min(live) is correct only for
    # a store with no prior epoch (or an empty one).
    floor = manifest.get("floor")
    if floor is None and epoch >= 0:
        floor = _epoch_floor(path, epoch)
    floor = int(floor) if floor is not None else min(live)
    parts: list[DataFrame] = []
    if epoch >= 0:
        parts.append(spark.read.parquet(_epoch_dir(path, epoch)))
    batch_df = spark.read.option("basePath", path).parquet(*live.values())
    parts.append(batch_df.withColumn("batch_id", F.col("batch_id").cast("long")))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)

    # step 2: write the next generation beside the live data (mode
    # overwrite makes a retry after a pre-publish crash converge)
    (
        merged.repartition(target_files)
        .write.mode("overwrite")
        .parquet(_epoch_dir(path, new_epoch))
    )
    # step 3: atomic publish — the only correctness-bearing mutation
    _publish_manifest(
        path, {"covered": new_covered, "epoch": new_epoch, "floor": floor}
    )
    # step 4: best-effort cleanup (correct under the new manifest whether
    # or not any of these deletions land)
    removed = 0
    for bid, d in live.items():
        try:
            shutil.rmtree(d)
            removed += 1
        except OSError:
            pass
    if epoch >= 0:
        shutil.rmtree(_epoch_dir(path, epoch), ignore_errors=True)
    return {
        "compacted": True,
        "covered": new_covered,
        "epoch": new_epoch,
        "folded_batches": len(live),
        "removed_dirs": removed,
    }


def maybe_compact(
    spark: SparkSession,
    path: str,
    max_batch_dirs: int = 64,
    target_files: int = 1,
    include_max_live: bool = False,
) -> dict:
    """The operational trigger: compact only when the uncovered batch-dir
    count exceeds ``max_batch_dirs``. Run it after every micro-batch (or
    from a cron) — it is O(one listing) when below threshold, so the
    caller never needs its own bookkeeping, and the sink's directory
    count is bounded at max_batch_dirs + batches-per-compaction-interval
    regardless of stream lifetime."""
    live = sum(
        1
        for bid in _live_batch_dirs(path, committed_only=True)
        if bid > _load_manifest(path)["covered"]
    )
    if live <= max_batch_dirs:
        return {"compacted": False, "reason": "below_threshold", "batch_dirs": live}
    return compact_sink(
        spark, path, min_batches=2, target_files=target_files,
        include_max_live=include_max_live,
    )


def sink_stats(path: str) -> dict:
    """Directory/file counts — the metric compaction exists to bound."""
    manifest = _load_manifest(path)
    live = _live_batch_dirs(path)
    uncovered = [d for bid, d in live.items() if bid > manifest["covered"]]
    files = sum(
        len(glob.glob(os.path.join(d, "*.parquet"))) for d in uncovered
    )
    if manifest["epoch"] >= 0:
        files += len(glob.glob(os.path.join(_epoch_dir(path, manifest["epoch"]), "*.parquet")))
    return {"batch_dirs": len(uncovered), "data_files": files, **manifest}
