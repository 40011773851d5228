"""Structured Streaming ingestion -> incremental index versions.

The reference is batch-only and leaves incremental ingest as a TODO
(/root/reference/extract-features.py:257; SURVEY.md section 2.9). Here the
arrival of new corpus files drives index growth:

    readStream (file source) -> foreachBatch:
        batch 0: build_index(batch)          -> <root>/v000000
        batch n: extend_index(current, batch) -> <root>/v00000n  (re-encoded
                 under the merged avgdl — still rank-identical to a full
                 rebuild, tests prove it)
    CURRENT file (atomic rename) points at the live version; readers pick a
    consistent snapshot at any time (non-destructive versions = time travel).

Checkpointing is the stream's own (file-source offsets), so a killed stream
resumes exactly where it stopped without re-indexing processed files —
this composes with the build's per-wave lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def current_index_dir(index_root: str) -> str | None:
    cur = os.path.join(index_root, "CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return os.path.join(index_root, f.read().strip())


def _set_current(index_root: str, version: str) -> None:
    cur = os.path.join(index_root, "CURRENT")
    tmp = cur + ".tmp"
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, cur)


def stream_build_index(
    spark: SparkSession,
    input_path: str,
    index_root: str,
    schema: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    n_shards: int = 8,
    n_buckets: int = 8,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    with_positions: bool = False,
):
    """Run the incremental build stream. With available_now=True this
    processes the current backlog and stops (batch-incremental snapshots);
    without it the stream keeps absorbing new files."""
    from ..index import build_index
    from ..index.merge import extend_index

    os.makedirs(index_root, exist_ok=True)

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        # version derived from batch_id, NOT from CURRENT: foreachBatch may
        # replay a batch after a crash between _set_current and the streaming
        # checkpoint commit — replay must be a no-op, never a double-extend
        version = f"v{batch_id:06d}"
        out = os.path.join(index_root, version)
        if os.path.exists(os.path.join(out, "meta.json")):
            _set_current(index_root, version)  # replayed batch: already built
            return
        cur = current_index_dir(index_root)
        if cur is None:
            build_index(
                batch, out, id_col=id_col, text_col=text_col, url_col=url_col,
                n_shards=n_shards, n_buckets=n_buckets, n_waves=1,
                with_positions=with_positions,
            )
        else:
            extend_index(
                spark, cur, batch, out,
                id_col=id_col, text_col=text_col, url_col=url_col,
            )
        _set_current(index_root, version)

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    writer = (
        reader.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", os.path.join(index_root, "_stream_checkpoint"))
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
