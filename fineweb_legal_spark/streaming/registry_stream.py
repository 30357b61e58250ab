"""Registry-backed streaming dedup: exactly-once, never-evicting.

`filter_stream.start_filter_stream` bounds dedup state with a watermark
(its documented trade: a duplicate arriving after the watermark passes is
re-emitted). THIS path keeps the reference's actual contract — a
cross-run registry that never forgets (storage.py:81-129) — by doing the
dedup in `foreachBatch` against a parquet norm-key registry instead of
the state store:

- within a micro-batch, winner = min(conv_id, turn_idx) per norm_key (the
  batch engine's deterministic rule);
- across batches/restarts, FIRST COMMITTED wins (the registry's
  first-arrival semantics — a stream cannot know a smaller key arrives
  later);
- exactly-once without the file-sink's state: every batch writes to
  deterministic, batch-id-addressed locations (`out/batch=<id>/`,
  `registry/batch-<id>.parquet`) in overwrite mode, so a replayed batch
  (foreachBatch's at-least-once) lands on the same paths with the same
  content — idempotent by construction, the same trick as the lineage
  commit protocol.

Scale notes: the registry read is a parquet scan of norm_key only
(column-pruned); the anti-join is a shuffle join on the 32-byte key —
at 10^12 turns the registry lives bucketed by norm_key so the join is
storage-partitioned. State never lives in the streaming state store, so
executor memory is flat regardless of stream lifetime.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .filter_stream import _scored_stream

_OUT_COLS = ["conv_id", "turn_idx", "ts", "lang", "ppl_bucket", "scrubbed_text"]


def _commit_batch(out_dir: str, registry_dir: str):
    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        kept = batch_df.filter(F.col("reason0").isNull())

        # within-batch dedup: deterministic min-key winner
        w = Window.partitionBy("norm_key").orderBy("conv_id", "turn_idx")
        kept = kept.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") == 1
        )

        # cross-batch dedup: anti-join the committed registry. Only slices
        # with batch id < the CURRENT id participate: on foreachBatch replay
        # (crash between the writes and the checkpoint commit) this batch's
        # own slice from the failed attempt is already on disk, and
        # anti-joining against it would empty `kept` and overwrite both
        # outputs with nothing — permanent loss. Earlier-only filtering
        # makes the replay reproduce the first attempt exactly.
        reg_path = Path(registry_dir)
        reg_files = sorted(
            str(p)
            for p in reg_path.glob("batch-*.parquet")
            if int(p.stem.split("-", 1)[1]) < batch_id
        )
        if reg_files:
            registry = spark.read.parquet(*reg_files).select("norm_key")
            kept = kept.join(registry, "norm_key", "left_anti")

        # deterministic batch-addressed writes -> replay-idempotent
        kept = kept.persist()
        try:
            kept.select(*_OUT_COLS).write.mode("overwrite").parquet(
                f"{out_dir}/batch={batch_id}"
            )
            reg_path.mkdir(parents=True, exist_ok=True)
            tmp = reg_path / f"_tmp-batch-{batch_id}"
            # coalesce(1): the publish below takes exactly one part file, and
            # kept comes out of window/anti-join shuffles with potentially
            # many non-empty partitions — without this, extra parts would be
            # silently dropped and their keys re-emitted in later batches.
            # A micro-batch's norm_key set is small; one writer task is fine.
            kept.select("norm_key").coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(tmp))
            # single-file atomic publish (same rename trick as lineage)
            import shutil

            part = next(Path(tmp).glob("part-*.parquet"), None)
            final = reg_path / f"batch-{batch_id}.parquet"
            if part is not None:
                part.replace(final)
            else:  # empty batch: publish an empty registry slice
                spark.createDataFrame([], "norm_key string").write.mode(
                    "overwrite"
                ).parquet(str(tmp))
                part = next(Path(tmp).glob("part-*.parquet"))
                part.replace(final)
            shutil.rmtree(tmp, ignore_errors=True)
        finally:
            kept.unpersist()

    return fn


def start_registry_filter_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    registry_dir: str,
    available_now: bool = True,
):
    """Filter + scrub + registry dedup; kept turns land under
    ``out_dir/batch=<id>/`` with the norm-key registry growing under
    ``registry_dir`` — global dedup with no state-store eviction."""
    scored = _scored_stream(spark, src_dir)
    writer = (
        scored.writeStream.foreachBatch(_commit_batch(out_dir, registry_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
