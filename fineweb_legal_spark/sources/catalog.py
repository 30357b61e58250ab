"""Catalog-table writer: Iceberg when a V2 catalog is plugged in, stock
session catalog otherwise — one API, the north rule's table semantics.

The north rule's output contract is "write filtered output … back to
Iceberg with checkpointed, idempotent per-partition commits" (the
reference gets the same guarantee single-node from tmp+rename batch
files, `storage.py:206-235`).  Spark expresses that contract through two
different writer APIs depending on what catalog is configured, and the
difference is exactly the kind of deploy-time detail a pipeline should
not hard-code:

- **V2 catalog present** (Iceberg's ``SparkCatalog`` / ``SparkSessionCatalog``
  registered under ``spark.sql.catalog.<name>``): ``df.writeTo(t)`` —
  ``append()`` is an atomic snapshot commit and ``overwritePartitions()``
  is the idempotent per-partition replay primitive (dynamic overwrite of
  exactly the partitions present in ``df``).
- **Stock session catalog** (this sandbox: no Iceberg jar on the
  classpath): V2 writes raise ``Cannot write into v1 table`` — measured,
  not assumed.  The V1 equivalents are ``insertInto`` (append) and
  ``mode("overwrite").insertInto`` under
  ``spark.sql.sources.partitionOverwriteMode=dynamic``, which replaces
  only the partitions present in the frame (verified: overwriting
  partition 0 leaves partition 1's rows untouched, and a replay of the
  same frame is a no-op on the final state).

``TableIO`` routes per table at call time, so the SAME job code runs on
a laptop warehouse and on an Iceberg lakehouse — the only deploy delta
is spark-submit ``--conf spark.sql.catalog.…`` lines.

Semantics notes (the sharp edges this module owns so callers don't):

- ``insertInto`` is POSITIONAL.  ``append``/``overwrite_partitions``
  re-select the frame into the table's column order first; a frame with
  the right columns in the wrong order would otherwise silently write
  values into the wrong columns (and partition data rows into the
  partition column).
- V1 dynamic overwrite is a SESSION conf, not a writer option — the
  writer-level ``option("partitionOverwriteMode", "dynamic")`` is
  silently ignored by ``insertInto`` (measured: it overwrote the whole
  table).  The conf is flipped around the single write and restored in a
  ``finally``; jobs here are single-writer per session, which is also
  the assumption the rest of the lineage layer makes.
- ``overwrite_partitions(df)`` + a partition column derived
  deterministically from the data (e.g. the lineage layer's
  ``bucket_of``) IS the idempotent commit: a killed-and-rerun task
  re-emits the same partition values and the replay converges instead of
  duplicating.  This is the table-catalog analog of
  ``lineage.run_with_lineage``'s directory commits.

At 10^12 turns: partition by something with bounded cardinality (bucket
id, date, source shard) — dynamic overwrite lists and commits one
directory/manifest per partition value present in the frame, so a
high-cardinality partition column turns every commit into a metadata
storm.  That guidance is Iceberg's own, not this module's invention.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

_OVERWRITE_MODE_KEY = "spark.sql.sources.partitionOverwriteMode"


def catalog_of(spark: SparkSession, table: str) -> str:
    """The catalog a (possibly qualified) table name resolves in."""
    head = table.split(".", 1)[0] if "." in table else None
    if head is not None and _is_registered_catalog(spark, head):
        return head
    return spark.catalog.currentCatalog()


def _is_registered_catalog(spark: SparkSession, name: str) -> bool:
    try:
        return (
            spark.conf.get(f"spark.sql.catalog.{name}", None) is not None
        )
    except Exception:
        return False


def supports_v2_writes(spark: SparkSession, table: str) -> bool:
    """True iff the table's catalog is a plugged DataSourceV2 catalog.

    The stock ``spark_catalog`` only becomes V2-write-capable when
    something (e.g. Iceberg's ``SparkSessionCatalog``) is registered
    over it via ``spark.sql.catalog.spark_catalog`` — which is exactly
    the conf key this checks.
    """
    return _is_registered_catalog(spark, catalog_of(spark, table))


class TableIO:
    """Create/append/overwrite-partitions on catalog tables, routing
    between V2 (`writeTo`) and V1 (`insertInto`) writer APIs."""

    def __init__(self, spark: SparkSession, default_format: str | None = None):
        self.spark = spark
        self.default_format = default_format

    # -- format ---------------------------------------------------------
    def _format_for(self, table: str) -> str | None:
        """Provider for CTAS: explicit ``default_format`` wins; otherwise
        derive it from the catalog's implementation class (an Iceberg
        catalog wants ``using iceberg``, a Delta one ``using delta``) —
        NOT a hard-coded 'iceberg' for every V2 catalog, which would
        mis-provision tables on e.g. a JDBC catalog.  Unknown V2 catalog
        classes return None: ``create`` then omits ``using(...)`` and the
        catalog provisions its own native format."""
        if self.default_format:
            return self.default_format
        cat = catalog_of(self.spark, table)
        impl = None
        try:
            impl = self.spark.conf.get(f"spark.sql.catalog.{cat}", None)
        except Exception:
            pass
        if impl is None:
            return "parquet"  # stock session catalog
        low = impl.lower()
        for provider in ("iceberg", "delta", "hudi"):
            if provider in low:
                return provider
        return None

    # -- DDL ------------------------------------------------------------
    def create(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] = (),
        fmt: str | None = None,
    ) -> None:
        """CTAS with identity partitioning (works on both catalog kinds)."""
        from pyspark.sql import functions as F

        w = df.writeTo(table)
        provider = fmt or self._format_for(table)
        if provider is not None:
            w = w.using(provider)
        if partition_by:
            cols = [F.col(c) for c in partition_by]
            w = w.partitionedBy(cols[0], *cols[1:])
        self._routed(w.create, table)

    def ensure(
        self,
        df: DataFrame,
        table: str,
        partition_by: Sequence[str] = (),
        fmt: str | None = None,
    ) -> bool:
        """Create the table from ``df``'s first write if absent; True iff
        this call created it (and wrote ``df``), False if it existed."""
        if self.spark.catalog.tableExists(table):
            return False
        self.create(df, table, partition_by=partition_by, fmt=fmt)
        return True

    # -- writes ---------------------------------------------------------
    # substrings Spark emits when a configured catalog class cannot be
    # resolved/instantiated — the ONLY failures _routed rewrites (a
    # connector's own capability/analysis errors pass through untouched)
    _RESOLUTION_MARKERS = (
        "catalog plugin",
        "ClassNotFound",
        "NoClassDefFound",
        "cannot be instantiated",
        "CATALOG_NOT_FOUND",
    )

    def _routed(self, write, table: str):
        """Run a V2 write, converting an obscure late catalog-RESOLUTION
        failure (a typo'd / unloadable ``spark.sql.catalog.<name>`` class
        still ROUTES down the V2 path — the conf key exists) into a
        routing-level error that names the catalog and its conf.  Any
        other failure (capability refusals, analysis errors) re-raises
        unchanged."""
        try:
            return write()
        except Exception as e:
            msg = str(e)
            if not any(m in msg for m in self._RESOLUTION_MARKERS):
                raise
            cat = catalog_of(self.spark, table)
            impl = None
            try:
                impl = self.spark.conf.get(f"spark.sql.catalog.{cat}", None)
            except Exception:
                pass
            raise RuntimeError(
                f"V2 write to {table!r} routed via catalog {cat!r} but the "
                f"catalog failed to resolve — check that "
                f"spark.sql.catalog.{cat}={impl!r} names a loadable "
                f"DataSourceV2 catalog class: {e}"
            ) from e

    def _aligned(self, df: DataFrame, table: str) -> DataFrame:
        """Reorder ``df`` to the table's column order (insertInto is
        positional) and fail loudly on a column-set mismatch OR duplicate
        frame columns (a set compare alone would pass an un-deduped
        join's frame, then die later on an ambiguous reference) rather
        than letting position semantics scramble values."""
        if len(df.columns) != len(set(df.columns)):
            dups = sorted(
                c for c in set(df.columns) if df.columns.count(c) > 1
            )
            raise ValueError(
                f"frame for {table} has duplicate columns {dups}; "
                "dedup/rename before writing"
            )
        want = self.spark.table(table).columns
        have = set(df.columns)
        if have != set(want):
            missing = sorted(set(want) - have)
            extra = sorted(have - set(want))
            raise ValueError(
                f"frame/table column mismatch for {table}: "
                f"missing={missing} extra={extra}"
            )
        return df.select(*want)

    def append(self, df: DataFrame, table: str) -> None:
        """Atomic append (Iceberg snapshot commit on V2 catalogs)."""
        if supports_v2_writes(self.spark, table):
            aligned = self._aligned(df, table)
            self._routed(aligned.writeTo(table).append, table)
        else:
            self._aligned(df, table).write.insertInto(table)

    def overwrite_partitions(self, df: DataFrame, table: str) -> None:
        """Replace exactly the partitions present in ``df`` — the
        idempotent per-partition (re)commit primitive.  Replaying the
        same frame converges to the same table state."""
        aligned = self._aligned(df, table)
        if supports_v2_writes(self.spark, table):
            self._routed(aligned.writeTo(table).overwritePartitions, table)
            return
        # V1 path: dynamic overwrite is session-conf-gated (the writer
        # option is ignored by insertInto — measured, see module doc).
        # The conf must be flipped on the FRAME's session, not the one
        # TableIO was built with: foreachBatch hands over frames from a
        # cloned micro-batch session whose conf is independent, and
        # flipping only the outer session leaves the clone in STATIC
        # mode — where mode("overwrite") truncates the whole table
        # (measured: a trailing empty watermark-flush batch erased every
        # committed row).
        conf = aligned.sparkSession.conf
        old = conf.get(_OVERWRITE_MODE_KEY, "STATIC")
        conf.set(_OVERWRITE_MODE_KEY, "dynamic")
        try:
            aligned.write.mode("overwrite").insertInto(table)
        finally:
            conf.set(_OVERWRITE_MODE_KEY, old)
