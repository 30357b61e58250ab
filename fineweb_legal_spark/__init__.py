"""fineweb_legal_spark — a PySpark-native quality-filter engine.

A from-scratch rebuild (NOT a port) of the capabilities of the
NoeFlandre/fineweb-legal reference pipeline, re-expressed Spark-first:

- heuristic quality rules as native Column expressions (whole-stage codegen),
- language-ID + perplexity scoring as Arrow-batched pandas UDFs with
  broadcast model artifacts (reference analog: ``scripts/model_inference_stage2_cuda.py``),
- regex PII/toxicity scrubbing sharing one Python ``re`` engine between the
  engine and the oracle (exact text parity),
- dedup / lineage / metrics as DataFrame ops over Parquet,
- catalog-table output (``sources.catalog.TableIO``): Iceberg V2 snapshot
  commits when an Iceberg catalog is configured, stock session-catalog
  dynamic partition overwrite otherwise — the same job code either way,
- resumable commit protocols on both backends (``lineage`` for parquet
  directories, ``lineage_table`` for catalog tables): per-bucket
  idempotent commits so a killed run resumes without recomputation.

See SURVEY.md for the operator-by-operator mapping to the reference,
docs/RECIPES.md for end-to-end job recipes, and BENCH.md for the
measured throughput / scaling evidence.
"""

__version__ = "0.1.0"
