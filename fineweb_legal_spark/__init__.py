"""fineweb_legal_spark — a PySpark-native quality-filter engine.

A from-scratch rebuild (NOT a port) of the capabilities of the
NoeFlandre/fineweb-legal reference pipeline, re-expressed Spark-first:

- heuristic quality rules as native Column expressions (whole-stage codegen),
- language-ID + perplexity scoring as Arrow-batched pandas UDFs with
  broadcast model artifacts (reference analog: ``scripts/model_inference_stage2_cuda.py``),
- regex PII/toxicity scrubbing sharing one Python ``re`` engine between the
  engine and the oracle (exact text parity),
- dedup / lineage / metrics as DataFrame ops over Parquet (Iceberg-shaped
  commit protocol without requiring the Iceberg runtime jar).

See SURVEY.md for the operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"
