"""Phase-by-phase scaling probe: which pipeline stage stops scaling 8->32?"""
import sys, time, os
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main(cpus: int):
    from fineweb_legal_spark.session import get_spark
    import pyspark.sql.functions as F
    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark.pipeline import (heuristic_features, conversation_stats,
        heuristic_reason_col, run_pipeline, _model_stage_fn, _MODEL_SCHEMA)
    from fineweb_legal_spark.artifacts import get_artifacts
    spark = get_spark(master=f"local[{cpus}]")
    src = spark.read.parquet(str(ensure_transcripts("bench")))

    def timed(name, df):
        df.count()  # compile + warm
        t0 = time.time(); df.count(); print(f"PHASE {name} {time.time()-t0:.1f}", flush=True)

    timed("scan", src)
    conv = conversation_stats(src)
    timed("conv_stats", conv)
    feats = heuristic_features(src.select("conv_id","turn_idx","text"))
    heur = feats.join(conv, "conv_id").withColumn("hr", heuristic_reason_col())
    timed("heur+join", heur.select(F.count(F.when(F.col("hr").isNull(), 1))))
    surv = heur.filter(F.col("hr").isNull()).select("conv_id","turn_idx","text")
    bc = spark.sparkContext.broadcast(get_artifacts())
    scored = surv.mapInPandas(_model_stage_fn(bc), schema=_MODEL_SCHEMA)
    timed("model", scored)
    timed("full", run_pipeline(spark, src))
    spark.stop()

if __name__ == "__main__":
    main(int(sys.argv[1]))
