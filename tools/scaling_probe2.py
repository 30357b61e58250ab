"""Bisect the single-pass pipeline at two core counts (run on a QUIET box)."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

def main(cpus: int):
    from fineweb_legal_spark.session import get_spark
    import pyspark.sql.functions as F
    from fineweb_legal_spark.datasets import ensure_transcripts
    from fineweb_legal_spark import pipeline as P
    from fineweb_legal_spark.artifacts import get_artifacts
    spark = get_spark(master=f"local[{cpus}]")
    src = spark.read.parquet(str(ensure_transcripts("bench")))

    def timed(name, df):
        df.count()
        t0 = time.time(); df.count(); print(f"PHASE {name} {time.time()-t0:.1f}", flush=True)

    conv = P.conversation_stats(src)
    feats = P.heuristic_features(src.select("conv_id","turn_idx","text"))
    heur = feats.join(conv, "conv_id").withColumn("heur_reason", P.heuristic_reason_col())
    model_in = heur.select("conv_id","turn_idx","text","heur_reason")
    timed("heur_join", model_in.select(F.count(F.when(F.col("heur_reason").isNull(),1))))
    bc = spark.sparkContext.broadcast(get_artifacts())
    scored = model_in.mapInPandas(P._model_stage_fn(bc), schema=P._MODEL_SCHEMA)
    timed("plus_model", scored)
    timed("full", P.run_pipeline(spark, src))
    print("PLAN_JOIN " + ("Broadcast" if "BroadcastHashJoin" in P.run_pipeline(spark, src)._jdf.queryExecution().executedPlan().toString() else "other"), flush=True)
    spark.stop()

if __name__ == "__main__":
    main(int(sys.argv[1]))
