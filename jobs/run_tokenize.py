"""spark-submit entry point for the tokenizer -> sequences chain.

    spark-submit --py-files fineweb_legal_spark.zip jobs/run_tokenize.py \
        --input /path/to/docs --output /path/to/seqs \
        [--model /path/to/bpe_model] [--num-merges 8000] \
        [--seq-len 4096] [--mode exact|partition] [--seed epoch0] \
        [--id-col doc_id] [--text-col text]

One job from raw text to trainer-ready fixed-shape sequences:

1. load a published BPE model (``--model``, the merges parquet written
   by a previous run) or train one from the input corpus itself
   (``--num-merges``; one word-count shuffle + the driver merge loop);
2. encode every document to integer ids (one memoized Arrow pass);
3. assemble exactly ``--seq-len``-token sequences (operators/seqpack.py
   — exact mode is a pure function of the corpus and the seed, so a
   re-run at any cluster width writes the same sequences).

Writes ``<output>/sequences`` (seq_id, ids[seq_len]) and — when the
model was trained in-job — ``<output>/bpe_model`` and
``<output>/bpe_vocab``. Prints a one-line JSON report.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--model", default=None, help="existing merges parquet")
    ap.add_argument("--num-merges", type=int, default=8000)
    ap.add_argument("--max-word-types", type=int, default=2**17)
    ap.add_argument("--seq-len", type=int, default=4096)
    ap.add_argument("--mode", choices=["exact", "partition"], default="exact")
    ap.add_argument("--seed", default="")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fineweb_legal_spark.operators.bpe import (
        EOD_ID,
        encode_ids,
        merges_table,
        model_from_table,
        train_bpe,
        vocab_table,
    )
    from fineweb_legal_spark.operators.seqpack import assemble_sequences
    from fineweb_legal_spark.session import get_spark

    spark = get_spark(master=args.master, app_name="fineweb_legal_tokenize")
    df = spark.read.parquet(args.input)

    trained = args.model is None
    if trained:
        model = train_bpe(
            df,
            text_col=args.text_col,
            num_merges=args.num_merges,
            max_word_types=args.max_word_types,
        )
        merges_table(spark, model).write.mode("overwrite").parquet(
            f"{args.output}/bpe_model"
        )
        vocab_table(spark, model).write.mode("overwrite").parquet(
            f"{args.output}/bpe_vocab"
        )
    else:
        model = model_from_table(spark.read.parquet(args.model))

    ids = encode_ids(df, model, text_col=args.text_col, id_col=args.id_col)
    seqs = assemble_sequences(
        ids,
        seq_len=args.seq_len,
        eod_id=EOD_ID,
        id_col=args.id_col,
        mode=args.mode,
        seed=args.seed,
    )
    seqs.write.mode("overwrite").parquet(f"{args.output}/sequences")

    out = spark.read.parquet(f"{args.output}/sequences")
    report = (
        out.agg(
            F.count(F.lit(1)).alias("sequences"),
            F.coalesce(F.sum(F.size("ids")), F.lit(0)).alias("tokens"),
        )
        .collect()[0]
        .asDict()
    )
    report.update(
        {
            "seq_len": args.seq_len,
            "mode": args.mode,
            "merges": len(model.merges),
            "vocab": len(model.vocab()) + 2,
            "trained": trained,
        }
    )
    print(json.dumps({k: (int(v) if not isinstance(v, (str, bool)) else v) for k, v in report.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
