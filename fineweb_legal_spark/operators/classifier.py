"""Distributed quality-classifier training + scoring (the DCLM /
FineWeb-Edu workflow stage the heuristic rules feed into: train a cheap
linear classifier on a labeled seed set, then score the whole corpus and
keep the top slice).

Model: logistic regression over hashed bag-of-words counts (the fastText
/ VW "hashing trick"), trained by full-batch gradient descent. Spark-first
shape, every stage scale-bounded:

- **Featurize once** (``featurize``): JVM-native explode + crc32 hashing +
  one map-side-combinable count aggregate, then one groupBy(doc) to
  assemble the sparse (indices, counts) arrays. The only word-level
  exchange carries distinct (doc, feature-idx) pairs — never text — and
  the result persists for the training loop.
- **Iterate without shuffles** (``train_quality_classifier``): each
  iteration broadcasts the weight vector and runs ONE zero-Exchange
  mapInPandas over the persisted features, emitting one partial
  (gradient-sum, count, loss-sum) row per Arrow batch; the driver sums
  partials (sorted for run-to-run stability) and steps. Per-iteration
  driver traffic is O(batches x dim) doubles — or exactly dim+3 rows
  with ``spark_reduce=True`` (posexplode + map-side-combinable per-index
  sum), the 10^6-batch scale path.
- **Score natively** (``score_quality``): the trained weights become a
  tiny (idx, w) table broadcast-joined onto the exploded corpus, one
  groupBy(doc) sum, sigmoid — no Python in the scoring path at all, so
  corpus-wide scoring is pure whole-stage-codegen + one bounded exchange.

Hashing is ``pmod(crc32(utf8(word)), dim)`` — chosen over xxhash64
because zlib.crc32 reproduces it exactly in Python, so tests can replay
the identical feature matrix in a numpy twin and assert the distributed
gradient path step-for-step. Tokens are the engine-wide ASCII-whitespace
lowercase words (decontam.ascii_words' boundary).

Determinism: featurization and scoring are exactly deterministic.
Training sums float64 partials; the driver sorts partials by batch key
before summing, so a fixed partitioning reproduces bit-identical weights,
and different partitionings agree to float-summation error (~1e-12 per
step; pytest-asserted against the twin at 1e-8).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS_RX = "[ \t\n\r\f\x0b]+"


def featurize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str | None = None,
    dim: int = 1 << 15,
) -> DataFrame:
    """(id[, label], idx: array<int>, cnt: array<double>) — hashed
    bag-of-words counts per document, sparse, sorted by idx. Null/empty
    texts yield empty arrays (they still train/score, as all-zero rows).
    """
    word = F.explode(
        F.array_remove(F.split(F.lower(F.col(text_col)), _WS_RX), "")
    ).alias("_w")
    cols = [F.col(id_col)] + (
        [F.col(label_col).cast("double").alias("_y")] if label_col else []
    )
    words = df.select(*cols, word)
    idx = F.pmod(F.crc32(F.encode(F.col("_w"), "utf-8")), F.lit(dim))
    grp = [id_col] + (["_y"] if label_col else [])
    counted = words.select(*grp, idx.cast("int").alias("_idx")).groupBy(
        *grp, "_idx"
    ).agg(F.count(F.lit(1)).cast("double").alias("_cnt"))
    assembled = counted.groupBy(*grp).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_idx"), F.col("_cnt")))
        ).alias("_p")
    )
    keep = df.select(*cols).dropDuplicates([id_col])
    out = keep.join(assembled, grp, "left").select(
        *grp,
        F.coalesce(
            F.col("_p._idx"), F.array().cast("array<int>")
        ).alias("idx"),
        F.coalesce(
            F.col("_p._cnt"), F.array().cast("array<double>")
        ).alias("cnt"),
    )
    return out.withColumnRenamed("_y", "label") if label_col else out


@dataclass
class TrainedClassifier:
    weights: np.ndarray  # dim floats
    bias: float
    dim: int
    losses: list[float]  # mean log-loss per iteration (pre-step)


def train_quality_classifier(
    spark: SparkSession,
    feats: DataFrame,
    dim: int = 1 << 15,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
    spark_reduce: bool = False,
) -> TrainedClassifier:
    """Full-batch logistic-regression GD over a ``featurize`` frame with a
    ``label`` column (0/1). One zero-Exchange Arrow pass per iteration;
    l2 applies to weights, not bias. Persist ``feats`` before calling —
    the loop scans it ``iters`` times.

    ``spark_reduce``: False (default) collects the per-batch gradient
    partials and sums them driver-side in sorted order — bit-reproducible
    for a fixed partitioning, driver traffic O(batches × dim) doubles
    (fine up to ~10^4 batches). True reduces the partials IN Spark
    (posexplode + map-side-combinable per-index sum), so the driver
    receives exactly dim+2 rows per iteration regardless of batch count —
    the 10^6-batch scale path; float sums then follow Spark's partial-agg
    order, reproducible only to float-summation error (~1e-12/step,
    pytest-pinned vs the driver path at 1e-8).
    """
    sc = spark.sparkContext
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("g", T.ArrayType(T.DoubleType())),
            T.StructField("gb", T.DoubleType()),
            T.StructField("n", T.LongType()),
            T.StructField("loss", T.DoubleType()),
        ]
    )
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    losses: list[float] = []
    for _ in range(iters):
        bc = sc.broadcast((w, b))

        def fn(
            batches: Iterator[pd.DataFrame], _bc=bc
        ) -> Iterator[pd.DataFrame]:
            wv, bv = _bc.value
            for k, pdf in enumerate(batches):
                g = np.zeros(dim, dtype=np.float64)
                gb = 0.0
                loss = 0.0
                ys = pdf["label"].to_numpy(dtype=np.float64)
                for y, ii, cc in zip(ys, pdf["idx"], pdf["cnt"]):
                    ii = np.asarray(ii, dtype=np.int64)
                    cc = np.asarray(cc, dtype=np.float64)
                    z = float(wv[ii] @ cc) + bv if len(ii) else bv
                    p = 1.0 / (1.0 + np.exp(-z))
                    loss += -(
                        y * np.log(max(p, 1e-12))
                        + (1 - y) * np.log(max(1 - p, 1e-12))
                    )
                    err = p - y
                    if len(ii):
                        np.add.at(g, ii, err * cc)
                    gb += err
                # first-row-id key (column 0 is the id regardless of its
                # name): stable partial ordering for the driver
                key = str(pdf.iloc[0, 0]) if len(pdf) else f"e{k}"
                yield pd.DataFrame(
                    {
                        "key": [key],
                        "g": [g],
                        "gb": [gb],
                        "n": [len(pdf)],
                        "loss": [loss],
                    }
                )

        partials = feats.mapInPandas(fn, schema)
        g = np.zeros(dim, dtype=np.float64)
        gb = 0.0
        loss = 0.0
        if spark_reduce:
            # one scan: scalars ride as three extra vector slots; dropping
            # exact zeros before the exchange is lossless (missing index
            # -> 0.0, the value it had)
            rows = (
                partials.select(
                    F.posexplode(
                        F.concat(
                            "g",
                            F.array(
                                "gb", F.col("n").cast("double"), "loss"
                            ),
                        )
                    ).alias("i", "v")
                )
                .filter(F.col("v") != 0.0)
                .groupBy("i")
                .agg(F.sum("v").alias("v"))
                .collect()
            )
            vec = np.zeros(dim + 3, dtype=np.float64)
            for r in rows:
                vec[r["i"]] = r["v"]
            g = vec[:dim]
            gb = float(vec[dim])
            n = int(round(vec[dim + 1]))
            loss = float(vec[dim + 2])
            if n == 0:
                raise ValueError("empty training frame")
        else:
            parts = sorted(
                partials.collect(), key=lambda r: r["key"]
            )
            n = sum(r["n"] for r in parts)
            if n == 0:
                raise ValueError("empty training frame")
            for r in parts:
                g += np.asarray(r["g"], dtype=np.float64)
                gb += r["gb"]
                loss += r["loss"]
        losses.append(loss / n)
        w -= lr * (g / n + l2 * w)
        b -= lr * (gb / n)
        bc.destroy()
    return TrainedClassifier(weights=w, bias=b, dim=dim, losses=losses)


def score_quality(
    spark: SparkSession,
    df: DataFrame,
    model: TrainedClassifier,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """df + ``quality_prob`` (sigmoid of the linear score, rounded to 6) —
    pure JVM path: explode words, broadcast-join the nonzero-weight (idx,
    w) table, one per-doc sum. Wordless/null docs score sigmoid(bias).
    """
    nz = np.nonzero(model.weights)[0]
    wtab = spark.createDataFrame(
        pd.DataFrame(
            {"_idx": nz.astype("int32"), "_w": model.weights[nz]}
        ),
        schema="_idx int, _w double",
    )
    word = F.explode(
        F.array_remove(F.split(F.lower(F.col(text_col)), _WS_RX), "")
    ).alias("_w0")
    idx = F.pmod(
        F.crc32(F.encode(F.col("_w0"), "utf-8")), F.lit(model.dim)
    ).cast("int")
    sums = (
        df.select(F.col(id_col), word)
        .select(id_col, idx.alias("_idx"))
        .join(F.broadcast(wtab), "_idx")
        .groupBy(id_col)
        .agg(F.sum("_w").alias("_z"))
    )
    prob = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_z"), F.lit(0.0)) + F.lit(model.bias)))),
        6,
    )
    return df.join(sums, id_col, "left").withColumn(
        "quality_prob", prob
    ).drop("_z")


def keep_top_fraction(
    df: DataFrame,
    score_col: str = "quality_prob",
    fraction: float = 0.1,
    accuracy: int = 10000,
) -> DataFrame:
    """Corpus curation by score: keep rows whose ``score_col`` is at or
    above the (1 - fraction) quantile — the FineWeb-Edu / DCLM "keep the
    top p% by classifier score" selection step.

    The threshold is a single approx_percentile aggregate (one map-side-
    combinable pass, driver receives one double) broadcast-cross-joined
    back — fully lazy, no eager action at plan build, no full sort. The
    sketch error (~1/accuracy quantile mass) moves the CUT POINT slightly,
    it never reorders rows — the documented trade vs an exact full-sort
    percentile at 10^12 rows. Ties at the threshold all
    keep (>=), so the kept fraction can exceed ``fraction`` on heavily
    tied scores.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError("fraction must be in (0, 1]")
    thr = df.agg(
        F.percentile_approx(
            score_col, F.lit(1.0 - fraction), F.lit(accuracy)
        ).alias("_thr")
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(score_col) >= F.col("_thr"))
        .drop("_thr")
    )


def calibration_curve(
    df: DataFrame,
    prob_col: str = "quality_prob",
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram input for a trained scorer: rows bucketed by
    predicted probability into `bins` equal-width bins over [0, 1],
    per-bin (n, mean_prob, frac_pos). A well-calibrated classifier has
    mean_prob ≈ frac_pos per bin; the curve decides whether
    keep_top_fraction's threshold means what the probability claims.

    One groupBy over a codegen'd bin expression — the exchange carries
    at most `bins` rows per partition. prob exactly 1.0 lands in the top
    bin (clamped), NULL prob/label rows are excluded (reported via the
    n_excluded row with bin = -1 so the audit never silently shrinks).
    """
    p = F.col(prob_col)
    y = F.col(label_col).cast("double")
    ok = p.isNotNull() & y.isNotNull()
    bin_ = F.when(
        ok, F.least(F.floor(p * bins).cast("int"), F.lit(bins - 1))
    ).otherwise(F.lit(-1))
    return (
        df.groupBy(bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.when(ok, p)), 6).alias("mean_prob"),
            F.round(F.avg(F.when(ok, y)), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )
