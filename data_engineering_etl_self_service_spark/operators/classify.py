"""Distributed Naive Bayes text classification — the model-based quality
filter of the fastText-classifier lineage (Joulin et al., 2016; the
CCNet/RefinedWeb curation stage that follows the heuristic filters), as
pure DataFrame aggregations.

Two standard variants share one trained model table:

- **multinomial NB** (token-count likelihoods) — the graded score; its
  posterior odds track how strongly a document's word usage matches the
  positive class.
- **Bernoulli NB** (per-vocab-word presence/absence likelihoods) — the
  decision rule; absence evidence lets it separate classes whose
  difference is *which* words occur, which multinomial NB cannot see
  when the class priors are imbalanced (an absent word contributes no
  multinomial factor at all).

Everything is bit-reproducible against a SQL oracle: the model is exact
integer counts; scoring converts them to IEEE doubles through a pinned
expression shape — ``q = (count + 1.0) / (total + smoothing)`` then
``factor = q_pos / q_neg`` — and folds the factors in a pinned order
(token position for multinomial, vocab word for Bernoulli) with a
left-to-right product. Doubles produced by the same operation sequence
on the same exact integers are bit-equal across Spark, DuckDB, and
Python (the Viterbi/cosine contract), so even the float odds columns
hash-match. No ``log`` anywhere — libm vs JVM ``Math.log`` can differ
in the last ulp; products and divisions cannot.

Scale: training is one token explode + one map-side-combined groupBy —
the corpus is read once. Multinomial scoring joins the token stream to
the model on the token key (key-partitioned; a 100 TB vocabulary
outgrows a broadcast, though AQE will broadcast the small-model case
automatically). Bernoulli scoring is |docs| x |V| by definition — V is
a bounded feature vocabulary (top-k selection upstream is standard
practice), so the model side is a broadcast and the grid stays linear
in the corpus. The per-document fold state is one double.

No reference equivalent: the reference pipeline (~400 lines of Airflow
glue) has no model-based scoring stage; this generalizes its DQ checks
(operators/data_quality.py) from fixed rules to learned ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nb_train(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """Train both NB variants over ``docs`` with a boolean ``label_col``.

    Returns ``(model, meta)``:

    - ``model``: one row per training-corpus token type —
      ``(w, c_pos, c_neg, df_pos, df_neg)`` — multinomial token counts
      and Bernoulli document frequencies, all exact BIGINTs.
    - ``meta``: one row — ``(t_pos, t_neg, v, n_pos, n_neg)`` — class
      token totals, vocab size, and class document counts.

    One explode + one groupBy for the model; the meta row aggregates
    the model table (bounded) and the doc labels — no second corpus
    pass over text.
    """
    from ..functions.text import tokens

    # spread_scan measured worse here (tiny vocabulary — the model agg
    # collapses map-side; the exchange buys nothing back)
    tk = docs.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_y"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    model = tk.groupBy("w").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("long").alias("c_pos"),
        F.sum(F.when(F.col("_y"), 0).otherwise(1)).cast("long").alias("c_neg"),
        F.countDistinct(F.when(F.col("_y"), F.col("_id")))
        .cast("long")
        .alias("df_pos"),
        F.countDistinct(F.when(~F.col("_y"), F.col("_id")))
        .cast("long")
        .alias("df_neg"),
    )
    totals = model.agg(
        F.sum("c_pos").cast("long").alias("t_pos"),
        F.sum("c_neg").cast("long").alias("t_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    priors = docs.agg(
        F.sum(F.when(F.col(label_col), 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(~F.col(label_col), 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
    )
    return model, totals.crossJoin(priors)


def _prior_odds() -> F.Column:
    return (F.col("n_pos") + F.lit(1.0)) / (F.col("n_neg") + F.lit(1.0))


def nb_score_multinomial(
    docs: DataFrame,
    model: DataFrame,
    meta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial posterior odds per document:
    ``odds = prior_odds * PROD_i ratio(w_i)`` over the document's tokens
    in position order, with Laplace-smoothed likelihood ratios
    ``ratio(w) = ((c_pos+1)/(t_pos+V)) / ((c_neg+1)/(t_neg+V))`` (OOV
    tokens take the c=0 ratio). Output: ``(id_col, n_tokens,
    mult_odds)``.

    The fold multiplies an array sorted by token position — a pinned
    reduction order, so the double is reproducible regardless of
    partitioning (collect_list order is not deterministic; the
    array_sort makes it irrelevant).
    """
    from ..functions.text import tokens

    tk = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "w"),
    )
    j = tk.join(model.select("w", "c_pos", "c_neg"), "w", "left").crossJoin(
        F.broadcast(meta)
    )
    ratio = (
        (F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(1.0))
        / (F.col("t_pos") + F.col("v")).cast("double")
    ) / (
        (F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(1.0))
        / (F.col("t_neg") + F.col("v")).cast("double")
    )
    agg = j.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), ratio.alias("r")))
        ).alias("arr"),
        F.min("n_pos").alias("n_pos"),
        F.min("n_neg").alias("n_neg"),
    )
    return agg.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        (
            _prior_odds()
            * F.aggregate(
                F.transform(F.col("arr"), lambda x: x["r"]),
                F.lit(1.0),
                lambda acc, x: acc * x,
            )
        ).alias("mult_odds"),
    )


def nb_score_bernoulli(
    docs: DataFrame,
    model: DataFrame,
    meta: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bernoulli posterior odds per document:
    ``odds = prior_odds * PROD_w factor(w)`` over the ENTIRE model
    vocabulary in word order, where a word present in the document
    contributes ``p_pos/p_neg`` and an absent word
    ``(1-p_pos)/(1-p_neg)``, with ``p = (df+1)/(n_docs+2)``. Output:
    ``(id_col, bern_odds)``.

    The doc x vocab grid is a broadcast crossJoin — Bernoulli NB is
    defined over a bounded feature vocabulary, so the grid is linear in
    the corpus with a constant factor of |V|.
    """
    from ..functions.text import tokens

    present = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("w"),
        )
        .withColumn("has", F.lit(True))
    )
    grid = docs.select(F.col(id_col).alias("_id")).crossJoin(
        F.broadcast(model.select("w", "df_pos", "df_neg"))
    )
    g = grid.join(present, ["_id", "w"], "left").crossJoin(F.broadcast(meta))
    p_pos = (F.col("df_pos") + F.lit(1.0)) / (F.col("n_pos") + F.lit(2.0))
    p_neg = (F.col("df_neg") + F.lit(1.0)) / (F.col("n_neg") + F.lit(2.0))
    factor = F.when(F.col("has"), p_pos / p_neg).otherwise(
        (F.lit(1.0) - p_pos) / (F.lit(1.0) - p_neg)
    )
    agg = g.groupBy("_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("w"), factor.alias("f")))
        ).alias("arr"),
        F.min("n_pos").alias("n_pos"),
        F.min("n_neg").alias("n_neg"),
    )
    return agg.select(
        F.col("_id").alias(id_col),
        (
            _prior_odds()
            * F.aggregate(
                F.transform(F.col("arr"), lambda x: x["f"]),
                F.lit(1.0),
                lambda acc, x: acc * x,
            )
        ).alias("bern_odds"),
    )
