"""Training-dynamics scores for data curation: per-example difficulty
from probability vectors (EL2N, margins, entropy) and dataset
cartography (confidence / variability / correctness over epochs).

Published basis — implemented from the papers' formulas, not any
codebase:

- EL2N (error L2-norm) data pruning: Paul, Ganguli & Dziugaite,
  "Deep Learning on a Data Diet" (NeurIPS 2021): the examples with the
  largest ``||p - onehot(y)||_2`` early in training carry most of the
  learning signal; pruning by EL2N keeps accuracy at a fraction of the
  data. The identity ``sum_j (p_j - 1[j=y])^2 = sum_j p_j^2 - 2 p_y + 1``
  lets the score run as pure array algebra with no one-hot materialized.
- Acquisition scores (active learning standard): predictive entropy,
  least-confidence ``1 - max_j p_j``, top-2 margin.
- Dataset cartography: Swayamdipta et al., "Dataset Cartography"
  (EMNLP 2020): per example, confidence = mean_e p_true(e),
  variability = population std over epochs, correctness = fraction of
  epochs predicted correctly; the (confidence, variability) plane
  splits a corpus into easy-to-learn / ambiguous / hard-to-learn
  regions (hard + low-variability is where label errors concentrate).

Reference context: modlyn trains per-epoch and keeps only final
weights (`/root/reference/modlyn/models/_simple_logreg.py`); these
operators are the curation layer a platform derives FROM such training
logs to decide what data to keep.

Physical plans:

- ``acquisition_scores`` is shuffle-free: every score is a JVM
  higher-order-function expression over the probability array (one
  ``aggregate`` fold per score, ``array_sort`` for the top-2 margin) —
  zero Python, zero exchange, a single map-only pass that rides along
  any existing scan at 100 TB. (HOFs run as CodegenFallback expressions
  inside the stage: JVM-interpreted, no codegen CSE — feed MATERIALIZED
  array columns, not lazily-composed array expressions, or the argument
  subtree re-evaluates per element; see labelerrors.py input contract.)
- ``dataset_cartography`` is ONE groupBy(id) over (p_true, correct) —
  map-side combinable sums (count/sum/sum-of-squares/sum-correct), so
  the shuffle carries one partial row per (partition, id), and the
  variability comes from the exact ``sqrt(E[x^2] - E[x]^2)`` identity
  computed from the combined sums (no second pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Left-fold sum of a double array (explicit element order, so the
    float stream is reproducible on any engine that folds in order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def acquisition_scores(
    df: DataFrame,
    probs_col: str,
    label_idx_col: str | None = None,
) -> DataFrame:
    """Append per-row difficulty/acquisition scores from a probability
    vector column (``array<float|double>``, one entry per class).

    Always added (unsupervised scores):

    - ``entropy``: ``-sum_j p_j ln p_j`` with ``0 ln 0 = 0``.
    - ``least_confidence``: ``1 - max_j p_j``.
    - ``margin_top2``: top-1 minus top-2 probability (low = ambiguous).

    With ``label_idx_col`` (0-based gold class index) also added:

    - ``p_true``: probability of the gold class.
    - ``el2n``: ``||p - onehot(y)||_2`` via the expanded identity
      ``sqrt(sum p^2 - 2 p_true + 1)`` (Paul et al. 2021).
    - ``margin_true``: ``p_true - max_{j != y} p_j`` (negative means
      the model prefers another class — a label-error signal).
    - ``is_correct``: argmax (first index on ties) equals the label.

    Rows with a NULL probability vector get NULL scores; a NULL or
    out-of-range label index yields NULL for the supervised scores.
    The max-over-others in ``margin_true`` resolves duplicates by
    first-occurrence argmax: if the global max sits at the label's own
    index, the runner-up of the descending sort is the others-max
    (correct even when several entries tie at the max).
    """
    p = F.transform(F.col(probs_col), lambda x: x.cast("double"))
    out = df.withColumn("__p", p)
    pc = F.col("__p")

    ent = -_fold_sum(
        F.transform(pc, lambda x: F.when(x > 0.0, x * F.log(x)).otherwise(0.0))
    )
    mx = F.array_max(pc)
    desc = F.reverse(F.array_sort(pc))
    out = (
        out.withColumn("entropy", ent)
        .withColumn("least_confidence", F.lit(1.0) - mx)
        .withColumn(
            "margin_top2",
            F.when(
                F.size(pc) >= 2, F.element_at(desc, 1) - F.element_at(desc, 2)
            ).otherwise(F.lit(None).cast("double")),
        )
    )

    if label_idx_col is not None:
        y = F.col(label_idx_col).cast("int")
        valid = y.isNotNull() & (y >= 0) & (y < F.size(pc))
        p_true = F.when(valid, F.element_at(pc, y + 1))
        sum_sq = _fold_sum(F.transform(pc, lambda x: x * x))
        el2n = F.when(valid, F.sqrt(sum_sq - 2.0 * p_true + 1.0))
        # first-occurrence argmax (array_position returns the FIRST
        # match, 1-based) — identical tie policy to list_position
        argmax0 = F.array_position(pc, F.array_max(pc)) - 1
        others_max = F.when(argmax0 == y, F.element_at(desc, 2)).otherwise(
            F.element_at(desc, 1)
        )
        out = (
            out.withColumn("p_true", p_true)
            .withColumn("el2n", el2n)
            .withColumn(
                "margin_true",
                F.when(valid & (F.size(pc) >= 2), p_true - others_max),
            )
            .withColumn(
                "is_correct",
                F.when(valid, argmax0 == y).otherwise(
                    F.lit(None).cast("boolean")
                ),
            )
        )
    return out.drop("__p")


def dataset_cartography(
    df: DataFrame,
    id_cols: str | list[str],
    p_true_col: str,
    correct_col: str,
    *,
    conf_easy: float = 0.75,
    conf_hard: float = 0.25,
    var_ambiguous: float = 0.2,
) -> DataFrame:
    """Per-example training-dynamics map (Swayamdipta et al. 2020) from
    a long table of per-epoch rows ``(id, p_true, correct)``.

    Output per id: ``n_epochs``, ``confidence`` (mean p_true),
    ``variability`` (population std of p_true, exact
    ``sqrt(E[x^2]-E[x]^2)`` from combined sums), ``correctness``
    (fraction of epochs with ``correct`` true), and ``region``:

    - ``ambiguous`` when ``variability >= var_ambiguous`` (checked
      first — high-variance examples are ambiguous regardless of mean),
    - else ``easy`` when ``confidence >= conf_easy``,
    - else ``hard`` when ``confidence <= conf_hard``,
    - else ``mid``.

    NULL ``p_true`` epochs are excluded from confidence/variability but
    still count into ``correctness``'s denominator iff ``correct`` is
    non-NULL. ONE map-side-combinable groupBy — the shuffle carries
    4 partial sums per (partition, id)."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    x = F.col(p_true_col).cast("double")
    agg = df.groupBy(*ids).agg(
        F.count(x).alias("__n"),
        F.sum(x).alias("__s"),
        F.sum(x * x).alias("__ss"),
        F.count(F.col(correct_col)).alias("__nc"),
        F.sum(F.col(correct_col).cast("int")).alias("__c"),
    )
    conf = F.col("__s") / F.col("__n")
    # greatest(0, ·): the E[x^2]-E[x]^2 identity can go a few ulps
    # negative on constant streams
    var = F.sqrt(
        F.greatest(
            F.lit(0.0), F.col("__ss") / F.col("__n") - conf * conf
        )
    )
    corr = F.when(
        F.col("__nc") > 0, F.col("__c") / F.col("__nc")
    ).otherwise(F.lit(None).cast("double"))
    region = (
        F.when(F.col("__n") == 0, F.lit(None).cast("string"))
        .when(var >= F.lit(float(var_ambiguous)), F.lit("ambiguous"))
        .when(conf >= F.lit(float(conf_easy)), F.lit("easy"))
        .when(conf <= F.lit(float(conf_hard)), F.lit("hard"))
        .otherwise(F.lit("mid"))
    )
    return (
        agg.withColumn("n_epochs", F.col("__n").cast("long"))
        .withColumn("confidence", F.when(F.col("__n") > 0, conf))
        .withColumn("variability", F.when(F.col("__n") > 0, var))
        .withColumn("correctness", corr)
        .withColumn("region", region)
        .drop("__n", "__s", "__ss", "__nc", "__c")
    )
