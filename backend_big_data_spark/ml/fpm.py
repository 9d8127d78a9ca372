"""Frequent-itemset mining / association rules (SURVEY.md §2.10 M4).

The reference feeds photo tag transactions to FPGrowth and filters rules by
an antecedent tag (``mlqueries.py:148-170``). Same operator here over any
array-of-string transaction column; itemsets/rules come back with arrays
sorted and stringified so output is deterministic and hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fit(transactions: DataFrame, items_col: str, min_support: float, min_confidence: float):
    from pyspark.ml.fpm import FPGrowth

    tx = transactions.select(F.array_distinct(F.col(items_col)).alias("items"))
    return FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=min_confidence
    ).fit(tx)


def frequent_itemsets(
    transactions: DataFrame,
    items_col: str,
    min_support: float = 0.5,
    min_confidence: float = 0.8,
    max_len: int | None = None,
) -> DataFrame:
    """(itemset, freq) with the itemset rendered as a sorted CSV string.

    ``max_len`` caps the itemset SIZE. Size-capped output is what makes
    the operator oracle-checkable: for a fixed minSupport, frequent
    itemsets of size ≤ k are a k-way self-join on per-transaction distinct
    items with a HAVING support threshold (the fixed-parameter trick used
    for fixed-centroid KMeans and LSH) — only the unbounded lattice /
    rule-mining path is inherently iterative.
    """
    model = _fit(transactions, items_col, min_support, min_confidence)
    sets = model.freqItemsets
    if max_len is not None:
        sets = sets.filter(F.size("items") <= max_len)
    return (
        sets.select(
            F.concat_ws(",", F.sort_array("items")).alias("itemset"),
            F.col("freq"),
        )
        .orderBy("itemset")
    )


def association_rules(
    transactions: DataFrame,
    items_col: str,
    min_support: float = 0.5,
    min_confidence: float = 0.8,
    antecedent_contains: str | None = None,
) -> DataFrame:
    """Rules (antecedent, consequent, confidence, lift, support) — the
    reference's optional antecedent filter (``mlqueries.py:167``) included."""
    model = _fit(transactions, items_col, min_support, min_confidence)
    rules = model.associationRules
    if antecedent_contains is not None:
        rules = rules.filter(F.array_contains("antecedent", antecedent_contains))
    return (
        rules.select(
            F.concat_ws(",", F.sort_array("antecedent")).alias("antecedent"),
            F.concat_ws(",", F.sort_array("consequent")).alias("consequent"),
            F.round("confidence", 6).alias("confidence"),
            F.round("lift", 6).alias("lift"),
            F.round("support", 6).alias("support"),
        )
        .orderBy("antecedent", "consequent")
    )
