"""Custom aggregate functions (pandas GROUPED_AGG UDAFs).

SURVEY §2.4 notes the reference has no UDAFs (and no aggregate beyond the
built-ins); Spark's missing-aggregate escape hatch is the Arrow-batched
GROUPED_AGG pandas UDF — a REAL custom aggregate usable inside
``groupBy().agg(...)`` (and as a window function), unlike grouped-map
``applyInPandas`` which rewrites whole groups.

Demonstrated with the geometric mean — genuinely absent from Spark's
built-ins, standard for averaging ratios/multiplicative quantities.

Scale notes: GROUPED_AGG ships each group's column to Python as ONE Arrow
batch — no partial aggregation, the whole group materializes per key.
Fine for bounded groups (per-priority, per-day); for unbounded groups
prefer an algebraic rewrite on JVM expressions when one exists — the
geometric mean HAS one (``exp(avg(ln(x)))``, see the twin below), which
is the production form; the UDAF exists to prove the extension point for
aggregates with NO such rewrite (e.g. exact medians of bounded groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(log v)) over the group's positive values (GROUPED_AGG)."""
    arr = v.to_numpy(dtype="float64")
    # positive subset only — matches the algebraic twin, where F.log
    # returns NULL for x <= 0 and avg skips nulls; an all-non-positive
    # group yields NULL in both forms
    arr = arr[arr > 0]
    if arr.size == 0:
        return None
    return float(np.exp(np.log(arr).mean()))


def geometric_mean_expr(col: Column) -> Column:
    """The algebraic JVM twin — partial-aggregation-friendly, the form to
    use at scale; the UDAF must agree with it (tested)."""
    return F.exp(F.avg(F.log(col)))


__all__ = ["geometric_mean", "geometric_mean_expr"]
