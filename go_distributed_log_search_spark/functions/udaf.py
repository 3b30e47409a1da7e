"""Vectorized UDAFs (GROUPED_AGG pandas_udf) — the aggregate member of
the §2.10 UDF surface.

Scale note (by design, documented at the call sites): grouped-agg pandas
UDFs get NO partial aggregation — every raw row shuffles to its group's
reducer — so any aggregate with a built-in decomposition (geometric mean
= exp(avg(ln))) should use the Catalyst form on the hot path. A UDAF
earns its shuffle only when no such decomposition exists.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def geomean_plus1(v: pd.Series) -> float:
    """Geometric mean of |v|+1 over the group, one Arrow batch per group."""
    import numpy as np

    return float(np.exp(np.log(np.abs(v.to_numpy()) + 1.0).mean()))
