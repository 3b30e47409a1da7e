"""CDC / upsert compaction — keep-latest-per-key with delete tombstones.

The MERGE-INTO half of a log pipeline the reference sidesteps by being
append-only (every indexed doc is immutable; mod.go's commit path only ever
adds batches): real telemetry tables receive out-of-order updates and
deletes, and compaction to current-state is the standard Iceberg/Delta
maintenance operation. Expressed as ONE window pass:

- row_number over (key) ordered by the change ordinal DESC -> latest row
  per key (Spark 4 plans the rn=1 filter as WindowGroupLimit: map tasks
  pre-prune to one candidate row per key per partition BEFORE the exchange,
  so the shuffle carries ~|keys| rows, not the full change log);
- a delete predicate on the surviving row drops tombstoned keys.

At 100 TB the change log is time-partitioned; compaction shuffles once on
the key — there is no cheaper shape (the latest row for a key can live in
any partition). On a key-bucketed table even that exchange disappears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def compact_latest(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delete_predicate: Column | None = None,
) -> DataFrame:
    """Current state of an upsert stream: the latest change per key
    (``order_cols`` DESC, later entries win; supply a unique ordinal —
    e.g. (ts, event_id) — for a deterministic winner), minus keys whose
    latest change satisfies ``delete_predicate`` (tombstones).

    Tombstone semantics match MERGE INTO ... WHEN MATCHED DELETE applied
    in log order: a delete followed by a later upsert resurrects the key;
    a delete as the last change removes it.
    """
    w = W.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if delete_predicate is not None:
        latest = latest.filter(~delete_predicate)
    return latest
