"""Distributed per-group ranking — row_number() without ever sorting
a whole group in one task.

`Window.partitionBy(g).orderBy(o)` ships EVERY row of group g to one
task and sorts it there. When groups are few and huge (rank docs
within ~10 sources over 100 TB; rank within ~5 language strata), each
window partition is a meaningful fraction of the corpus — one
straggler task holds a whole source while 999 executors idle. The
repo already owns the scale-safe alternative for the global case
(`operators/export.global_shuffle_index`, a two-level bucket prefix
sum); this module generalizes it to per-GROUP ranking so every
per-group consumer shares one audited implementation:

  1. bucket each row by a caller-supplied integral expression that is
     monotone non-decreasing along the requested order (equal order
     keys must land in equal buckets — automatic when the bucket is a
     function of the leading order key);
  2. count rows per (group, bucket) — one small agg;
  3. exclusive running offsets per group over the bucket totals (a
     window over the |groups|x|buckets| COUNT frame, partitioned by
     group: each window partition is |buckets| rows, constant at any
     data scale);
  4. broadcast the offsets back and row_number within (group,
     bucket) — the big window now shuffles AND sorts on (group,
     bucket), so a group's rows spread over |buckets| tasks.

rank = offset + within-bucket row_number, exactly equal to
ROW_NUMBER() OVER (PARTITION BY group ORDER BY order_cols) because
the bucket is monotone along the order. Consumers keep their existing
DuckDB oracles untouched — the plain window IS the spec; this is the
physical strategy.

When the caller knows it only needs ranks <= K (top-K / quota /
exact-allocation sampling), `max_rank` prunes every bucket whose
exclusive offset already reaches K BEFORE the big window runs — the
surviving work is O(groups * K), not O(rows), turning a corpus-wide
sort into a near-noop. `max_rank` may reference the per-group total
row count as `_gn` (e.g. an exact ceil(n*num/den) allocation).

The reference engine has no distributed ranking at all (single
process, pandas/polars sorts); this is the scale extension that makes
its per-source ordering semantics survive a 1000-executor cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

BUCKET_COL = "_db"


def distributed_rank(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[Column],
    bucket: Column,
    *,
    rank_name: str = "rank_",
    max_rank: int | Column | None = None,
    group_count_name: str | None = None,
    method: str = "row_number",
    pre_partition: bool = False,
) -> DataFrame:
    """Add 1-based ``rank_name`` = ROW_NUMBER() OVER (PARTITION BY
    part_cols ORDER BY order_cols) via the two-level bucket prefix
    sum. ``method="rank"`` computes RANK() instead (ties share the
    rank) — valid because equal order keys land in equal buckets, so
    a tie group can never straddle a bucket boundary and the
    exclusive offset stays exact.

    ``bucket`` must be an integral Column, monotone non-decreasing
    along ``order_cols`` within each group (equal order keys -> equal
    bucket). Monotonicity is what makes offset + within-bucket rank
    equal the global within-group rank; bucket-size BALANCE is purely
    a performance concern (a quantized uniform hash or a value-range
    bin both work).

    ``max_rank``: optional pruning bound — buckets whose exclusive
    offset is already >= max_rank are dropped before the big window
    (their rows' ranks would all exceed it). Rows that survive carry
    exact ranks; rows with rank > max_rank MAY still appear (the
    bucket containing the cutoff passes whole) — callers filter
    ``rank_name <= bound`` as they would after a plain window. May be
    an int or a Column over the per-group total ``_gn``.

    ``group_count_name``: also expose the per-group total row count
    under this name (computed from the bucket totals — no extra pass
    over the data, unlike COUNT() OVER (PARTITION BY g)).

    ``pre_partition``: insert an explicit repartition on (part_cols,
    bucket) before the two consumers. The totals aggregate and the
    final join/window are SEPARATE subtrees over ``df``, so Spark
    evaluates the upstream twice; when that upstream is expensive
    (tokenize-heavy signals), the shared Exchange lets the runtime
    reuse one evaluation and the window's required distribution is
    already satisfied. Skip it when the upstream is a cheap scan —
    the extra shuffle costs more than the re-scan saves.
    """
    rows = df.withColumn(BUCKET_COL, bucket.cast("bigint"))
    if pre_partition:
        rows = rows.repartition(*part_cols, BUCKET_COL)
    totals = rows.groupBy(*part_cols, BUCKET_COL).agg(
        F.count(F.lit(1)).alias("_n")
    )
    off_win = (
        Window.partitionBy(*part_cols)
        .orderBy(BUCKET_COL)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    gn_win = Window.partitionBy(*part_cols)
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_win), F.lit(0))
    ).withColumn("_gn", F.sum("_n").over(gn_win))
    if max_rank is not None:
        bound = F.lit(max_rank) if isinstance(max_rank, int) else max_rank
        offsets = offsets.filter(F.col("_off") < bound)
    offsets = offsets.select(*part_cols, BUCKET_COL, "_off", "_gn")

    in_win = Window.partitionBy(*part_cols, BUCKET_COL).orderBy(*order_cols)
    in_rank = (
        F.rank().over(in_win) if method == "rank" else F.row_number().over(in_win)
    )
    out = (
        rows.join(F.broadcast(offsets), [*part_cols, BUCKET_COL])
        .withColumn(rank_name, (F.col("_off") + in_rank).cast("bigint"))
    )
    if group_count_name is not None and group_count_name != "_gn":
        out = out.withColumn(group_count_name, F.col("_gn"))
    drops = [BUCKET_COL, "_off"]
    if group_count_name != "_gn":  # keep it when the caller asked by that name
        drops.append("_gn")
    return out.drop(*drops)


def range_bucket(
    df: DataFrame, value_col: str, *, n_buckets: int = 4096, descending: bool = False
) -> tuple[DataFrame, Column]:
    """Equal-width value-range bucketing for a NUMERIC leading order
    key whose distribution is unknown: one 1-row min/max agg
    (broadcast fold — no shuffle of the data), then
    bucket = (value - min) DIV width with width = ceil(range /
    n_buckets) so bucket ids stay in [0, n_buckets).
    ``descending=True`` flips the bucket to (max - value) DIV width so
    ascending bucket order follows a DESC sort.

    Returns (df extended with the broadcast bounds, bucket Column) —
    feed both straight into distributed_rank. Integer arithmetic only
    (DIV, no floats), so the bucketing is deterministic across runs.
    """
    v = F.col(value_col).cast("bigint")
    bounds = df.agg(F.min(v).alias("_rbmin"), F.max(v).alias("_rbmax"))
    ext = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_rbw",
        F.expr(
            f"greatest(1, (_rbmax - _rbmin + {n_buckets}) div {n_buckets})"
        ),
    )
    lead = (
        f"(_rbmax - cast({value_col} as bigint))"
        if descending
        else f"(cast({value_col} as bigint) - _rbmin)"
    )
    return ext, F.expr(f"{lead} div _rbw")
