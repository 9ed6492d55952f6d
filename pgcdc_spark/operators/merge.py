"""Batch MERGE INTO — the full three-branch SQL MERGE surface as one
DataFrame operator.

The reference's only write pattern is append-style forwarding
(/root/reference/src/main.ts:69-90); a warehouse consumer of the same
feed wants the declarative upsert every lakehouse exposes:

    WHEN MATCHED [AND cond] THEN UPDATE SET ... | DELETE
    WHEN NOT MATCHED [BY TARGET] THEN INSERT ...
    WHEN NOT MATCHED BY SOURCE THEN DELETE

Spark has no built-in MERGE for bare parquet (it's a Delta/Iceberg verb),
but the semantics reduce to ONE full-outer equi-join plus row-local
CASE expressions — entirely JVM-side, one shuffle on the merge keys
(Catalyst broadcasts a small source automatically), so the operator
scales exactly like any keyed join. Deterministic by construction: the
caller must guarantee source keys are unique (standard MERGE
precondition; duplicates would update a target row twice in undefined
order — we fail loudly instead). The uniqueness guard is EMBEDDED in
the plan (a per-key window count + raise_error), so building the merge
runs no eager job and the failure surfaces at execution exactly like
Delta/Iceberg's "multiple source rows matched" error.

Expression convention: clause expressions reference the two sides via
the ``T("col")`` / ``S("col")`` helpers (target/source columns of the
underlying join aliases).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def T(col: str) -> Column:  # noqa: N802 - mirrors MERGE's target alias
    """Target-side column reference inside a merge clause."""
    return F.col(f"__mt.{col}")


def S(col: str) -> Column:  # noqa: N802 - mirrors MERGE's source alias
    """Source-side column reference inside a merge clause."""
    return F.col(f"__ms.{col}")


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    when_matched_update: dict[str, Column] | None = None,
    when_matched_delete: Column | None = None,
    when_not_matched_insert: dict[str, Column] | None = None,
    when_not_matched_by_source_delete: Column | bool = False,
    check_unique_source: bool = True,
) -> DataFrame:
    """Apply MERGE semantics and return the post-merge target relation
    (same schema as ``target``).

    Branch rules (SQL MERGE):
    - key in both: ``when_matched_delete`` (if given and true) drops the
      row; else ``when_matched_update`` rewrites the listed columns
      (unlisted columns keep their target values); with neither, the
      target row passes through;
    - key only in source: inserted iff ``when_not_matched_insert`` is
      given — listed columns evaluate their expressions, unlisted ones
      are NULL (join keys default to the source key);
    - key only in target: dropped iff ``when_not_matched_by_source_delete``
      is True / evaluates true.
    """
    t = target.withColumn("__t_present", F.lit(1)).alias("__mt")
    if check_unique_source:
        # Plan-embedded guard: the source-side presence marker evaluates
        # raise_error for any key with >1 source row. The window
        # partitions on the same keys the join shuffles on (exchange
        # reuse), and no job runs until the merge itself executes.
        from pyspark.sql import Window

        dup_n = F.count(F.lit(1)).over(Window.partitionBy(*on))
        # NULL merge keys never match (plain-equality ON below), so two
        # NULL-key source rows are NOT duplicates — each takes the NOT
        # MATCHED INSERT branch independently, per standard MERGE.
        null_key = None
        for k in on:
            nk = F.col(k).isNull()
            null_key = nk if null_key is None else (null_key | nk)
        present = F.when(null_key | (dup_n <= 1), F.lit(1)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("MERGE source has duplicate merge keys: ("),
                    F.concat_ws(", ", *[F.col(k).cast("string") for k in on]),
                    F.lit(")"),
                )
            ).cast("int")
        )
    else:
        present = F.lit(1)
    s = source.withColumn("__s_present", present).alias("__ms")
    # Plain equality, not eqNullSafe: SQL MERGE treats NULL keys as never
    # matching — a NULL-key source row inserts, a NULL-key target row
    # falls into the NOT MATCHED BY SOURCE branch (round-6 review).
    cond = None
    for k in on:
        c = T(k) == S(k)
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    matched = T("__t_present").isNotNull() & S("__s_present").isNotNull()
    only_source = T("__t_present").isNull()
    only_target = S("__s_present").isNull()

    # row survival per branch
    if when_matched_delete is not None:
        keep_matched = ~F.coalesce(when_matched_delete, F.lit(False))
    else:
        keep_matched = F.lit(True)
    keep_insert = F.lit(when_not_matched_insert is not None)
    if when_not_matched_by_source_delete is True:
        keep_only_target = F.lit(False)
    elif when_not_matched_by_source_delete is False:
        keep_only_target = F.lit(True)
    else:
        keep_only_target = ~F.coalesce(when_not_matched_by_source_delete, F.lit(False))

    keep = (
        F.when(matched, keep_matched)
        .when(only_source, keep_insert)
        .otherwise(keep_only_target)
    )

    update = when_matched_update or {}
    insert = dict(when_not_matched_insert or {})
    for k in on:  # join keys default to the source key on insert
        insert.setdefault(k, S(k))

    out_cols = []
    for field in target.schema.fields:
        c = field.name
        base = T(c)
        matched_val = update.get(c, base)
        insert_val = insert.get(c, F.lit(None))
        expr = (
            F.when(matched, matched_val)
            .when(only_source, insert_val)
            .otherwise(base)
        )
        out_cols.append(expr.cast(field.dataType).alias(c))

    return joined.filter(keep).select(*out_cols)
