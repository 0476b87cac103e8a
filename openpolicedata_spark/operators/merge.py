"""Table merge with incident-ID key auto-detection.

Parity target: /root/reference/openpolicedata/data.py:312-389 (`Table.merge`)
and preproc.py:140-265 (`find_id_column`).

Spark mapping: `pd.merge` → `DataFrame.join`; Catalyst/AQE picks
broadcast vs sort-merge vs shuffled-hash by size. Key detection is a
driver-side schema heuristic (regexes over column names + a dtype
reconciliation probe on samples) — no data moves until the join runs.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from openpolicedata_spark.defs import Columns

# reference preproc.py:147 — incident-id column name pattern
_ID_PATTERN = re.compile(
    r"(incident|stop|case|event|report|complaint|master|tracking|order)"
    r"[_ ]?(id|num|number|no|code|#|key)",
    re.IGNORECASE,
)
_GENERIC_ID = re.compile(r"^(id|objectid|_id|key)$", re.IGNORECASE)


def find_id_column(left: DataFrame, right: DataFrame) -> Optional[str]:
    """Infer the shared incident-ID join key (reference preproc.py:140-265):
    prefer columns matching the incident-id regex present on both sides;
    fall back to generic id names; verify type compatibility."""
    shared = [c for c in left.columns if c in set(right.columns)]
    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)

    def compatible(c: str) -> bool:
        a, b = ltypes[c], rtypes[c]
        nums = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}
        return a == b or ({a.split("(")[0], b.split("(")[0]} <= nums)

    for pattern in (_ID_PATTERN, _GENERIC_ID):
        hits = [c for c in shared if pattern.search(c) and compatible(c)]
        if len(hits) == 1:
            return hits[0]
        if len(hits) > 1:
            # prefer the most specific (longest) name, reference word-split
            # fallback preproc.py:159-222
            return sorted(hits, key=lambda c: (-len(c), c))[0]
    return None


def merge_tables(
    left: DataFrame,
    right: DataFrame,
    *,
    on=None,
    left_on=None,
    right_on=None,
    how: str = "inner",
    std_id: bool = False,
    suffix: str = "_FromMerged",
    broadcast_right: Optional[bool] = None,
) -> DataFrame:
    """Join two related tables (reference data.py:312-389).

    `how` ∈ {inner, outer, left, right, cross}. Overlapping non-key columns
    on the right get `suffix` (reference suffixes (None,'_FromMerged')).
    `std_id=True` renames the key to the canonical INCIDENT_ID.
    `broadcast_right=True` forces a broadcast-hash join (small dim side);
    None lets AQE decide from runtime stats.
    """
    if how == "cross":
        return left.crossJoin(right)

    if on is None and left_on is None:
        on = find_id_column(left, right)
        if on is None:
            from openpolicedata_spark.exceptions import AutoMergeError

            raise AutoMergeError(
                "No join key given and none could be inferred; pass on=/left_on=/right_on="
            )

    # normalize every spelling to a key LIST; `on` may be str, list, or
    # None (None only when left_on was given)
    lk = ([left_on] if isinstance(left_on, str)
          else left_on or ([on] if isinstance(on, str) else on))
    rk = [right_on] if isinstance(right_on, str) else (right_on or lk)
    if not lk:
        raise ValueError("merge_tables needs on= or left_on=")
    if len(lk) != len(rk):
        raise ValueError(
            f"left_on/right_on length mismatch: {len(lk)} vs {len(rk)}")

    # Suffix overlapping non-key right columns (reference data.py:352-370).
    overlap = (set(left.columns) & set(right.columns)) - set(rk)
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, c + suffix)

    if broadcast_right:
        r = F.broadcast(r)

    if lk == rk:
        out = left.join(r, on=lk, how=how)
        key = lk[0]
    else:
        cond = None
        for a, b in zip(lk, rk):
            c = left[a] == r[b]
            cond = c if cond is None else (cond & c)
        out = left.join(r, on=cond, how=how)
        key = lk[0]

    if std_id and key in out.columns:
        out = out.withColumnRenamed(key, Columns.INCIDENT_ID)
    return out


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: "list[str]",
    tiebreak_col: Optional[str] = None,
    op_col: Optional[str] = None,
    delete_marker: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension type-2 builder (round 10, beyond-
    reference — the lakehouse step that turns a CDC/change LOG into
    versioned dimension rows): per key, order the change events,
    COMPRESS consecutive no-op changes (every value column equal to
    the previous change — re-emitted unchanged records are the normal
    CDC noise), then close each surviving version at the next one's
    timestamp: `valid_from` = its own ts, `valid_to` = lead(ts) (NULL
    on the current version), `is_current` = no later change.

    `op_col` makes the builder DELETE-aware (real CDC logs carry
    insert/update/delete): a row whose op equals `delete_marker`
    CLOSES the open version at its timestamp without opening one —
    the key simply has no current version until the next upsert.
    Delete runs compress like value runs (the second consecutive
    delete is a no-op), a re-insert after a delete is a NEW version
    even when the value matches the pre-delete one (the gap is real),
    and a delete row's value columns are ignored (CDC delete payloads
    are junk by convention). A NULL op is an UPSERT — pinned (ADVICE
    r11): CDC feeds use NULL/absent op for plain inserts, and without
    the coalesce three-valued logic would silently mask the row's
    values AND drop it from versions (a delete-like ghost). Without
    `op_col` every row is an upsert — the original semantics,
    unchanged.

    Plan shape: ONE hash exchange on the key feeds everything — the
    ordering window, the lag-compare compression, and the lead close
    all share the same partitioning, so Spark plans window → filter →
    window with no second shuffle. State per key is one sort, never
    the whole log in memory. `tiebreak_col` (e.g. the change id)
    makes same-timestamp changes deterministic — REQUIRED for an
    exact replay if the log can carry timestamp ties."""
    if not value_cols:
        raise ValueError("scd2_intervals needs at least one value column")
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col is not None else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # NULL op coalesces to not-a-delete (upsert) — see docstring
    is_del = (F.coalesce(F.col(op_col) == F.lit(delete_marker),
                         F.lit(False)) if op_col else F.lit(False))
    # run-state = (is_delete, values masked NULL on deletes): masking
    # makes consecutive deletes equal whatever junk their payload
    # carries, while the is_delete flag splits a value run around a
    # delete (re-insert after delete = new version)
    state_cols = [is_del] + [
        F.when(~is_del, F.col(c)) for c in value_cols]
    prev_same = None
    for s in state_cols:
        eq = F.lag(s).over(w).eqNullSafe(s)
        prev_same = eq if prev_same is None else (prev_same & eq)
    # first change per key: lag is NULL on every column -> eqNullSafe
    # is only true if the value is ALSO null; guard with row_number
    first = F.row_number().over(w) == 1
    kept = (changes
            .withColumn("__del__", is_del)
            .withColumn("__noop__", ~first & prev_same)
            .where(~F.col("__noop__")))
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (kept.select(
        key_col,
        *value_cols,
        F.col("__del__"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    ).where(~F.col("__del__")).drop("__del__"))
