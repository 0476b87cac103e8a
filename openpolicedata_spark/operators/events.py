"""Event-sequence analytics: ordered funnels over an event log.

Beyond-reference capability (the reference has no event tables); the
batch face of the streaming module's sessionization/window family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(df: DataFrame, stages: Sequence[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts") -> DataFrame:
    """Ordered-funnel match: users who performed `stages` in temporal
    order, each stage matched greedily to the EARLIEST event strictly
    after the previous stage (the standard product-analytics funnel;
    strict inequality makes the match unambiguous under timestamp ties).

    Plan shape: one chained per-user min aggregation per stage. The
    first stage shuffles per-user aggregates of the filtered raw events;
    every later stage joins the (tiny) per-user frontier back to one
    filtered slice of the input and reduces again — per-stage cost is
    O(events of that type), state is O(users), at any scale. The
    stage-k filter prunes the scan (predicate pushdown), so each pass
    reads only its own event type.

    Output: `user_col`, then one timestamp column `t_<stage>` per stage,
    one row per user who completed the whole funnel.
    """
    if len(stages) < 1:
        raise ValueError("funnel needs at least one stage")
    cols: list[str] = []
    cur: DataFrame | None = None
    for stage in stages:
        t_col = f"t_{stage}"
        sliced = df.where(F.col(type_col) == stage)
        if cur is None:
            cur = (sliced.groupBy(user_col)
                   .agg(F.min(ts_col).alias(t_col)))
        else:
            prev_t = cols[-1]
            cur = (sliced.join(cur, on=user_col)
                   .where(F.col(ts_col) > F.col(prev_t))
                   .groupBy(user_col, *cols)
                   .agg(F.min(ts_col).alias(t_col)))
        cols.append(t_col)
    return cur.select(user_col, *cols)
