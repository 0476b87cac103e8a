"""Row expansion: one row per person for multi-person array columns.

Parity target: /root/reference/openpolicedata/data.py:578-679 (`Table.expand`).

The reference stores multi-person demographics as dicts {person_idx: value}
and uses `df.explode`; our standardizer produces `ArrayType` columns
(SURVEY §1.3), so expand = pad arrays to a common length, `arrays_zip`,
`posexplode`. Mismatch modes (data.py:644-674):

- 'nan'        → pad shorter arrays with null up to the row max
- 'error'      → fail the action if person counts disagree (assert_true)
- 'splitsingle'→ arrays of length 1 are replicated to the row max first
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PERSON_INDEX = "PERSON_INDEX"


def expand(df: DataFrame, cols: Optional[list[str]] = None,
           mismatch: str = "nan", keep_index: bool = True) -> DataFrame:
    """Explode multi-person array columns into one row per person.

    Scalar (non-array) columns replicate; `posexplode` keeps the person
    index (the dict keys of the reference encoding). Entirely expression-
    based — the explode is a narrow map-side op, no shuffle.
    """
    if cols is None:
        cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType))]
    if not cols:
        return df
    # MapType {person_idx: value} cells (reference dict encoding,
    # data.py:578-679 converts dicts → value lists before explode):
    # key-ordered values become the array form, then one code path
    for c in cols:
        if isinstance(df.schema[c].dataType, T.MapType):
            df = df.withColumn(
                c,
                F.transform(F.array_sort(F.map_keys(F.col(c))),
                            lambda k: F.element_at(F.col(c), k)))
    for c in cols:
        if not isinstance(df.schema[c].dataType, T.ArrayType):
            raise ValueError(f"Column {c} is not an array or map column")

    sizes = [F.size(F.col(c)) for c in cols]
    n = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
    n = F.when(n < 1, F.lit(1)).otherwise(n)  # rows with all-empty arrays keep 1 row

    if mismatch == "error":
        # Fail the action on disagreeing person counts (data.py mismatch='error').
        agree = None
        for c in cols:
            ok = (F.size(F.col(c)) <= 1) | (F.size(F.col(c)) == n)
            agree = ok if agree is None else (agree & ok)
        df = df.filter(
            F.when(agree, F.lit(True)).otherwise(
                F.raise_error(F.lit("mismatched person counts in expand"))
            )
        )

    def padded(c: str):
        arr = F.col(c)
        if mismatch == "splitsingle":
            # replicate singletons to the row max (data.py:666-674)
            arr = F.when(
                F.size(arr) == 1,
                F.transform(F.sequence(F.lit(1), n), lambda _: F.element_at(F.col(c), 1)),
            ).otherwise(arr)
        # pad with nulls to n (data.py:644-664 'nan' mode). Guard the
        # sequence: F.sequence(1, 0) yields a DESCENDING sequence, not empty.
        pad = F.transform(
            F.sequence(F.lit(1), n - F.size(arr)),
            lambda _: F.lit(None).cast(df.schema[c].dataType.elementType),
        )
        return F.when(F.size(arr) >= n, arr).otherwise(F.concat(arr, pad))

    zipped = F.arrays_zip(*[padded(c).alias(c) for c in cols])
    other = [c for c in df.columns if c not in cols]
    out = df.select(*other, F.posexplode_outer(zipped).alias(PERSON_INDEX, "__z__"))
    for c in cols:
        out = out.withColumn(c, F.col("__z__")[c])
    out = out.drop("__z__")
    if not keep_index:
        out = out.drop(PERSON_INDEX)
    return out
