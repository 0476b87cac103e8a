"""Shared builders for the streaming parity suites (scd2_sink /
stateful_gap_fill): ordered micro-batch file splits + the file-source
stream that replays them one file per trigger. Driver-side only —
never passed into UDFs (the conftest pickling gotcha doesn't apply)."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def write_ordered_splits(frame, src, n_files,
                         order_cols=("ts", "event_id")):
    """Split a change/event log into n in-order files by row ranges
    over `order_cols` — the per-key-ordered delivery a real CDC/event
    feed guarantees."""
    w = Window.orderBy(*order_cols)
    ranked = frame.withColumn("__rn__", F.row_number().over(w))
    n = frame.count()
    per = (n + n_files - 1) // n_files
    for i in range(n_files):
        (ranked.where((F.col("__rn__") > i * per)
                      & (F.col("__rn__") <= (i + 1) * per))
         .drop("__rn__").coalesce(1).write.parquet(str(src / f"b{i}")))


def file_stream(spark, schema_df, src):
    """One micro-batch per written file, in write order."""
    return (spark.readStream.schema(schema_df.schema)
            .option("maxFilesPerTrigger", 1).parquet(f"{src}/*/"))
