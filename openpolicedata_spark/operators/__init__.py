"""Relational conveniences (merge/expand — reference data.py) and
at-scale operators beyond the reference (dedup, similarity search,
multimodal plumbing, training-data pipeline, scale techniques) for
LLM-data pipelines."""

from openpolicedata_spark.operators.dedup import dedup_cascade, exact_dedup
from openpolicedata_spark.operators.events import funnel, gap_fill
from openpolicedata_spark.operators.expand import expand
from openpolicedata_spark.operators.geo import radius_pairs
from openpolicedata_spark.operators.merge import (
    find_id_column,
    merge_tables,
    scd2_intervals,
)
from openpolicedata_spark.operators.scale import (
    bucketed_interval_join,
    range_cluster_layout,
    zorder_layout,
    radius_join,
    salted_agg,
    salted_broadcast_join,
    write_bucketed,
)
from openpolicedata_spark.operators.textpipe import (
    asof_join,
    cdc_chunks,
    chunk_documents,
    contamination_pairs,
    dedup_lines,
    pack_documents,
    repetition_stats,
    weighted_mix,
)

__all__ = [
    "merge_tables", "find_id_column", "scd2_intervals", "expand",
    "exact_dedup", "dedup_cascade",
    "asof_join", "pack_documents", "chunk_documents", "cdc_chunks",
    "contamination_pairs", "dedup_lines", "repetition_stats",
    "weighted_mix",
    "bucketed_interval_join", "radius_join", "radius_pairs",
    "salted_agg", "salted_broadcast_join",
    "funnel", "gap_fill", "range_cluster_layout", "zorder_layout",
    "write_bucketed",
]
