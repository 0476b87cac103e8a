"""Relational conveniences (merge/expand — reference data.py) and
at-scale operators beyond the reference (dedup, similarity search,
multimodal plumbing) for LLM-data pipelines."""

from openpolicedata_spark.operators.merge import merge_tables, find_id_column
from openpolicedata_spark.operators.expand import expand

__all__ = ["merge_tables", "find_id_column", "expand"]
