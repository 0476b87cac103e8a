"""Dataset catalog: the driver-side metadata table describing every available
dataset (one row per State/Source/Agency/TableType/Year-or-MULTI).

Parity target: /root/reference/openpolicedata/datasets.py — column dtypes
(datasets.py:15-29), `_build` normalization (datasets.py:32-91), `query`
filtering with fuzzy source suggestions (datasets.py:107-157), summaries
(datasets.py:160-315).

Design: the catalog is tiny (~550 rows in the reference) so it lives on the
driver as a pandas DataFrame with a fixed schema; `to_spark()` exposes it as a
(broadcastable) Spark DataFrame for catalog analytics. Partition-pruning
analog: catalog Year/coverage matching decides which datasets are scanned at
all (reference data.py:1321-1356) before any distributed work starts.
"""

from __future__ import annotations

import datetime as _dt
import json
import re
from typing import Any, Iterable, Optional

import pandas as pd

from openpolicedata_spark import defs

# Fixed catalog schema (reference datasets.py:15-29 plus coverage/dataset_id).
CATALOG_COLUMNS = [
    "State",
    "SourceName",
    "Agency",
    "AgencyFull",
    "TableType",
    "Year",            # int, MULTI ("MULTIPLE"), or NA ("NONE")
    "Description",
    "DataType",        # defs.DataType value
    "URL",
    "date_field",
    "agency_field",
    "dataset_id",
    "query",           # static constant predicates {col: value}
    "coverage_start",
    "coverage_end",
    "readme",
    "min_version",
]

_ARCGIS_LAYER_RE = re.compile(r"(MapServer|FeatureServer)/\d+")


def _normalize_year(y: Any) -> Any:
    """Year column holds ints, MULTI, or NA (reference datasets.py:56-58)."""
    if isinstance(y, str):
        y = y.strip()
        if y.isdigit():
            return int(y)
        if y == "MULTI":
            return defs.MULTI
    return y


def _normalize_query(q: Any) -> Optional[dict]:
    if q is None or (isinstance(q, float) and pd.isna(q)):
        return None
    if isinstance(q, dict):
        return q
    if isinstance(q, str) and q.strip():
        return json.loads(q)
    return None


class Catalog:
    """In-memory dataset catalog with reference-compatible query semantics."""

    def __init__(self, records: pd.DataFrame | Iterable[dict]):
        if not isinstance(records, pd.DataFrame):
            records = pd.DataFrame(list(records))
        df = records.copy()
        for col in CATALOG_COLUMNS:
            if col not in df.columns:
                df[col] = None
        df = df[CATALOG_COLUMNS]
        # Normalization mirroring reference _build (datasets.py:32-91):
        df["Year"] = df["Year"].map(_normalize_year)
        for col in ("State", "SourceName", "Agency", "TableType", "DataType", "URL"):
            df[col] = df[col].map(lambda x: x.strip() if isinstance(x, str) else x)
        df["query"] = df["query"].map(_normalize_query)
        # ArcGIS URLs truncated at the layer number (datasets.py:68-76).
        df["URL"] = [
            u[: _ARCGIS_LAYER_RE.search(u).span()[1]]
            if isinstance(u, str)
            and d == defs.DataType.ARCGIS.value
            and _ARCGIS_LAYER_RE.search(u)
            else u
            for u, d in zip(df["URL"], df["DataType"])
        ]
        # Dedup on the identity key (datasets.py:78-79).
        df = df.drop_duplicates(
            subset=["State", "SourceName", "Agency", "TableType", "Year",
                    "coverage_start", "coverage_end"],
            ignore_index=True,
        )
        for col in ("coverage_start", "coverage_end"):
            df[col] = pd.to_datetime(df[col], errors="coerce")
        self.df = df

    @classmethod
    def from_csv(cls, path_or_buf) -> "Catalog":
        """Build the catalog from a CSV file (reference datasets.reload,
        datasets.py:94-104): same normalization as the constructor; the
        reference's published catalog CSV round-trips through here."""
        return cls(pd.read_csv(path_or_buf))

    # ------------------------------------------------------------------ query
    def query(
        self,
        source_name: Optional[str] = None,
        state: Optional[str] = None,
        agency: Optional[str] = None,
        table_type: Optional[str] = None,
    ) -> pd.DataFrame:
        """Filter the catalog (reference datasets.py:107-157). Exact,
        case-sensitive matches; on a source-name miss, raise with fuzzy
        suggestions (reference uses rapidfuzz partial_ratio>90,
        datasets.py:152-155; we fall back to difflib when unavailable)."""
        df = self.df
        mask = pd.Series(True, index=df.index)
        if state is not None:
            mask &= df["State"] == state
        if source_name is not None:
            mask &= df["SourceName"] == source_name
        if agency is not None:
            mask &= df["Agency"] == agency
        if table_type is not None:
            tt = table_type.value if isinstance(table_type, defs.TableType) else table_type
            mask &= df["TableType"] == tt
        out = df[mask].reset_index(drop=True)
        if len(out) == 0 and source_name is not None:
            sugg = self._suggest_sources(source_name)
            if sugg:
                raise ValueError(
                    f"No source found for source_name='{source_name}'. "
                    f"Did you mean one of {sugg}?"
                )
        return out

    def _suggest_sources(self, name: str) -> list[str]:
        candidates = sorted(set(self.df["SourceName"].dropna()))
        try:  # rapidfuzz if present (reference dependency), else difflib
            from rapidfuzz import fuzz

            return [c for c in candidates if fuzz.partial_ratio(name.lower(), c.lower()) > 90]
        except ImportError:
            import difflib

            return difflib.get_close_matches(name, candidates, n=3, cutoff=0.6)

    # -------------------------------------------------------------- summaries
    def num_unique(self) -> int:
        """Count of unique datasets (reference datasets.py:160-166)."""
        return len(
            self.df.drop_duplicates(
                subset=["State", "SourceName", "Agency", "TableType", "Year"]
            )
        )

    def num_sources(self) -> int:
        """Count of unique sources (reference datasets.py:168-182)."""
        return len(self.df.drop_duplicates(subset=["State", "SourceName", "Agency"]))

    def get_table_types(self, contains: Optional[str] = None) -> list[str]:
        """Sorted unique table types, optionally filtered by substring
        (reference datasets.get_table_types, datasets.py:317-330)."""
        tts = sorted(set(self.df["TableType"].dropna()))
        if contains is not None:
            tts = [t for t in tts if contains in t]
        return tts

    def summary_by_table_type(self, by_year: bool = False) -> pd.DataFrame:
        """Datasets per table type, optionally pivoted by year
        (reference datasets.py:248-315)."""
        if not by_year:
            return (
                self.df.groupby("TableType")
                .size()
                .rename("count")
                .reset_index()
                .sort_values("TableType", ignore_index=True)
            )
        return (
            self.df.assign(Year=self.df["Year"].astype(str))
            .pivot_table(index="TableType", columns="Year",
                         aggfunc="size", fill_value=0)
            .reset_index()
        )

    def summary_by_state(self, by_year: bool = False) -> pd.DataFrame:
        """Datasets per state, optionally pivoted by year
        (reference datasets.py:184-246)."""
        if not by_year:
            return (
                self.df.groupby("State").size().rename("count").reset_index()
            )
        return (
            self.df.assign(Year=self.df["Year"].astype(str))
            .pivot_table(index="State", columns="Year", aggfunc="size", fill_value=0)
            .reset_index()
        )

    # ------------------------------------------------------------------ spark
    def to_spark(self, spark):
        """Materialize the catalog as a small Spark DataFrame (broadcastable
        for catalog-side joins). dataset_id / query serialized to JSON."""
        df = self.df.copy()
        df["Year"] = df["Year"].astype(str)
        df["dataset_id"] = df["dataset_id"].map(
            lambda x: json.dumps(x) if isinstance(x, (dict, list)) else x
        )
        df["query"] = df["query"].map(lambda x: json.dumps(x) if x else None)
        return spark.createDataFrame(df)


def local_testdata_catalog(sf_dir: str = "/root/testdata/sf0.001") -> Catalog:
    """Catalog over the driver-generated synthetic tables (TESTDATA.md) so the
    full Source→load→standardize path can run offline. Each parquet table is
    registered as a file-backed dataset; date-bearing tables get a
    date_field so the date-pushdown path (reference data_loader.py:120-191)
    is exercised."""
    date_fields = {"orders": "o_orderdate", "lineitem": "l_shipdate", "events": "ts"}
    coverage = {
        "orders": (_dt.date(1995, 1, 1), _dt.date(2001, 12, 31)),
        "lineitem": (_dt.date(1995, 1, 1), _dt.date(2001, 12, 31)),
        "events": (_dt.date(2024, 1, 1), _dt.date(2024, 1, 31)),
    }
    agency_fields = {"customer": "c_mktsegment"}  # exercises the agency path
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    records = []
    for t in tables:
        records.append(
            {
                "State": "Synthetic",
                "SourceName": "TestData",
                "Agency": defs.MULTI,
                "AgencyFull": "Synthetic Test Data",
                "TableType": t.upper(),
                "Year": defs.MULTI if t in date_fields else defs.NA,
                "Description": f"synthetic {t} table",
                "DataType": defs.DataType.PARQUET.value,
                "URL": f"{sf_dir}/{t}.parquet",
                "date_field": date_fields.get(t),
                "agency_field": agency_fields.get(t),
                "coverage_start": coverage.get(t, (None, None))[0],
                "coverage_end": coverage.get(t, (None, None))[1],
            }
        )
    return Catalog(records)
