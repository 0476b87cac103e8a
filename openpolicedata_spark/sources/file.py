"""File-backed loaders: Parquet (Spark-native) and CSV.

Parity target: /root/reference/openpolicedata/data_loaders/csv_class.py
(Csv loader, :130-420) and data.py:1438-1626 (parquet/feather/csv re-load).

Spark mapping (SURVEY §2.1): `spark.read.parquet/csv` replaces the streaming
pandas reader; date/agency filters become Catalyst predicates pushed into the
scan (PushedFilters), so the reference's "local filter after read"
(csv_class.py:377-379) costs nothing extra. The reference's quote-aware
streaming row counter (csv_class.py:90-127) is unnecessary — `df.count()`
is a scan-only job. Zip/remote-URL prefetch is a driver-side download step.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from openpolicedata_spark.sources.base import (
    DataLoader,
    DateInput,
    apply_limit_offset,
    filter_dataframe,
)


def read_parquet_repaired(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read tolerant of TIMESTAMP(NANOS) columns, which Spark's
    vectorized reader rejects outright. Driver-side footer inspection
    (pyarrow) finds nanosecond timestamp columns; they are read as longs
    (`spark.sql.legacy.parquet.nanosAsLong`) and repaired to timestamps with
    integer division (no double round-trip — 1.7e18 ns doesn't fit a double's
    53-bit mantissa)."""
    nanos_cols: list[str] = []
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        schema = pq.read_schema(path)
        nanos_cols = [
            f.name for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        pass
    if not nanos_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    from pyspark.sql import functions as F

    for c in nanos_cols:
        df = df.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
        )
    return df


class _FileLoader(DataLoader):
    def __init__(
        self,
        spark: SparkSession,
        url: str,
        date_field: Optional[str] = None,
        agency_field: Optional[str] = None,
        query: Optional[dict] = None,
    ):
        super().__init__(spark)
        self.url = url
        self.date_field = date_field
        self.agency_field = agency_field
        self.query = query or {}

    def isfile(self) -> bool:
        return True

    def _read(self) -> DataFrame:
        raise NotImplementedError

    def load(
        self,
        date: DateInput = None,
        nrows: Optional[int] = None,
        offset: int = 0,
        *,
        agency: Optional[str] = None,
        select: Optional[list[str]] = None,
        sortby: Optional[str] = None,
    ) -> DataFrame:
        df = self._read()
        # Static catalog-declared predicates (reference csv_class.py:377-379).
        for k, v in self.query.items():
            df = df.filter(df[k] == v)
        df = filter_dataframe(
            df,
            date_field=self.date_field,
            date_filter=date,
            agency_field=self.agency_field,
            agency=agency,
        )
        if select:
            df = df.select(*select)
        if sortby == "date" and self.date_field:
            df = df.orderBy(self.date_field)
        return apply_limit_offset(df, nrows, offset)


class ParquetLoader(_FileLoader):
    """Native parquet scan — full Catalyst pushdown (predicates, pruning,
    metadata-only counts). Supersedes the reference's feather/parquet
    re-load path (data.py:1540-1626)."""

    def _read(self) -> DataFrame:
        return read_parquet_repaired(self.spark, self.url)

    def get_count(self, date: DateInput = None, *, agency: Optional[str] = None,
                  force: bool = False) -> int:
        # Unfiltered counts are parquet-metadata-only in Spark — the analog
        # of the reference's server-side count(*) pushdown (SURVEY §2.4).
        return super().get_count(date, agency=agency, force=force)


class JsonLoader(_FileLoader):
    """JSON-lines loader (Spark-native extension: the reference has no JSON
    source, but portals increasingly export NDJSON). Catalyst handles
    filter pushdown/pruning as with any file scan."""

    def _read(self) -> DataFrame:
        return self.spark.read.json(self.url)


class CsvLoader(_FileLoader):
    """CSV scan (reference csv_class.py:130-420). Local/`file://` paths read
    distributed; remote URLs are prefetched to a local spool path on the
    driver then read distributed (the reference streams bytes through pandas
    on one thread)."""

    def __init__(self, spark, url, date_field=None, agency_field=None, query=None,
                 header: bool = True, member: Optional[str] = None):
        super().__init__(spark, url, date_field, agency_field, query)
        self.header = header
        # zip member selection (dataset_id `file` entries — reference
        # csv_class.py:64-70 reads just that member over HTTP ranges)
        self.member = member

    def _prefetch_member(self, url: str) -> Optional[str]:
        """Range-request path for one member of a remote zip (reference
        csv_class.py:64-70 via httpio): fetch only the central directory
        + that member's span instead of the whole archive. Returns the
        spooled path, or None when the server can't serve ranges (caller
        falls back to the full-download path)."""
        import hashlib

        from openpolicedata_spark.sources.httpio import (
            HttpIOError,
            fetch_zip_member,
        )

        spool = os.path.join("/tmp", "opdspark_spool")
        os.makedirs(spool, exist_ok=True)
        key = hashlib.sha1(f"{url}|{self.member}".encode()).hexdigest()
        dest = os.path.join(spool, key + ".csv")
        if os.path.exists(dest):
            return dest
        try:
            # 256 KiB blocks: zipfile's access pattern is the EOCD tail
            # scan plus one member span — big blocks mostly fetch bytes
            # the extraction never touches
            data = fetch_zip_member(url, self.member,
                                    block_size=256 * 1024)
        except HttpIOError:
            return None          # no range support: full download instead
        tmp = f"{dest}.part.{os.getpid()}.{id(self)}"
        try:
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, dest)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)
            raise
        return dest

    def _prefetch(self) -> str:
        url = self.url
        if url.startswith(("http://", "https://")):
            if self.member and url.lower().endswith(".zip"):
                got = self._prefetch_member(url)
                if got is not None:
                    return got
            import hashlib
            import urllib.request

            spool = os.path.join("/tmp", "opdspark_spool")
            os.makedirs(spool, exist_ok=True)
            ext = ".zip" if url.lower().endswith(".zip") else ".csv"
            dest = os.path.join(spool, hashlib.sha1(url.encode()).hexdigest() + ext)
            if not os.path.exists(dest):
                # Browser-ish UA fallback mirrors reference csv_class.py.
                # Download to a temp path and rename on success — a
                # mid-download failure must never leave a partial file the
                # cache check would treat as complete (same discipline as
                # _unzip below).
                req = urllib.request.Request(url, headers={"User-Agent": "Mozilla/5.0"})
                # UNIQUE temp name per fetch: two concurrent loads of the
                # same URL must not interleave writes into one .part file
                # and promote corrupt bytes into the cache (os.replace
                # below stays atomic; last complete download wins)
                tmp = f"{dest}.part.{os.getpid()}.{id(self)}"

                def _fetch(ctx=None):
                    with urllib.request.urlopen(req, context=ctx) as r, \
                            open(tmp, "wb") as f:
                        f.write(r.read())

                try:
                    try:
                        _fetch()
                    except Exception as e:  # legacy-SSL retry below
                        if ("SSL" not in type(e).__name__
                                and "ssl" not in str(e).lower()):
                            raise
                        # Legacy-renegotiation fallback (reference
                        # csv_class.py: old municipal portals run TLS
                        # stacks OpenSSL 3 rejects by default — retry once
                        # with OP_LEGACY_SERVER_CONNECT + relaxed seclevel)
                        import ssl

                        ctx = ssl.create_default_context()
                        ctx.options |= getattr(ssl, "OP_LEGACY_SERVER_CONNECT", 0x4)
                        try:
                            ctx.set_ciphers("DEFAULT@SECLEVEL=1")
                        except ssl.SSLError:
                            pass
                        _fetch(ctx)
                    os.replace(tmp, dest)
                except BaseException:
                    if os.path.exists(tmp):
                        os.remove(tmp)
                    raise
            url = dest
        if url.lower().endswith(".zip"):
            url = self._unzip(url)
            if self.member:
                # full-download fallback still selects just the member
                # (basename-tolerant, matching fetch_zip_member)
                base = os.path.basename(self.member).lower()
                hits = [f for f in sorted(os.listdir(url))
                        if f.lower() == base
                        or f.lower().endswith("__" + base)]
                if len(hits) != 1:
                    raise ValueError(
                        f"zip member {self.member!r} not found in "
                        f"{self.url} (extracted: {sorted(os.listdir(url))})")
                url = os.path.join(url, hits[0])
        return url

    @staticmethod
    def _unzip(path: str) -> str:
        """Zipped CSV support (reference csv_class.py:64-87): extract the
        single inner CSV to the spool dir; multi-member archives extract
        every CSV into one directory (Spark reads the directory)."""
        import hashlib
        import zipfile

        spool = os.path.join("/tmp", "opdspark_spool",
                             hashlib.sha1(path.encode()).hexdigest())
        if not os.path.exists(spool):
            # Extract into a temp dir and atomically rename into place, so a
            # mid-extraction failure never leaves a partial dir that later
            # calls would treat as a complete cached extraction.
            import shutil
            import tempfile

            os.makedirs(os.path.dirname(spool), exist_ok=True)
            tmp = tempfile.mkdtemp(dir=os.path.dirname(spool) or "/tmp")
            try:
                with zipfile.ZipFile(path) as z:
                    members = [m for m in z.namelist()
                               if m.lower().endswith(".csv") and not m.endswith("/")]
                    if not members:
                        raise ValueError(f"no CSV member inside {path}")
                    seen: set[str] = set()
                    for m in members:
                        base = os.path.basename(m)
                        if base in seen:
                            # disambiguate equal basenames from different
                            # subdirs instead of silently overwriting
                            base = m.replace("/", "__")
                        seen.add(base)
                        with z.open(m) as src, \
                                open(os.path.join(tmp, base), "wb") as out:
                            out.write(src.read())
            except BaseException:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
            try:
                os.rename(tmp, spool)
            except OSError:
                # lost the rename race to a concurrent extractor: theirs wins
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.isdir(spool):
                    raise
        return spool

    @staticmethod
    def _detect_charset(path: str, sample_bytes: int = 1 << 20) -> str:
        """Driver-side probe for non-UTF-8 exports (reference csv_class.py
        opens with errors='surrogateescape' so undecodable bytes survive).
        Spark needs a declared charset instead: if a strict UTF-8 decode of
        the head fails, read as ISO-8859-1 — a total byte→char mapping, so
        like surrogateescape it loses nothing and never throws."""
        import glob

        if os.path.isdir(path):
            members = sorted(glob.glob(os.path.join(path, "*.csv")))
            if not members:
                return "UTF-8"
            path = members[0]   # zip members share the publisher's encoding
        try:
            import codecs

            with open(path, "rb") as f:
                head = f.read(sample_bytes)
            # incremental decoder (final=False) buffers a trailing
            # incomplete multibyte sequence instead of raising, so a valid
            # UTF-8 char straddling the sample boundary can't misclassify
            # the whole file as latin-1
            codecs.getincrementaldecoder("utf-8")().decode(head, False)
            return "UTF-8"
        except UnicodeDecodeError:
            return "ISO-8859-1"
        except OSError:
            return "UTF-8"

    def _read(self) -> DataFrame:
        path = self._prefetch()
        return self.spark.read.csv(path, header=self.header,
                                   inferSchema=True,
                                   encoding=self._detect_charset(path))
