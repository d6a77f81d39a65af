"""warclite: a WARC-style record container + a Spark 4 Python DataSource.

The engine's ingest boundary is Common-Crawl WARC files; this module
implements the same SHAPE on a minimal deterministic container so the
reader path is real and testable in-sandbox (no warcio dependency):

    file  := record*
    record := MAGIC(4s=b"WLR1") | header_len(u32 BE) | payload_len(u32 BE)
              | header(JSON utf-8: url, warc_ts_us, lang) | payload(bytes)

Reading is a registered Spark 4 Python DataSource
(``spark.dataSource.register(WarcLiteDataSource)`` then
``spark.read.format("warclite").load(dir)``) with ONE InputPartition
PER FILE — the natural WARC split unit; a 100 TB crawl is millions of
.warc.gz objects and file-granular partitions are exactly how Spark
schedules them. Records are decoded with stdlib struct only; the
payload crosses into Arrow as binary.

Cited shape: WARC ingest loops in public crawl tooling; the reference's
batch feature extractor consumed per-file record streams the same way
([R] reconstruction — reference mount is empty, SURVEY.md §0).
"""

from __future__ import annotations

import json
import os
import struct
from collections.abc import Iterator

MAGIC = b"WLR1"
_HDR = struct.Struct(">4sII")

SCHEMA_DDL = "url string, warc_ts_us bigint, lang string, payload binary"


def write_warclite(path: str, records: list[dict]) -> None:
    """Write records (url, warc_ts_us, lang, payload: bytes) to one
    warclite file. Plain sequential writer — the format is append-only
    by construction, like WARC."""
    with open(path, "wb") as f:
        for r in records:
            header = json.dumps(
                {
                    "url": r["url"],
                    "warc_ts_us": int(r["warc_ts_us"]),
                    "lang": r.get("lang", ""),
                },
                sort_keys=True,
            ).encode("utf-8")
            payload = r["payload"]
            f.write(_HDR.pack(MAGIC, len(header), len(payload)))
            f.write(header)
            f.write(payload)


def read_warclite_file(path: str) -> Iterator[tuple]:
    """Yield (url, warc_ts_us, lang, payload) from one warclite file.
    Pure stdlib; used by the DataSource partitions AND directly
    testable without Spark."""
    with open(path, "rb") as f:
        while True:
            head = f.read(_HDR.size)
            if not head:
                return
            if len(head) != _HDR.size:
                raise ValueError(f"truncated record header in {path}")
            magic, hlen, plen = _HDR.unpack(head)
            if magic != MAGIC:
                raise ValueError(f"bad magic at offset in {path}")
            raw_header = f.read(hlen)
            payload = f.read(plen)
            if len(raw_header) != hlen or len(payload) != plen:
                raise ValueError(f"truncated record in {path}")
            header = json.loads(raw_header.decode("utf-8"))
            yield (
                header["url"],
                int(header["warc_ts_us"]),
                header.get("lang", ""),
                payload,
            )


def list_warclite_files(path: str) -> list[str]:
    """Deterministic (sorted) file list for a dir-or-file path."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, n)
            for n in os.listdir(path)
            if n.endswith(".wlr")
        )
    return [path]


try:  # pyspark is always present in this repo's environments; the
    # guard keeps the pure-python writer/reader importable without it
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcLiteReader(DataSourceReader):
        def __init__(self, options: dict):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("warclite: path option is required")

        def partitions(self) -> list[InputPartition]:
            # one partition per container file — WARC's natural split;
            # planned driver-side from a single listing, O(files)
            return [
                _FilePartition(p) for p in list_warclite_files(self._path)
            ]

        def read(self, partition: _FilePartition) -> Iterator[tuple]:
            # runs ON THE EXECUTOR; streams records, never materializes
            # the whole file
            yield from read_warclite_file(partition.path)

    class WarcLiteDataSource(DataSource):
        """spark.read.format("warclite").load(dir) — Spark 4 Python
        data source with file-granular partitions."""

        @classmethod
        def name(cls) -> str:
            return "warclite"

        def schema(self) -> str:
            return SCHEMA_DDL

        def reader(self, schema) -> WarcLiteReader:
            return WarcLiteReader(self.options)

    HAVE_SPARK_DATASOURCE = True
except ImportError:  # pragma: no cover
    HAVE_SPARK_DATASOURCE = False


def register(spark) -> None:
    """Idempotently register the warclite format on a session."""
    if not HAVE_SPARK_DATASOURCE:  # pragma: no cover
        raise RuntimeError("pyspark DataSource API unavailable")
    spark.dataSource.register(WarcLiteDataSource)
