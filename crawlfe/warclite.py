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


def write_warclite(path: str, records) -> int:
    """Write records (url, warc_ts_us, lang, payload: bytes — any
    iterable of mapping-like rows) to one warclite file; returns the
    record count. Plain sequential writer — the format is append-only
    by construction, like WARC."""
    n = 0
    with open(path, "wb") as f:
        for r in records:
            n += 1
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
    return n


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
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        EqualTo,
        Filter,
        InputPartition,
        WriterCommitMessage,
    )

    class _FilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    _ARROW_BATCH = 4096  # records per RecordBatch crossing into the JVM

    def _arrow_batch(pa, cols):
        return pa.RecordBatch.from_arrays(
            [
                pa.array(cols[0], type=pa.string()),
                pa.array(cols[1], type=pa.int64()),
                pa.array(cols[2], type=pa.string()),
                pa.array(cols[3], type=pa.binary()),
            ],
            names=["url", "warc_ts_us", "lang", "payload"],
        )

    class WarcLiteReader(DataSourceReader):
        def __init__(self, options: dict):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("warclite: path option is required")
            self._lang_eq: str | None = None

        def pushFilters(self, filters: list["Filter"]):
            # Spark 4.1 DSv2-python filter pushdown: accept simple
            # lang-equality (the dominant crawl-subsetting predicate)
            # and evaluate it at record-decode time, so non-matching
            # payload bytes never cross into Arrow. Everything else is
            # returned for Spark to evaluate post-scan.
            for f in filters:
                if (
                    isinstance(f, EqualTo)
                    and f.attribute == ("lang",)
                    and isinstance(f.value, str)
                    and self._lang_eq is None
                ):
                    self._lang_eq = f.value
                else:
                    yield f

        def partitions(self) -> list[InputPartition]:
            # one partition per container file — WARC's natural split;
            # planned driver-side from a single listing, O(files)
            return [
                _FilePartition(p) for p in list_warclite_files(self._path)
            ]

        def read(self, partition: _FilePartition):
            # runs ON THE EXECUTOR; streams records, never materializes
            # the whole file. Yields pyarrow.RecordBatch chunks (the
            # Spark 4 DataSource Arrow path) so record fields cross the
            # Python->JVM boundary as columnar buffers instead of
            # per-row pickled tuples — ~an order of magnitude less
            # serialization overhead on payload-heavy scans.
            import pyarrow as pa

            recs = read_warclite_file(partition.path)
            if self._lang_eq is not None:
                want = self._lang_eq
                recs = (r for r in recs if r[2] == want)
            cols: tuple[list, list, list, list] = ([], [], [], [])
            n = 0
            for r in recs:
                for c, v in zip(cols, r):
                    c.append(v)
                n += 1
                if n >= _ARROW_BATCH:
                    yield _arrow_batch(pa, cols)
                    cols = ([], [], [], [])
                    n = 0
            if n:
                yield _arrow_batch(pa, cols)

    @dataclass
    class _WLCommit(WriterCommitMessage):
        staged: str | None
        n: int

    class WarcLiteWriter(DataSourceWriter):
        """Two-phase-commit distributed writer (same atomic-visibility
        discipline as crawlfe.io.IcebergLite): each task streams its
        partition into ``<dir>/_staging/part-<pid>.wlr.tmp`` and
        returns a commit message; only the DRIVER-side ``commit``
        renames staged files to ``part-*.wlr`` (the only names the
        reader lists) and writes ``_MANIFEST.json``, so a crashed or
        speculative task can never leave a half-visible file."""

        def __init__(self, options: dict, overwrite: bool):
            self._path = options.get("path")
            if not self._path:
                raise ValueError("warclite: path option is required")
            self._overwrite = overwrite

        def write(self, rows) -> "_WLCommit":
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            stage = os.path.join(self._path, "_staging")
            os.makedirs(stage, exist_ok=True)
            tmp = os.path.join(stage, f"part-{pid:05d}.wlr.tmp")
            n = write_warclite(
                tmp,
                (
                    {
                        "url": r.url,
                        "warc_ts_us": r.warc_ts_us,
                        "lang": r.lang,
                        "payload": bytes(r.payload),
                    }
                    for r in rows
                ),
            )
            if n == 0:
                os.remove(tmp)  # empty partition: stage nothing
                return _WLCommit(staged=None, n=0)
            return _WLCommit(staged=tmp, n=n)

        def commit(self, messages) -> None:
            import shutil

            if self._overwrite:
                for p in list_warclite_files(self._path):
                    os.remove(p)
            files = {}
            for m in messages:
                if m is None or m.staged is None:
                    continue
                final = os.path.join(
                    self._path,
                    os.path.basename(m.staged)[: -len(".tmp")],
                )
                os.replace(m.staged, final)  # atomic on one fs
                files[os.path.basename(final)] = m.n
            with open(
                os.path.join(self._path, "_MANIFEST.json"), "w"
            ) as fh:
                json.dump(
                    {"files": files, "n_records": sum(files.values())},
                    fh,
                    sort_keys=True,
                )
            shutil.rmtree(
                os.path.join(self._path, "_staging"), ignore_errors=True
            )

        def abort(self, messages) -> None:
            import shutil

            shutil.rmtree(
                os.path.join(self._path, "_staging"), ignore_errors=True
            )

    class WarcLiteDataSource(DataSource):
        """spark.read.format("warclite").load(dir) /
        df.write.format("warclite").save(dir) — Spark 4 Python data
        source with file-granular partitions and a two-phase-commit
        writer."""

        @classmethod
        def name(cls) -> str:
            return "warclite"

        def schema(self) -> str:
            return SCHEMA_DDL

        def reader(self, schema) -> WarcLiteReader:
            return WarcLiteReader(self.options)

        def writer(self, schema, overwrite: bool) -> WarcLiteWriter:
            cols = [f.name for f in schema.fields]
            want = ["url", "warc_ts_us", "lang", "payload"]
            if cols != want:
                raise ValueError(
                    f"warclite writer needs columns {want}, got {cols}"
                )
            return WarcLiteWriter(self.options, overwrite)

    HAVE_SPARK_DATASOURCE = True
except ImportError:  # pragma: no cover
    HAVE_SPARK_DATASOURCE = False


def register(spark) -> None:
    """Idempotently register the warclite format on a session.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (runtime
    SQL conf, default false in Spark 4.1): a reader that implements
    ``pushFilters`` fails scans outright when the flag is off, so the
    flag must travel with the registration — any session the driver
    builds gets it the moment it registers the source."""
    if not HAVE_SPARK_DATASOURCE:  # pragma: no cover
        raise RuntimeError("pyspark DataSource API unavailable")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(WarcLiteDataSource)
