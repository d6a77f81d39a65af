"""Streaming Python data source: deterministic crawl-snapshot replay.

``spark.readStream.format("synthpages").load()`` emits the synthetic
Common-Crawl-style pages table (crawlfe/synth.py) ONE SNAPSHOT WAVE PER
MICROBATCH: batch b carries snapshot index k=b of every url that has at
least k+1 snapshots. This is the streaming twin of the batch source —
the replay harness for the incremental featurize path (a production
crawl arrives exactly like this: each fetch wave appends one snapshot
per re-crawled url).

Spark-4 surface: ``pyspark.sql.datasource.DataSourceStreamReader`` —
the PARTITION-PLANNED stream reader (not SimpleDataSourceStreamReader,
whose read() runs wholly on the driver and is documented for
lightweight use only). The driver plans (url-range x snapshot-range)
InputPartitions per microbatch; executors synthesize their slice with
the same pure generator as the batch oracle, so values are
byte-identical to ``gen_pages_pdf`` rows and every batch replays
deterministically on failure recovery (offsets are pure snapshot
indices; no external state).

Role in the reference pipeline shape: the arrival of new crawl data
that acoss's batch extractor loop re-runs over (ref:
acoss/extractors.py::batch_feature_extractor input contract [R]),
re-expressed as a Structured Streaming source.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator, Sequence, Tuple

from .synth import SynthConfig, gen_pages_pdf_slice

STREAM_SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, text string, "
    "lang string, snapshot_k int"
)

_EPOCH = datetime(1970, 1, 1)


def _cfg_from_options(options: dict) -> SynthConfig:
    # NOTE: max_snapshots is a GENERATOR parameter (it changes every
    # url's snapshot count, hence the corpus itself); the number of
    # waves available to the stream is the separate `horizon` option,
    # so a stream over the default corpus stays byte-identical to the
    # batch table whatever horizon it replays up to.
    return SynthConfig(
        seed=int(options.get("seed", 42)),
        n_urls=int(options.get("n_urls", 200)),
        max_snapshots=int(options.get("max_snapshots", 12)),
    )


try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _SlicePartition(InputPartition):
        def __init__(self, url_lo: int, url_hi: int, k_lo: int, k_hi: int):
            self.url_lo = url_lo
            self.url_hi = url_hi
            self.k_lo = k_lo
            self.k_hi = k_hi

    class PagesStreamReader(DataSourceStreamReader):
        def __init__(self, options: dict):
            self._cfg = _cfg_from_options(options)
            self._horizon = int(
                options.get("horizon", self._cfg.max_snapshots)
            )
            self._n_parts = int(options.get("n_parts", 4))
            # monotone floor learned from the engine's own offsets: the
            # horizon may GROW across restarts (new fetch waves arrived)
            # but latestOffset must never fall below a committed offset
            # — a regressing offset would re-plan already-sunk waves
            self._floor = 0

        def initialOffset(self) -> dict:
            return {"k": 0}

        def latestOffset(self) -> dict:
            # everything up to the configured horizon is available NOW;
            # a constant (per-run) offset is monotone and race-free
            # under processAllAvailable, and a restart with a larger
            # horizon emits exactly the new waves (tests). Self-
            # advancing per-trigger offsets (the docs' toy pattern)
            # both race ProcessAllAvailable and regress on restart.
            return {"k": max(self._horizon, self._floor)}

        def partitions(
            self, start: dict, end: dict
        ) -> Sequence[InputPartition]:
            k0, k1 = int(start["k"]), int(end["k"])
            self._floor = max(self._floor, k0, k1)
            if k1 <= k0:
                return []
            n = self._cfg.n_urls
            parts = max(1, min(self._n_parts, n))
            step = (n + parts - 1) // parts
            return [
                _SlicePartition(lo, min(lo + step, n), k0, k1)
                for lo in range(0, n, step)
            ]

        def read(
            self, partition: _SlicePartition
        ) -> Iterator[Tuple]:
            # runs ON THE EXECUTOR: synthesize only this partition's
            # (url-range x snapshot-range) slice
            pdf = gen_pages_pdf_slice(
                self._cfg,
                partition.url_lo,
                partition.url_hi,
                partition.k_lo,
                partition.k_hi,
            )
            for r in pdf.itertuples(index=False):
                ts_us = r.warc_ts.value // 1000
                yield (
                    r.url,
                    _EPOCH + timedelta(microseconds=ts_us),
                    r.html,
                    r.text,
                    r.lang,
                    int(r.snapshot_k),
                )

        def commit(self, end: dict) -> None:
            # offsets are self-describing; nothing external to clean up
            pass

    class PagesBatchReader(DataSourceReader):
        """Batch twin of the stream reader: the SAME format works in
        `spark.read` and `spark.readStream` (the Spark data-source
        symmetry contract) — url-range InputPartitions, full snapshot
        history up to `horizon` per url."""

        def __init__(self, options: dict):
            self._cfg = _cfg_from_options(options)
            self._horizon = int(
                options.get("horizon", self._cfg.max_snapshots)
            )
            self._n_parts = int(options.get("n_parts", 4))

        def partitions(self) -> Sequence[InputPartition]:
            n = self._cfg.n_urls
            parts = max(1, min(self._n_parts, n))
            step = (n + parts - 1) // parts
            return [
                _SlicePartition(lo, min(lo + step, n), 0, self._horizon)
                for lo in range(0, n, step)
            ]

        def read(self, partition: _SlicePartition) -> Iterator[Tuple]:
            return PagesStreamReader.read(self, partition)

    class SynthPagesStreamSource(DataSource):
        """format("synthpages") — batch AND stream: options: seed,
        n_urls, max_snapshots (generator param), horizon (waves
        available; grow it across stream restarts to replay new fetch
        waves), n_parts."""

        @classmethod
        def name(cls) -> str:
            return "synthpages"

        def schema(self) -> str:
            return STREAM_SCHEMA

        def reader(self, schema) -> PagesBatchReader:
            return PagesBatchReader(self.options)

        def streamReader(self, schema) -> PagesStreamReader:
            return PagesStreamReader(self.options)

    HAVE_SPARK_DATASOURCE = True
except ImportError:  # pragma: no cover
    HAVE_SPARK_DATASOURCE = False


def register(spark) -> None:
    """Idempotently register the synthpages streaming format."""
    if not HAVE_SPARK_DATASOURCE:  # pragma: no cover
        raise RuntimeError("pyspark DataSource API unavailable")
    spark.dataSource.register(SynthPagesStreamSource)
