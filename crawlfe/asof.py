"""Point-in-time (as-of) join — the engine's core temporal operator.

The reference's benchmark stage compares every entity against every other
entity in an O(N²) pairwise loop (ref: acoss/benchmark/
algorithm_template.py::CoverAlgorithm.all_pairwise + per-algorithm
``similarity`` kernels [R]). The engine re-semanticizes that stage as a
point-in-time join (SURVEY.md §2.A A13/A14): each probe (url, join_ts)
is matched to the LATEST build row of the same url with
warc_ts <= join_ts — a merge-scan, not a cross product.

Two physical strategies, identical semantics (both tested for parity):

  * ``merge_scan`` (default — the BASELINE.json:6-mandated shape):
    hash-bucket both sides on the key, cogroup, and run a vectorized
    two-pointer backward scan (pd.merge_asof) per bucket. Buckets (not
    raw urls) are the cogroup key so groups stay large and few — at
    10^12 rows, per-url groups would mean billions of tiny Arrow
    exchanges. Within a bucket the kernel sorts by ts and merges with
    by=key: the repartition+sort+merge of SURVEY.md §4.3 with the sort
    pushed into the kernel where it is a single numpy argsort.
  * ``merge_scan_slim``: the same mandated merge-scan kernel, but run
    on (key, ts) ONLY; matched build payloads are re-attached by a
    JVM-side equi join on (key, matched ts). The 100 TB path for FAT
    payloads (feature vectors): the Arrow->pandas exchange never
    carries arrays (per-row Python object conversion is the cost that
    kills scaling), and under salting only the slim build side is
    replicated K times. Requires build unique per (key, ts) — true by
    construction for crawl snapshots.
  * ``range_scan``: the mandate-literal physical shape
    (BASELINE.json:6 "merge-scan over repartitionByRange(url) +
    sortWithinPartitions(warc_ts)"): tag sides, union slim columns,
    ``repartitionByRange(key)`` + ``sortWithinPartitions(key, ts,
    side)``, then ONE forward streaming pass (mapInPandas) that
    carries the latest build row per key across Arrow batches —
    payloads re-attached by the same JVM equi join as
    ``merge_scan_slim``. Range partitioning keeps a key's whole
    history in one partition, so the carry state is a single
    last-row dict.
  * ``union_window``: tag sides, union, and forward-fill build columns
    with last(..., ignorenulls) over (key ORDER BY ts, side). 100%
    JVM/whole-stage-codegen (zero Python), one shuffle — the scale
    path when build payloads are narrow.

Zero temporal leakage (BASELINE.json:6): merge_asof(direction="backward",
allow_exact_matches=True) can never read a build row with ts > join_ts;
the union_window frame ends at the current row with probes ordered after
build rows at equal ts. Property-tested in tests/test_leakage.py.

Skew (BASELINE.json:6 "salted range partitioning"): ``salt_k`` > 1
replicates every build row to all K salt buckets and routes each probe
row to one hash-chosen bucket, so a hot url's probes spread over K tasks
while every task still sees the url's full build history — leakage-safe
by construction. AQE skew-join splitting is enabled globally (conf.py).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

DEFAULT_BUCKETS = 256


def _out_schema(
    probe: DataFrame, build: DataFrame, ts_build: str, build_cols: list[str]
) -> StructType:
    fields = list(probe.schema.fields)
    bmap = {f.name: f for f in build.schema.fields}
    fields.append(StructField(ts_build, bmap[ts_build].dataType, True))
    for c in build_cols:
        f = bmap[c]
        fields.append(StructField(c, f.dataType, True))
    return StructType(fields)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "url",
    ts_probe: str = "join_ts",
    ts_build: str = "warc_ts",
    build_cols: Iterable[str] | None = None,
    strategy: str = "merge_scan",
    num_buckets: int = DEFAULT_BUCKETS,
    salt_k: int = 1,
    tolerance: pd.Timedelta | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each probe row, attach the latest build row of the
    same ``key`` with ``ts_build`` <= ``ts_probe`` (nulls if none).

    ``direction="forward"`` flips the scan: attach the EARLIEST build
    row with ``ts_build`` >= ``ts_probe``. Backward is the FEATURE path
    (zero temporal leakage, BASELINE.json:6); forward is the LABEL
    path — a training pipeline uses it to attach the outcome at the
    next snapshot (e.g. "did the page change by the next crawl"), where
    looking forward is the point, not a leak. ``direction="nearest"``
    attaches the build row minimizing ``|ts_build - ts_probe|``
    (ties -> the backward/earlier row, pd.merge_asof semantics) — the
    snapshot-alignment mode for joining two crawl streams sampled on
    different cadences. Only the merge-scan strategies support
    forward/nearest (the kernel is pd.merge_asof, which takes the
    direction natively).

    Output = all probe columns + ``ts_build`` (matched, nullable) +
    ``build_cols``. Column names must be disjoint from probe's.
    """
    if build_cols is None:
        build_cols = [
            c for c in build.columns if c not in (key, ts_build)
        ]
    build_cols = list(build_cols)
    clash = set(build_cols + [ts_build]) & set(probe.columns)
    if clash:
        raise ValueError(f"build columns clash with probe columns: {clash}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction: {direction}")
    if direction != "backward" and strategy not in (
        "merge_scan", "merge_scan_slim"
    ):
        raise ValueError(
            f"strategy {strategy!r} supports only direction='backward'; "
            "use merge_scan or merge_scan_slim for forward"
        )
    if strategy == "merge_scan":
        return _asof_merge_scan(
            probe, build, key, ts_probe, ts_build, build_cols,
            num_buckets, salt_k, tolerance, direction,
        )
    if strategy == "merge_scan_slim":
        return _asof_merge_scan_slim(
            probe, build, key, ts_probe, ts_build, build_cols,
            num_buckets, salt_k, tolerance, direction,
        )
    if strategy == "union_window":
        return _asof_union_window(
            probe, build, key, ts_probe, ts_build, build_cols, tolerance
        )
    if strategy == "range_scan":
        # range_scan does not implement tolerance; silently ignoring it
        # would return matches beyond the window (ADVICE r1)
        if tolerance is not None:
            raise ValueError(
                "strategy 'range_scan' does not support tolerance; "
                "use merge_scan, merge_scan_slim, or union_window"
            )
        return _asof_range_scan(
            probe, build, key, ts_probe, ts_build, build_cols
        )
    raise ValueError(f"unknown asof strategy: {strategy}")


def _asof_merge_scan(
    probe, build, key, ts_probe, ts_build, build_cols,
    num_buckets, salt_k, tolerance, direction="backward",
):
    schema = _out_schema(probe, build, ts_build, build_cols)
    probe_cols = list(probe.columns)
    b_needed = [key, ts_build] + build_cols

    # Alias every build column to a fresh name BEFORE the cogroup: when
    # probe and build derive from the same source relation (self-as-of),
    # Catalyst deduplicates attribute ids across the two cogroup children
    # and then prunes "duplicate" columns off the build side, handing the
    # kernel a frame without the join key. Fresh aliases = fresh exprIds
    # = no cross-side dedup. The kernel strips the prefix back off.
    pfx = "__r_"
    bsel = build.select(*[F.col(c).alias(pfx + c) for c in b_needed])
    rkey = pfx + key

    if salt_k > 1:
        # probe rows go to ONE hash-chosen salt bucket; build rows are
        # replicated to ALL of them -> every task sees the full history.
        p = probe.withColumn(
            "__b",
            F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets)) * salt_k
            + F.pmod(F.xxhash64(F.col(ts_probe)), F.lit(salt_k)),
        )
        b = (
            bsel
            .withColumn("__s", F.explode(F.sequence(F.lit(0), F.lit(salt_k - 1))))
            .withColumn(
                "__b",
                F.pmod(F.xxhash64(F.col(rkey)), F.lit(num_buckets)) * salt_k
                + F.col("__s"),
            )
            .drop("__s")
        )
    else:
        p = probe.withColumn(
            "__b", F.pmod(F.xxhash64(F.col(key)), F.lit(num_buckets))
        )
        b = bsel.withColumn(
            "__b", F.pmod(F.xxhash64(F.col(rkey)), F.lit(num_buckets))
        )

    def kernel(pl: pd.DataFrame, pr: pd.DataFrame) -> pd.DataFrame:
        if len(pl) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        pl = pl.drop(columns="__b").sort_values(
            ts_probe, kind="mergesort", ignore_index=True
        )
        pr = pr.rename(
            columns=lambda c: c[len(pfx):] if c.startswith(pfx) else c
        )
        if len(pr) == 0 or key not in pr.columns:
            # bucket has probes but no build history: all-null attach
            # (Spark may hand an empty column-less frame here)
            merged = pl
            try:
                merged[ts_build] = pd.Series(
                    [None] * len(pl), dtype=pl[ts_probe].dtype
                )
            except (TypeError, ValueError):
                merged[ts_build] = None
            for c in build_cols:
                merged[c] = None
            return merged[probe_cols + [ts_build] + build_cols]
        pr = pr.drop(columns="__b", errors="ignore").sort_values(
            ts_build, kind="mergesort", ignore_index=True
        )
        merged = pd.merge_asof(
            pl,
            pr,
            left_on=ts_probe,
            right_on=ts_build,
            by=key,
            direction=direction,
            allow_exact_matches=True,
            tolerance=tolerance,
        )
        merged = merged[probe_cols + [ts_build] + build_cols]
        # unmatched probes: merge_asof fills NaN; object-typed columns
        # (arrays, strings) must carry real None for Arrow
        for c in [ts_build] + build_cols:
            col = merged[c]
            if col.dtype == object:
                mask = col.isna()
                if mask.any():
                    merged[c] = col.where(~mask, None)
        return merged

    return (
        p.groupBy("__b")
        .cogroup(b.groupBy("__b"))
        .applyInPandas(kernel, schema=schema)
    )


def _asof_merge_scan_slim(
    probe, build, key, ts_probe, ts_build, build_cols,
    num_buckets, salt_k, tolerance, direction="backward",
):
    """Merge-scan on (key, ts) only + JVM payload re-join.

    The cogroup kernel decides WHICH build snapshot each probe matches
    (slim columns through Arrow); the fat build payload is attached by
    an equi join on (key, matched_ts) that stays in Tungsten row format
    end-to-end. Build must be unique per (key, ts_build) — duplicate
    snapshots would fan out the join (merge_asof would instead pick the
    last), so we assume the snapshot invariant of the pages table.
    """
    slim_build = build.select(key, ts_build)
    matched = _asof_merge_scan(
        probe, slim_build, key, ts_probe, ts_build, [],
        num_buckets, salt_k, tolerance, direction,
    )
    # DataFrame aliases (not column renames) keep the build side's
    # attribute ids, so an upstream hash partitioning on `key` (e.g.
    # the window stage that computed lag/session features) satisfies
    # the join's clustering and only the SLIM matched side is
    # re-shuffled — the fat payload never moves twice.
    m, p = matched.alias("__m"), build.alias("__p")
    joined = m.join(
        p,
        (F.col(f"__m.{key}") == F.col(f"__p.{key}"))
        & (F.col(f"__m.{ts_build}") == F.col(f"__p.{ts_build}")),
        "left",
    )
    return joined.select(
        *[F.col(f"__m.{c}") for c in probe.columns],
        F.col(f"__m.{ts_build}").alias(ts_build),
        *[F.col(f"__p.{c}") for c in build_cols],
    )


def _asof_range_scan(probe, build, key, ts_probe, ts_build, build_cols):
    """Mandate-literal merge-scan: repartitionByRange(key) +
    sortWithinPartitions(key, ts, side) + one streaming forward pass.

    The kernel is an iterator mapInPandas: build rows (side=0) update a
    per-key carry of the latest build ts; probe rows (side=1) read it.
    Range partitioning guarantees all rows of a key land in one
    partition, and the sort guarantees build-before-probe at equal ts
    (allow_exact_matches semantics), so the carry never leaks a future
    row (zero temporal leakage) and survives Arrow batch boundaries
    within the partition. Payloads attach via the slim JVM re-join.
    """
    probe_cols = list(probe.columns)
    p = probe.select(
        F.col(key).alias("__k"),
        F.col(ts_probe).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in probe_cols],
    )
    b = build.select(
        F.col(key).alias("__k"),
        F.col(ts_build).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_cols],
    )
    ts_type = build.schema[ts_build].dataType.simpleString()
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in probe.schema.fields]
        + [f"`{ts_build}` {ts_type}"]
    )
    tagged = (
        b.unionByName(p)
        .repartitionByRange("__k")
        .sortWithinPartitions("__k", "__ts", "__side")
    )

    def scan(batches):
        # cross-batch carry: latest build ts seen per key so far in
        # this partition (a key's rows are contiguous, but a batch
        # boundary can split them)
        carry: dict = {}
        for pdf in batches:
            ks = pdf["__k"]
            sides = pdf["__side"].to_numpy()
            build_ts = pdf["__ts"].where(pdf["__side"].eq(0))
            # vectorized forward-fill of the latest build ts per key;
            # rows before a key's first in-batch build row stay NaT …
            carried = build_ts.groupby(ks.to_numpy(), sort=False).ffill()
            # … and take the previous batch's carry instead (dtype
            # pinned so fillna never object-downcasts)
            carried = carried.fillna(ks.map(carry).astype(carried.dtype))
            last = build_ts.groupby(ks.to_numpy(), sort=False).last()
            carry.update(last.dropna().to_dict())
            emit = sides == 1
            if emit.any():
                out = pdf.loc[emit, probe_cols].copy()
                out[ts_build] = carried[emit]
                yield out

    matched = tagged.mapInPandas(scan, schema=out_schema)
    m, pay = matched.alias("__m"), build.alias("__p")
    joined = m.join(
        pay,
        (F.col(f"__m.{key}") == F.col(f"__p.{key}"))
        & (F.col(f"__m.{ts_build}") == F.col(f"__p.{ts_build}")),
        "left",
    )
    return joined.select(
        *[F.col(f"__m.{c}") for c in probe_cols],
        F.col(f"__m.{ts_build}").alias(ts_build),
        *[F.col(f"__p.{c}") for c in build_cols],
    )


def _asof_union_window(
    probe, build, key, ts_probe, ts_build, build_cols, tolerance=None
):
    from pyspark.sql import Window

    probe_payload = [c for c in probe.columns if c not in (key, ts_probe)]
    b = build.select(
        F.col(key),
        F.col(ts_build).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(ts_build).alias(ts_build),
        *[F.col(c) for c in build_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c)
          for c in probe_payload],
    )
    p = probe.select(
        F.col(key),
        F.col(ts_probe).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(build.schema[ts_build].dataType).alias(ts_build),
        *[F.lit(None).cast(build.schema[c].dataType).alias(c)
          for c in build_cols],
        *[F.col(c) for c in probe_payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = b.unionByName(p).select(
        key,
        F.col("__ts"),
        F.col("__side"),
        *[F.last(c, ignorenulls=True).over(w).alias(c)
          for c in [ts_build] + build_cols],
        *probe_payload,
    )
    out = filled.where(F.col("__side") == 1)
    if tolerance is not None:
        # merge_asof tolerance semantics: the carried match is the
        # latest prior row; if it is older than the window, the probe
        # gets nulls. A conditional projection — still zero Python.
        tol_us = int(pd.Timedelta(tolerance).value // 1000)
        ok = (
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col(ts_build).cast("timestamp"))
        ) <= F.lit(tol_us)
        out = out.select(
            key,
            "__ts",
            *probe_payload,
            *[F.when(ok, F.col(c)).otherwise(F.lit(None)).alias(c)
              for c in [ts_build] + build_cols],
        )
    return out.select(
        key,
        F.col("__ts").alias(ts_probe),
        *probe_payload,
        ts_build,
        *build_cols,
    )
