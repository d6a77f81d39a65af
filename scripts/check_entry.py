"""Mimic the driver's correctness harness (see __spark_entry__.py header):
run entry(), then every queries()[name] on Spark and its oracle_sql()
twin on DuckDB at sf0.01, and compare row count, column names, and
order-insensitive values (exact for non-floats; exact-preferred for
floats with an allclose fallback reported as RISK since the driver
hashes exact values).

Usage: python scripts/check_entry.py [sf_dir] [query ...]
       CHECK_ENTRY_JSON=path python scripts/check_entry.py [sf_dir]
         — additionally append one JSON line {sf_dir, git, n_pass,
           n_fail, fails, per_query} to `path` (committable evidence
           of a sweep, e.g. BENCH/sweeps.jsonl)
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class ListColumnError(TypeError):
    """A list/array-valued output column. The DRIVER's canonicalizer
    sorts columns with pandas before hashing and crashes on unhashable
    list cells (CORRECTNESS_r02 agg_vector). check_entry used to paper
    over this by mapping lists->tuples; now it fails the same way the
    driver does so the class of bug reproduces locally (VERDICT r2
    next-round item #3). Queries must emit scalar columns (long-form)."""


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            bad = pdf[c].map(lambda v: isinstance(v, (list, np.ndarray))).any()
            if bad:
                raise ListColumnError(
                    f"column {c!r} holds list values — the driver's "
                    "canonicalizer cannot sort these (unhashable type: "
                    "'list'); emit long-form scalar rows instead"
                )
    key = [c for c in pdf.columns if pdf[c].dtype != object or True]
    try:
        pdf = pdf.sort_values(key, kind="mergesort", ignore_index=True, na_position="last")
    except TypeError:
        pdf = pdf.sort_values(
            key, kind="mergesort", ignore_index=True, na_position="last",
            key=lambda s: s.astype(str),
        )
    return pdf


def compare(name: str, spdf: pd.DataFrame, opdf: pd.DataFrame) -> str:
    if len(spdf) != len(opdf):
        return f"ROWS {len(spdf)} != {len(opdf)}"
    if sorted(spdf.columns) != sorted(opdf.columns):
        return f"SCHEMA {sorted(spdf.columns)} != {sorted(opdf.columns)}"
    try:
        s, o = canon(spdf.copy()), canon(opdf.copy())
    except ListColumnError as e:
        return f"LIST-COLUMN {e}"
    risks = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        # Dtype fidelity: the driver hashes exact values, so an int column
        # on one side vs float on the other (e.g. DuckDB HUGEINT -> float64
        # via fetchdf) WILL hash-mismatch even though 3 == 3.0 here. Fail
        # loudly instead of silently passing (VERDICT r1 "What's wrong" #1/#4).
        s_num = pd.api.types.is_integer_dtype(sv) or pd.api.types.is_float_dtype(sv)
        o_num = pd.api.types.is_integer_dtype(ov) or pd.api.types.is_float_dtype(ov)
        if s_num and o_num and (
            pd.api.types.is_float_dtype(sv) != pd.api.types.is_float_dtype(ov)
        ):
            return (
                f"DTYPE col={c}: spark {sv.dtype} vs oracle {ov.dtype} "
                "(int/float disagreement would fail the driver's exact hash)"
            )
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            a, b = sv.to_numpy(float), ov.to_numpy(float)
            both_nan = np.isnan(a) & np.isnan(b)
            exact = (a == b) | both_nan
            if not exact.all():
                close = np.isclose(a, b, rtol=1e-9, atol=1e-12) | both_nan
                if close.all():
                    risks.append(f"{c}: {int((~exact).sum())} float-inexact")
                else:
                    i = int(np.argmax(~close))
                    return f"VALUES col={c} row{i}: {a[i]!r} != {b[i]!r}"
        else:
            sa = sv.astype(object).where(pd.notna(sv), None)
            oa = ov.astype(object).where(pd.notna(ov), None)
            neq = sa.to_numpy() != oa.to_numpy()
            if neq.any():
                i = int(np.argmax(neq))
                return (
                    f"VALUES col={c} row{i}: {sa.iloc[i]!r} != {oa.iloc[i]!r}"
                    f" (types {type(sa.iloc[i]).__name__}/{type(oa.iloc[i]).__name__})"
                )
    return "OK" + (f" [RISK {'; '.join(risks)}]" if risks else "")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from crawlfe.conf import get_spark

    spark = get_spark(app="check_entry", cores=8)

    print("== entry() smoke ==")
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry rows={n} schema={[f.name for f in edf.schema.fields]}")
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    per_query: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"{name:22s} SPARK-ERROR {msg}")
            fails.append(name)
            continue
        if name in oracles:
            try:
                opdf = con.execute(oracles[name]).fetchdf()
            except Exception as e:
                msg = str(e).splitlines()[0][:160]
                print(f"{name:22s} ORACLE-ERROR {msg}")
                fails.append(name)
                continue
            verdict = compare(name, spdf, opdf)
        else:
            verdict = f"rows-only ({len(spdf)} rows)"
        dt = time.time() - t0
        status = "PASS" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            fails.append(name)
        per_query[name] = verdict
        print(f"{name:22s} {status} {verdict}  [{dt:.1f}s]")
    spark.stop()
    json_path = os.environ.get("CHECK_ENTRY_JSON")
    if json_path and not only:
        import json
        import subprocess

        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        with open(json_path, "a") as f:
            f.write(json.dumps({
                "sf_dir": sf_dir,
                "git": git,
                "n_pass": len(per_query) - len(fails),
                "n_fail": len(fails),
                "fails": fails,
                "per_query": per_query,
            }) + "\n")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL GREEN")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
