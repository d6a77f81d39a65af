"""Semantic tests for feature-eng pack #110: FK orphans, FD
violations, duplicate-key audit (brute pandas replicas; cross-engine
parity is proven by the check_entry sweeps)."""

from __future__ import annotations

import pandas as pd

from crawlfe.queries import (
    _FDS,
    _FKS,
    _KEYS,
    q_dup_key_audit,
    q_fd_violations,
    q_fk_orphans,
)

SF = "/root/testdata/sf0.001"


def _tb(name):
    return pd.read_parquet(f"{SF}/{name}.parquet")


def test_fk_orphans_brute(spark):
    out = q_fk_orphans(spark, SF).toPandas().set_index("fk")
    assert len(out) == len(_FKS)
    for name, child, ck, parent, pk in _FKS:
        c, p = _tb(child), _tb(parent)
        orph = (~c[ck].astype("int64").isin(p[pk].astype("int64"))).sum()
        row = out.loc[name]
        assert row.n_rows == len(c)
        assert row.n_orphans == orph
        assert abs(row.orphan_rate - round(orph / len(c), 6)) < 1e-9
    # driver testdata is referentially clean
    assert (out.n_orphans == 0).all()


def test_fd_violations_brute(spark):
    out = q_fd_violations(spark, SF).toPandas().set_index("fd")
    assert len(out) == len(_FDS)
    for name, table, x, y in _FDS:
        t = _tb(table)
        grp = t.groupby([x, y]).size().rename("c").reset_index()
        per_x = grp.groupby(x)["c"].agg(["max", "sum"])
        row = out.loc[name]
        assert row.n_groups == len(per_x)
        assert row.n_rows == int(per_x["sum"].sum())
        assert row.n_conforming == int(per_x["max"].sum())
        expect = round(
            1 - per_x["max"].sum() / per_x["sum"].sum(), 6
        )
        assert abs(row.violation_rate - expect) < 1e-9


def test_dup_key_audit_brute(spark):
    out = q_dup_key_audit(spark, SF).toPandas().set_index("key_name")
    assert len(out) == len(_KEYS)
    for name, table, cols in _KEYS:
        t = _tb(table)
        g = t.groupby(cols).size()
        row = out.loc[name]
        assert row.n_rows == len(t)
        assert row.n_distinct == len(g)
        assert row.n_dup_rows == len(t) - len(g)
        assert row.max_multiplicity == int(g.max())
