"""End-to-end test of jobs/corpus_monitor.py under the mandated
spark-submit --py-files packaging: the three report tables land, the
summary line is internally consistent with them, and the statistics
match the (oracle-verified) registry queries on the same input."""

from __future__ import annotations

import json
import os
import subprocess

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus_monitor") / "out")
    subprocess.run(
        ["zip", "-qr", "-FS", os.path.join(REPO, "crawlfe.zip"), "crawlfe"],
        cwd=REPO, check=True,
    )
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", os.path.join(REPO, "crawlfe.zip"),
            os.path.join(REPO, "jobs", "corpus_monitor.py"),
            "--input", SF, "--output", out,
        ],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return out, json.loads(line)


def test_reports_land_and_summary_consistent(job_out):
    out, rep = job_out
    cards = pd.read_parquet(os.path.join(out, "dataset_cards"))
    drift = pd.read_parquet(os.path.join(out, "ks_drift"))
    benford = pd.read_parquet(os.path.join(out, "benford_audit"))
    assert rep["n_sources"] == len(cards)
    assert rep["total_docs"] == cards["n_docs"].sum()
    assert rep["total_tokens"] == cards["total_tokens"].sum()
    assert rep["max_dup_rate"] == cards["dup_rate"].max()
    assert rep["max_ks"] == drift["ks_stat"].max()
    assert rep["max_benford_gap"] == round(
        (benford["obs_share"] - benford["exp_share"]).abs().max(), 6
    )
    # default alert threshold 0.1: alerts are exactly the exceeders
    assert rep["ks_alerts"] == sorted(
        drift[drift["ks_stat"] > 0.1]["event_type"]
    )
    psi = pd.read_parquet(os.path.join(out, "psi_drift"))
    mi = pd.read_parquet(os.path.join(out, "mutual_info"))
    assert rep["max_psi"] == round(psi["psi_total"].max(), 6)
    assert rep["lang_source_mi"] == round(mi["mi_total"].max(), 6)
    # MI total is one value repeated per cell, and non-negative
    assert mi["mi_total"].nunique() == 1
    assert rep["lang_source_mi"] >= 0


def test_reports_match_registry_queries(spark, job_out):
    """What the job ships equals what the oracle-verified registry
    queries compute — the job adds packaging, not new math."""
    from crawlfe.queries import q_dataset_card, q_ks_drift

    out, _ = job_out
    shipped = (
        pd.read_parquet(os.path.join(out, "dataset_cards"))
        .sort_values("source", ignore_index=True)
    )
    direct = (
        q_dataset_card(spark, SF).toPandas()
        .sort_values("source", ignore_index=True)
    )
    pd.testing.assert_frame_equal(shipped, direct[shipped.columns])
    shipped_ks = (
        pd.read_parquet(os.path.join(out, "ks_drift"))
        .sort_values("event_type", ignore_index=True)
    )
    direct_ks = (
        q_ks_drift(spark, SF).toPandas()
        .sort_values("event_type", ignore_index=True)
    )
    pd.testing.assert_frame_equal(shipped_ks, direct_ks[shipped_ks.columns])
