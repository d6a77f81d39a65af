"""End-to-end test of jobs/train_prep.py under the mandated
spark-submit --py-files packaging: funnel monotonicity, deterministic
split proportions and disjointness, directory-level split partitioning,
and packing-index consistency with the written train fold."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_out(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("train_prep") / "out")
    subprocess.run(
        ["zip", "-qr", "-FS", os.path.join(REPO, "crawlfe.zip"), "crawlfe"],
        cwd=REPO, check=True,
    )
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", os.path.join(REPO, "crawlfe.zip"),
            os.path.join(REPO, "jobs", "train_prep.py"),
            "--input", SF, "--output", out,
        ],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    return out, json.loads(line)


def test_funnel_monotone_and_split_accounting(job_out):
    out, rep = job_out
    f = rep["funnel"]
    vals = list(f.values())
    assert vals == sorted(vals, reverse=True)  # each stage only drops
    assert sum(rep["splits"].values()) == f["lang"]
    # ~90/5/5 md5-bucket split within loose binomial bands
    total = sum(rep["splits"].values())
    assert 0.82 <= rep["splits"]["train"] / total <= 0.96


def test_split_partition_dirs_and_disjointness(job_out):
    out, rep = job_out
    root = os.path.join(out, "cleaned_split")
    subdirs = {d for d in os.listdir(root) if d.startswith("split=")}
    assert subdirs == {f"split={s}" for s in rep["splits"]}
    df = pd.read_parquet(root)
    assert df["doc_id"].is_unique
    assert len(df) == sum(rep["splits"].values())


def test_packed_index_consistent_with_train_fold(job_out):
    out, rep = job_out
    docs = pd.read_parquet(os.path.join(out, "cleaned_split"))
    train = docs[docs["split"] == "train"]
    idx = pd.read_parquet(os.path.join(out, "packed_index"))
    assert idx["n_tokens"].sum() == train["n_tokens"].sum()
    assert idx["n_docs"].sum() == len(train)
    assert rep["n_train_sequences"] == len(idx)
    # per shard: seq ids contiguous from 0, doc ranges non-overlapping
    for src, grp in idx.groupby("source"):
        grp = grp.sort_values("seq_id")
        assert list(grp["seq_id"]) == list(range(len(grp)))
        assert (
            grp["first_doc_id"].iloc[1:].to_numpy()
            > grp["last_doc_id"].iloc[:-1].to_numpy()
        ).all()


def test_rerun_is_deterministic(job_out, tmp_path):
    out, rep = job_out
    r = subprocess.run(
        [
            "spark-submit", "--master", "local[4]",
            "--py-files", os.path.join(REPO, "crawlfe.zip"),
            os.path.join(REPO, "jobs", "train_prep.py"),
            "--input", SF, "--output", str(tmp_path / "again"),
        ],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    rep2 = json.loads(line)
    for k in ("funnel", "splits", "n_train_sequences", "train_tokens",
              "mean_fill"):
        assert rep2[k] == rep[k], k
