"""Training-data prep ops (pack #4): sequence packing, vocabulary
build, dataloader sharding — semantic invariants + the parallel-window
plan shapes the 100 TB design depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlfe.queries import (
    _t,
    q_seq_pack,
    q_shard_assign,
    q_vocab_topv,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_seq_pack_conserves_tokens_and_is_contiguous(spark, sf_dir):
    packed = q_seq_pack(spark, sf_dir).toPandas()
    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("n"),
    )
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("n").alias("t")).collect()
    }
    for src, grp in packed.groupby("source"):
        # token conservation: packing loses / duplicates nothing
        assert grp["n_tokens"].sum() == totals[src]
        # contiguous seq ids from 0; doc ranges don't interleave
        ids = sorted(grp["seq_id"])
        assert ids == list(range(len(ids)))
        g = grp.sort_values("seq_id")
        assert (g["first_doc_id"] <= g["last_doc_id"]).all()
        assert (
            g["last_doc_id"].values[:-1] < g["first_doc_id"].values[1:]
        ).all()


def test_seq_pack_no_global_window(spark, sf_dir):
    """Packing must window per source shard — a global (empty
    partitionBy) running sum would serialize the whole corpus through
    one partition. SinglePartition anywhere in the window stage is the
    scale failure this test pins out."""
    plan = plan_of(q_seq_pack(spark, sf_dir))
    assert "SinglePartition" not in plan, plan
    # window shuffle on source; groupBy(source, seq_id) reuses that
    # hash partitioning (subset-key co-partition) — no second exchange
    assert plan.count("Exchange") == 1, plan


def test_vocab_topv_ids_dense_and_sorted(spark, sf_dir):
    v = q_vocab_topv(spark, sf_dir).toPandas().sort_values("vocab_id")
    assert list(v["vocab_id"]) == list(range(1, len(v) + 1))
    assert len(v) <= 500
    # counts non-increasing; ties broken by token ascending
    ns = v["n"].values
    assert (ns[:-1] >= ns[1:]).all()
    assert v["token"].is_unique


def test_shard_assign_disjoint_and_dense(spark, sf_dir):
    s = q_shard_assign(spark, sf_dir).toPandas()
    n_docs = len(s)
    assert s["doc_id"].is_unique  # every doc exactly one shard
    for _, grp in s.groupby("shard"):
        pos = sorted(grp["position"])
        assert pos == list(range(1, len(grp) + 1))
    assert s.groupby("shard").size().sum() == n_docs
    assert set(s["shard"]) <= set(range(8))


def test_shard_assign_matches_content_derived_spec(spark, sf_dir):
    """Shard assignment is content-derived (md5 of doc_id) and
    positions are rank-of-doc_id within shard, so the full output is
    reproducible from the row values alone — independent of partition
    layout or cluster size. Recompute the spec in pure Python and
    require bit-equality."""
    import hashlib

    s = q_shard_assign(spark, sf_dir).toPandas()
    spec_shard = {
        d: int(hashlib.md5(str(d).encode()).hexdigest()[:6], 16) % 8
        for d in s["doc_id"]
    }
    assert all(spec_shard[d] == sh for d, sh in zip(s["doc_id"], s["shard"]))
    spec_pos = (
        s.sort_values("doc_id").groupby("shard").cumcount() + 1
    )
    got = dict(zip(s.sort_values("doc_id")["doc_id"], spec_pos))
    assert all(got[d] == p for d, p in zip(s["doc_id"], s["position"]))


def test_vocab_topv_distributed_topv(spark, sf_dir):
    """The top-V cut must be TakeOrderedAndProject (per-partition heap
    + driver merge) — never a global-sort or a rank window over the
    entire vocabulary. The only exchange is the token aggregation."""
    plan = plan_of(q_vocab_topv(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 1, plan
