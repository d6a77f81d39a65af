"""crawlfe — a PySpark-native point-in-time / as-of join + windowed
feature-engineering engine over Common-Crawl-style web-page tables.

Built from scratch per SURVEY.md; the computation *shape* mirrors the
reference pipeline (batch per-entity feature extraction, then a temporal
comparison stage, then evaluation/metrics — ref: acoss/extractors.py::
batch_feature_extractor and acoss/benchmark/algorithm_template.py::
CoverAlgorithm.all_pairwise [R], see SURVEY.md §0 citation convention),
re-expressed as idiomatic Spark DataFrame + Arrow-vectorized pandas UDFs.

Layout:
    conf        SparkSession/builder configs (AQE, Arrow, shuffle sizing)
    hashing     splitmix64-style stable hashing (scalar + numpy vectorized)
    extract     FROZEN pure-function html -> text extractor (byte-identical)
    textfeat    numpy featurizers shared verbatim by Spark UDFs and oracle
    synth       deterministic synthetic pages generator (distributed + pandas)
    features    Spark featurize stage (mapInPandas + lineage capture)
    asof        merge-scan as-of join (cogrouped Arrow kernel + union-window)
    windows     lag/lead, rolling, rank, cumsum, sessionize, backfill
    io          iceberg-lite parquet table: staged atomic commit + manifest
    pipeline    end-to-end featurize job with checkpoint/resume
    oracle      single-node pandas/DuckDB oracles for parity tests
"""

__version__ = "0.1.0"
