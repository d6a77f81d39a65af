"""Feature-eng packs #33-#36: distributional shape, ranking overlap, calendar structure.

Split from the former crawlfe/queries.py monolith (r4); bodies unchanged.
"""
from __future__ import annotations

import pandas as pd  # noqa: F401
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T  # noqa: F401

from .. import clean  # noqa: F401
from .. import windows as W  # noqa: F401
from ..asof import asof_join  # noqa: F401
from ..textfeat import featurize_batch  # noqa: F401
from ._shared import SESSION_GAP_S, _t, _us  # noqa: F401



_EULER_GAMMA = 0.5772156649015329


def q_block_maxima(spark, sf_dir):
    """Per-event-type GUMBEL fit of 30-day BLOCK MAXIMA of daily
    counts — the extreme-value method-of-moments (scale =
    sqrt(6*var)/pi, location = mean - gamma*scale) that turns 'how
    bad was the worst day' into a return-level model. The
    block-maxima complement to `hill_tail`'s peaks-over-threshold.

    Blocks are epoch-day div 30 (identical integer arithmetic both
    engines — no calendar edge cases); block maxima, the moment sums
    and the variance numerator n*S2 - S^2 are exact BIGINTs; loc and
    scale are one fixed double expression each."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    blocks = daily.withColumn(
        "blk", F.expr("d div 30").cast("bigint")
    ).groupBy("event_type", "blk").agg(
        F.max("c").cast("bigint").alias("m")
    )
    agg = blocks.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.max("m").cast("bigint").alias("max_daily"),
        F.sum("m").cast("bigint").alias("s"),
        F.sum(F.col("m") * F.col("m")).cast("bigint").alias("s2"),
    )
    varn = (
        F.col("n_blocks") * F.col("s2") - F.col("s") * F.col("s")
    ).cast("bigint")
    agg = agg.withColumn("varn", varn)
    var = F.col("varn").cast("double") / (
        F.col("n_blocks") * (F.col("n_blocks") - 1)
    ).cast("double")
    scale = F.sqrt(F.lit(6.0) * var) / F.lit(3.141592653589793)
    mean = F.col("s").cast("double") / F.col("n_blocks").cast("double")
    return agg.where(
        (F.col("n_blocks") >= 3) & (F.col("varn") > 0)
    ).select(
        "event_type",
        "n_blocks",
        "max_daily",
        F.round(mean - F.lit(_EULER_GAMMA) * scale, 6).alias(
            "gumbel_loc"
        ),
        F.round(scale, 6).alias("gumbel_scale"),
    )


SQL_BLOCK_MAXIMA = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), blocks AS (
  SELECT event_type, CAST(d // 30 AS BIGINT) AS blk,
         CAST(max(c) AS BIGINT) AS m
  FROM daily GROUP BY 1, 2
), agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(max(m) AS BIGINT) AS max_daily,
         CAST(sum(m) AS BIGINT) AS s,
         CAST(sum(m * m) AS BIGINT) AS s2
  FROM blocks GROUP BY 1
)
SELECT event_type, n_blocks, max_daily,
       round(CAST(s AS DOUBLE) / CAST(n_blocks AS DOUBLE)
             - 0.5772156649015329
               * (sqrt(6.0 * (CAST(n_blocks * s2 - s * s AS DOUBLE)
                              / CAST(n_blocks * (n_blocks - 1)
                                     AS DOUBLE)))
                  / 3.141592653589793), 6) AS gumbel_loc,
       round(sqrt(6.0 * (CAST(n_blocks * s2 - s * s AS DOUBLE)
                         / CAST(n_blocks * (n_blocks - 1) AS DOUBLE)))
             / 3.141592653589793, 6) AS gumbel_scale
FROM agg WHERE n_blocks >= 3 AND n_blocks * s2 - s * s > 0
"""


_LOGODDS_ALPHA = 0.5
_LOGODDS_TOPK = 5


def q_log_odds_terms(spark, sf_dir):
    """Per-source TOP-5 distinguishing tokens by z-scored WEIGHTED
    LOG-ODDS with a Dirichlet prior (Monroe, Colaresi & Quinn 2008,
    'Fightin' Words') — the corpus-comparison term ranking that,
    unlike `chi2_terms` and `tfidf_topk`, is variance-stabilized so
    rare tokens can't dominate.

    delta = ln-odds(source) - ln-odds(rest) with alpha = 0.5 and the
    V*alpha prior mass in each denominator; sigma^2 = 1/(y_s+alpha)
    + 1/(y_r+alpha); rank on the raw z (ties break on token) inside
    a per-source window, round for output only. V (global vocab) and
    corpus totals broadcast; only (source, token) rows materialize."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    ).where(F.col("token") != "")
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("y_s")
    )
    tot = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all")
    )
    n_s = st.groupBy("source").agg(F.sum("y_s").alias("n_s"))
    g = tot.agg(
        F.sum("c_all").cast("bigint").alias("n_all"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    j = (
        st.join(tot, "token")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(g))
        .select(
            "source",
            "token",
            "y_s",
            (F.col("c_all") - F.col("y_s")).alias("y_r"),
            "n_s",
            (F.col("n_all") - F.col("n_s")).alias("n_r"),
            "v",
        )
    )
    a = F.lit(_LOGODDS_ALPHA)
    va = F.col("v").cast("double") * a
    ys = F.col("y_s").cast("double") + a
    yr = F.col("y_r").cast("double") + a
    ds = F.col("n_s").cast("double") + va - ys
    dr = F.col("n_r").cast("double") + va - yr
    z = (F.log(ys / ds) - F.log(yr / dr)) / F.sqrt(
        F.lit(1.0) / ys + F.lit(1.0) / yr
    )
    w = Window.partitionBy("source").orderBy(
        F.col("z").desc(), F.col("token")
    )
    ranked = (
        j.withColumn("z", z)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _LOGODDS_TOPK)
    )
    return ranked.select(
        "source",
        F.col("rk").cast("bigint").alias("rk"),
        "token",
        "y_s",
        F.round(F.col("z"), 6).alias("z_logodds"),
    )


SQL_LOG_ODDS_TERMS = f"""
WITH tok AS (
  SELECT source, t.token
  FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\\s+'))
         AS t(token)
  WHERE t.token <> ''
), st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS y_s
  FROM tok GROUP BY 1, 2
), tot AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c_all
  FROM tok GROUP BY 1
), ns AS (
  SELECT source, CAST(sum(y_s) AS BIGINT) AS n_s FROM st GROUP BY 1
), g AS (
  SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
         CAST(count(*) AS BIGINT) AS v
  FROM tot
), z AS (
  SELECT st.source, st.token, st.y_s,
         (ln((CAST(st.y_s AS DOUBLE) + {_LOGODDS_ALPHA})
             / (CAST(ns.n_s AS DOUBLE)
                + CAST(g.v AS DOUBLE) * {_LOGODDS_ALPHA}
                - (CAST(st.y_s AS DOUBLE) + {_LOGODDS_ALPHA})))
          - ln((CAST(tot.c_all - st.y_s AS DOUBLE) + {_LOGODDS_ALPHA})
               / (CAST(g.n_all - ns.n_s AS DOUBLE)
                  + CAST(g.v AS DOUBLE) * {_LOGODDS_ALPHA}
                  - (CAST(tot.c_all - st.y_s AS DOUBLE)
                     + {_LOGODDS_ALPHA}))))
         / sqrt(1.0 / (CAST(st.y_s AS DOUBLE) + {_LOGODDS_ALPHA})
                + 1.0 / (CAST(tot.c_all - st.y_s AS DOUBLE)
                         + {_LOGODDS_ALPHA})) AS zv
  FROM st
  JOIN tot ON st.token = tot.token
  JOIN ns ON st.source = ns.source
  CROSS JOIN g
), ranked AS (
  SELECT source, token, y_s, zv,
         row_number() OVER (PARTITION BY source
                            ORDER BY zv DESC, token) AS rk
  FROM z
)
SELECT source, CAST(rk AS BIGINT) AS rk, token, y_s,
       round(zv, 6) AS z_logodds
FROM ranked WHERE rk <= {_LOGODDS_TOPK}
"""


def q_pareto_front(spark, sf_dir):
    """Per-source PARETO FRONT (skyline) of documents on
    (n_chars, distinct-token vocabulary) — the docs no other doc in
    the source beats on BOTH length and lexical diversity: the
    'keep the efficient frontier' selection rule for exemplar
    mining, and the classic skyline operator SQL lacks.

    Vocabulary is a JVM higher-order expression (split -> filter ->
    array_distinct -> size — no explode, no shuffle). The skyline
    uses one partition-local RANGE window: a doc survives iff its
    vocab exceeds max(vocab) over all docs with STRICTLY greater
    n_chars (RANGE ... 1 PRECEDING under the descending order —
    value-based, so equal-length docs never dominate each other).
    Dominance ties on both axes keep all tied docs (weak
    dominance)."""
    d = _t(spark, sf_dir, "documents")
    vocab = F.size(
        F.array_distinct(
            F.filter(
                F.split(F.trim(F.col("text")), "\\s+"),
                lambda x: x != F.lit(""),
            )
        )
    ).cast("bigint")
    base = d.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        vocab.alias("vocab"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sky = base.withColumn("best_longer", F.max("vocab").over(w))
    return sky.where(
        F.col("best_longer").isNull()
        | (F.col("vocab") > F.col("best_longer"))
    ).select("source", "doc_id", "n_chars", "vocab")


SQL_PARETO_FRONT = """
WITH base AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(length(list_distinct(list_filter(
                string_split_regex(trim(text), '\\s+'),
                x -> x <> ''))) AS BIGINT) AS vocab
  FROM documents
), sky AS (
  SELECT source, doc_id, n_chars, vocab,
         max(vocab) OVER (PARTITION BY source ORDER BY n_chars DESC
                          RANGE BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS best_longer
  FROM base
)
SELECT source, doc_id, n_chars, vocab
FROM sky WHERE best_longer IS NULL OR vocab > best_longer
"""


_SAX_DAYS = 32
_SAX_BP = 0.6744897501960817  # N(0,1) upper-quartile breakpoint


def q_sax_words(spark, sf_dir):
    """Per-user SAX WORD — the Symbolic Aggregate approXimation of
    the first 32 active days' counts: z-normalize against the
    window's exact moments, then map each day to a quartile letter
    (a < -0.674 < b < 0 < c < 0.674 < d). The discretized shape
    signature used for time-series indexing/motif search; two users
    with the same word have the same weekly rhythm regardless of
    volume.

    The day cap bounds the per-user frame; moments are exact BIGINT
    sums so mu/sigma are single fixed double expressions, and the
    letters come from double comparisons both engines evaluate on
    identical values. The word assembles with an ordered string agg
    (array_sort on (day, letter) structs — deterministic)."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .groupBy("user_id", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wseq = Window.partitionBy("user_id").orderBy("d")
    head = daily.withColumn(
        "rk", F.row_number().over(wseq)
    ).where(F.col("rk") <= _SAX_DAYS)
    m = head.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    ).withColumn(
        "varn",
        (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
            "bigint"
        ),
    ).where((F.col("n") >= 4) & (F.col("varn") > 0))
    j = head.join(m, "user_id")
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        F.col("varn").cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    z = (F.col("c").cast("double") - mu) / sd
    letter = (
        F.when(z < F.lit(-_SAX_BP), F.lit("a"))
        .when(z < F.lit(0.0), F.lit("b"))
        .when(z < F.lit(_SAX_BP), F.lit("c"))
        .otherwise(F.lit("d"))
    )
    per = j.withColumn("letter", letter)
    return (
        per.groupBy("user_id", "n")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("d"), F.col("letter"))
                        )
                    ),
                    lambda x: x.getField("letter"),
                ),
            ).alias("sax_word")
        )
        .select("user_id", F.col("n").alias("n_days"), "sax_word")
    )


SQL_SAX_WORDS = f"""
WITH daily AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), head AS (
  SELECT user_id, d, c
  FROM (SELECT user_id, d, c,
               row_number() OVER (PARTITION BY user_id ORDER BY d)
                 AS rk
        FROM daily) t
  WHERE rk <= {_SAX_DAYS}
), m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS s,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM head GROUP BY 1
), mm AS (
  SELECT user_id, n, s, s2,
         CAST(n * s2 - s * s AS BIGINT) AS varn
  FROM m
  WHERE n >= 4 AND n * s2 - s * s > 0
), lettered AS (
  SELECT h.user_id, mm.n, h.d,
         CASE
           WHEN (CAST(h.c AS DOUBLE)
                 - CAST(mm.s AS DOUBLE) / CAST(mm.n AS DOUBLE))
                / sqrt(CAST(mm.varn AS DOUBLE)
                       / CAST(mm.n * (mm.n - 1) AS DOUBLE))
                < -{_SAX_BP} THEN 'a'
           WHEN (CAST(h.c AS DOUBLE)
                 - CAST(mm.s AS DOUBLE) / CAST(mm.n AS DOUBLE))
                / sqrt(CAST(mm.varn AS DOUBLE)
                       / CAST(mm.n * (mm.n - 1) AS DOUBLE))
                < 0.0 THEN 'b'
           WHEN (CAST(h.c AS DOUBLE)
                 - CAST(mm.s AS DOUBLE) / CAST(mm.n AS DOUBLE))
                / sqrt(CAST(mm.varn AS DOUBLE)
                       / CAST(mm.n * (mm.n - 1) AS DOUBLE))
                < {_SAX_BP} THEN 'c'
           ELSE 'd'
         END AS letter
  FROM head h JOIN mm ON h.user_id = mm.user_id
)
SELECT user_id, n AS n_days,
       string_agg(letter, '' ORDER BY d) AS sax_word
FROM lettered GROUP BY 1, 2
"""


def q_transition_entropy(spark, sf_dir):
    """Per-user CONDITIONAL ENTROPY of event-type transitions —
    H(next | prev) over the user's chronologically ordered event
    stream: 0 for deterministic state machines (bots), high for
    exploratory humans. The information-theoretic reduction of the
    `event_transitions` Markov-bigram counts.

    One partition-local lag window builds the bigrams; H*T =
    sum n_pn * ln(n_p / n_pn) over the per-(prev, next) counts —
    each term is one fixed double expression from two BIGINTs,
    ppm-fixed before the cross-row sum (association-order-proof),
    with the single division by T at the end."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bg = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev", F.lag("event_type").over(wseq))
        .where(F.col("prev").isNotNull())
        .groupBy("user_id", "prev", F.col("event_type").alias("nxt"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pn"))
    )
    np_ = bg.groupBy("user_id", "prev").agg(
        F.sum("n_pn").cast("bigint").alias("n_p")
    )
    terms = bg.join(np_, ["user_id", "prev"]).select(
        "user_id",
        "n_pn",
        F.expr(
            "CAST(round(1e6 * CAST(n_pn AS DOUBLE)"
            " * ln(CAST(n_p AS DOUBLE) / CAST(n_pn AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("term_ppm"),
    )
    agg = terms.groupBy("user_id").agg(
        F.sum("n_pn").cast("bigint").alias("n_trans"),
        F.sum("term_ppm").cast("bigint").alias("sum_ppm"),
    )
    return agg.select(
        "user_id",
        "n_trans",
        F.round(
            F.col("sum_ppm").cast("double")
            / (F.lit(1e6) * F.col("n_trans").cast("double")),
            6,
        ).alias("h_cond"),
    )


SQL_TRANSITION_ENTROPY = """
WITH bg AS (
  SELECT user_id, prev, event_type AS nxt,
         CAST(count(*) AS BIGINT) AS n_pn
  FROM (SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events) t
  WHERE prev IS NOT NULL
  GROUP BY 1, 2, 3
), np AS (
  SELECT user_id, prev, CAST(sum(n_pn) AS BIGINT) AS n_p
  FROM bg GROUP BY 1, 2
), terms AS (
  SELECT bg.user_id, bg.n_pn,
         CAST(round(1e6 * CAST(bg.n_pn AS DOUBLE)
                    * ln(CAST(np.n_p AS DOUBLE)
                         / CAST(bg.n_pn AS DOUBLE))) AS BIGINT)
           AS term_ppm
  FROM bg JOIN np
    ON bg.user_id = np.user_id AND bg.prev = np.prev
)
SELECT user_id,
       CAST(sum(n_pn) AS BIGINT) AS n_trans,
       round(CAST(sum(term_ppm) AS DOUBLE)
             / (1e6 * CAST(sum(n_pn) AS DOUBLE)), 6) AS h_cond
FROM terms GROUP BY 1
"""


def q_time_weighted_avg(spark, sf_dir):
    """Per-user TIME-WEIGHTED average event value — each value holds
    until the next event, so the mean weights by holding duration
    (the IoT/finance resampling rule; an arithmetic mean over
    irregular timestamps is biased toward burst periods). The
    last event has no successor and drops, per the standard
    left-closed convention.

    One partition-local lead window builds the holding intervals;
    value cents x interval MILLISECONDS keeps every product under
    2^62 (microseconds would overflow on multi-year spans), so
    numerator and denominator are exact BIGINTs and the average is
    one rounded division."""
    e = _t(spark, sf_dir, "events")
    iv = (
        e.select(
            "user_id",
            _us("ts").alias("us"),
            "event_id",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .withColumn(
            "next_us",
            F.lead("us").over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
        .where(F.col("next_us").isNotNull())
        .select(
            "user_id",
            "cents",
            F.expr("(next_us - us) div 1000").alias("w_ms"),
        )
    )
    agg = iv.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("cents") * F.col("w_ms"))
        .cast("bigint")
        .alias("num"),
        F.sum("w_ms").cast("bigint").alias("den"),
    )
    return agg.where(F.col("den") > 0).select(
        "user_id",
        "n_intervals",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"),
            6,
        ).alias("twa_cents"),
    )


SQL_TIME_WEIGHTED_AVG = """
WITH iv AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
          - epoch_us(ts)) // 1000 AS w_ms
  FROM events
), agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_intervals,
         CAST(sum(cents * w_ms) AS BIGINT) AS num,
         CAST(sum(w_ms) AS BIGINT) AS den
  FROM iv WHERE w_ms IS NOT NULL GROUP BY 1
)
SELECT user_id, n_intervals,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
         AS twa_cents
FROM agg WHERE den > 0
"""


def q_ohlc_bars(spark, sf_dir):
    """Per-(user, day) OHLC RESAMPLING of event values — open/high/
    low/close in exact cents plus the bar's event count: the
    irregular-to-regular downsampling primitive every time-series
    feature store starts from (candlesticks for markets, daily
    activity bars here).

    Open/close are conditional aggregates over a per-(user, day)
    row_number pair (first/last by (ts, event_id) — fully
    deterministic, no min_by/arg_min engine-semantics risk); high/
    low are plain min/max. One window + one hash agg, both keyed on
    (user_id, day) — the natural partitioning."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        )
        .cast("bigint")
        .alias("d"),
        "ts",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    wasc = Window.partitionBy("user_id", "d").orderBy("ts", "event_id")
    wdesc = Window.partitionBy("user_id", "d").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = base.withColumn("rka", F.row_number().over(wasc)).withColumn(
        "rkd", F.row_number().over(wdesc)
    )
    return r.groupBy("user_id", "d").agg(
        F.max(F.when(F.col("rka") == 1, F.col("cents")))
        .cast("bigint")
        .alias("open"),
        F.max("cents").cast("bigint").alias("high"),
        F.min("cents").cast("bigint").alias("low"),
        F.max(F.when(F.col("rkd") == 1, F.col("cents")))
        .cast("bigint")
        .alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


SQL_OHLC_BARS = """
WITH base AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT user_id, d, cents,
         row_number() OVER (PARTITION BY user_id, d
                            ORDER BY ts, event_id) AS rka,
         row_number() OVER (PARTITION BY user_id, d
                            ORDER BY ts DESC, event_id DESC) AS rkd
  FROM base
)
SELECT user_id, d,
       CAST(max(CASE WHEN rka = 1 THEN cents END) AS BIGINT) AS open,
       CAST(max(cents) AS BIGINT) AS high,
       CAST(min(cents) AS BIGINT) AS low,
       CAST(max(CASE WHEN rkd = 1 THEN cents END) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n_events
FROM r GROUP BY 1, 2
"""


def q_win_percentile_dist(spark, sf_dir):
    """percent_rank + cume_dist distribution windows over event
    value within each event type — the remaining two SQL-standard
    distribution window functions (`win_ntile` covered ntile;
    `win_rank` the ranking trio). Both are tie-aware by the SQL
    definition, so the (value, event_id) ordering matters only for
    row identity, not the emitted fractions.

    One partition-local window keyed on event_type; rounded to 6 in
    both engines."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    return base.select(
        "event_id",
        "event_type",
        "cents",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


SQL_WIN_PERCENTILE_DIST = """
SELECT event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS cents,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY CAST(round(value * 100)
                                                AS BIGINT)),
             6) AS pct_rank,
       round(cume_dist() OVER (PARTITION BY event_type
                               ORDER BY CAST(round(value * 100)
                                             AS BIGINT)),
             6) AS cume
FROM events
"""


def q_interp_linear(spark, sf_dir):
    """LINEAR-interpolation gap fill of each user's daily net value
    — the missing days between two observed days get the straight-
    line value (prev + (next - prev) * (d - d_prev)/(d_next -
    d_prev)): the numeric-series companion to `backfill`'s
    forward-fill (ffill is right for states, interpolation for
    level measurements).

    Grid days come from one sequence() explode per user (bounded by
    the corpus day span); the bracketing observed (day, value)
    pairs come from two partition-local ignorenulls windows over
    the same grid; daily sums are exact cents, so the interpolation
    is one fixed double expression on BIGINT inputs. Leading/
    trailing unobserved days have no bracket and drop (inner
    interpolation only, like pandas interpolate(limit_area=
    'inside'))."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("user_id", "d")
        .agg(F.sum("cents").cast("bigint").alias("v"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("d"),
    )
    g = grid.join(daily, ["user_id", "d"], "left")
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wnext = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("v").isNotNull(), F.col("d"))
    b = (
        g.withColumn("pv", F.last("v", ignorenulls=True).over(wprev))
        .withColumn("pd", F.last(obs_d, ignorenulls=True).over(wprev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wnext))
        .withColumn("nd", F.first(obs_d, ignorenulls=True).over(wnext))
    )
    interp = F.when(
        F.col("v").isNotNull(), F.col("v").cast("double")
    ).otherwise(
        F.col("pv").cast("double")
        + (F.col("nv") - F.col("pv")).cast("double")
        * (F.col("d") - F.col("pd")).cast("double")
        / (F.col("nd") - F.col("pd")).cast("double")
    )
    return b.where(
        F.col("pv").isNotNull() & F.col("nv").isNotNull()
    ).select(
        "user_id",
        "d",
        F.round(interp, 6).alias("value_cents"),
        F.col("v").isNotNull().alias("is_observed"),
    )


SQL_INTERP_LINEAR = """
WITH daily AS (
  SELECT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), span AS (
  SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(d0, d1)) AS d FROM span
), g AS (
  SELECT grid.user_id, grid.d, daily.v
  FROM grid LEFT JOIN daily
    ON grid.user_id = daily.user_id AND grid.d = daily.d
), b AS (
  SELECT user_id, d, v,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pd,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY d
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS nd
  FROM g
)
SELECT user_id, d,
       round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                  ELSE CAST(pv AS DOUBLE)
                       + CAST(nv - pv AS DOUBLE)
                         * CAST(d - pd AS DOUBLE)
                         / CAST(nd - pd AS DOUBLE)
             END, 6) AS value_cents,
       v IS NOT NULL AS is_observed
FROM b WHERE pv IS NOT NULL AND nv IS NOT NULL
"""


def q_streak_lengths(spark, sf_dir):
    """Per-user ACTIVITY STREAKS — longest run of consecutive active
    days, the number of distinct streaks, and the final streak's
    length (the 'current streak' as of the corpus horizon): the
    gamification/engagement feature, and the canonical
    GAPS-AND-ISLANDS identity-difference trick (d - row_number() is
    constant exactly within a run of consecutive days).

    One partition-local rank window on the per-(user, day) table,
    one island agg, one final rollup — all keyed on user_id. No
    self-joins, no sequences."""
    e = _t(spark, sf_dir, "events")
    days = (
        e.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "grp", F.col("d") - F.row_number().over(w)
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.max("d").cast("bigint").alias("end_d"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest"),
        F.max_by("len", "end_d").cast("bigint").alias("last_streak"),
        F.sum("len").cast("bigint").alias("active_days"),
    )


SQL_STREAK_LENGTHS = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events
), isl AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d)
           AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp,
         CAST(count(*) AS BIGINT) AS len,
         CAST(max(d) AS BIGINT) AS end_d
  FROM isl GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(max(len) AS BIGINT) AS longest,
       CAST(arg_max(len, end_d) AS BIGINT) AS last_streak,
       CAST(sum(len) AS BIGINT) AS active_days
FROM streaks GROUP BY 1
"""


_PATH_LEN = 4


def q_session_paths(spark, sf_dir):
    """TOP SESSION PATHS — the corpus-wide frequency table of each
    session's first four event types joined with '>' (the
    clickstream 'what do sessions look like' report; the path-shape
    complement to `session_funnel`'s fixed-pattern matching).

    Sessions come from the engine's gap sessionizer; the path
    assembles from an array_sort over (ts, event_id, type) structs
    (deterministic under concurrent timestamps), sliced to 4. One
    grouped path agg + a broadcast one-row total for the share."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = W.sessionize(ev, key="user_id", ts="ts", gap_seconds=SESSION_GAP_S)
    per = s.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x.getField("event_type"),
                ),
                1,
                _PATH_LEN,
            ),
        ).alias("path")
    )
    tot = per.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        per.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n_sessions",
            F.round(
                F.col("n_sessions").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("share"),
        )
    )


SQL_SESSION_PATHS = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_S} * 1000000
              OR lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - 1 AS BIGINT)
           AS session_id
  FROM flagged
), ranked AS (
  SELECT user_id, session_id, event_type,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rk
  FROM sess
), per AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY rk) AS path
  FROM ranked WHERE rk <= {_PATH_LEN}
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM per
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
       round(CAST(count(*) AS DOUBLE) / CAST(max(t.n_total) AS DOUBLE),
             6) AS share
FROM per CROSS JOIN tot t
GROUP BY 1
"""


def q_type_corr_matrix(spark, sf_dir):
    """Cross-series PEARSON CORRELATION MATRIX of daily event counts
    between every pair of event types (upper triangle, long-form) —
    'do purchases move with clicks day-to-day?'. The multi-series
    alignment pattern (inner-join two derived series on the day key)
    that `grouped_corr` (two columns of one row) and `autocorr_lag1`
    (one series vs its own lag) don't cover.

    Days observed by BOTH types pair via one equi join on (day);
    the five moment sums are exact BIGINTs and the correlation is
    the n*Sxy - Sx*Sy identity — the only float ops are one sqrt of
    a product of exactly-cast doubles and one division. Output is
    C(types, 2) rows."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.d") == F.col("b.d"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    ).select(
        F.col("a.event_type").alias("type_a"),
        F.col("b.event_type").alias("type_b"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("bigint")
    deny = (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("bigint")
    return (
        m.withColumn("denx", denx)
        .withColumn("deny", deny)
        .where(
            (F.col("n") >= 2)
            & (F.col("denx") > 0)
            & (F.col("deny") > 0)
        )
        .select(
            "type_a",
            "type_b",
            F.col("n").alias("n_days"),
            F.round(
                num.cast("double")
                / F.sqrt(
                    F.col("denx").cast("double")
                    * F.col("deny").cast("double")
                ),
                6,
            ).alias("corr"),
        )
    )


SQL_TYPE_CORR_MATRIX = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.c AS x, b.c AS y
  FROM daily a JOIN daily b
    ON a.d = b.d AND a.event_type < b.event_type
), m AS (
  SELECT type_a, type_b,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n AS n_days,
       round(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)),
             6) AS corr
FROM m
WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
"""


def q_semi_additive(spark, sf_dir):
    """MONTH-END BALANCE rollup — the SEMI-ADDITIVE measure pattern:
    each user's LAST event value in the month is their closing
    balance; balances sum across users (additive over entities) but
    never across time (a quarter's balance is the last month's, not
    the sum). The snapshot-fact aggregation every BI layer special-
    cases, built from one per-(user, month) last-row pick.

    The closing row comes from a deterministic (ts, event_id)-desc
    row_number per (user, month) — month key is year*100 + month
    (identical integer arithmetic both engines). Sums are exact
    cents."""
    e = _t(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        (
            F.year("ts").cast("bigint") * 100
            + F.month("ts").cast("bigint")
        ).alias("ym"),
        "ts",
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id", "ym").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    closing = (
        base.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("user_id", "ym", F.col("cents").alias("balance"))
    )
    return closing.groupBy("ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("balance").cast("bigint").alias("total_balance"),
        F.max("balance").cast("bigint").alias("max_balance"),
    )


SQL_SEMI_ADDITIVE = """
WITH base AS (
  SELECT user_id,
         CAST(CAST(year(ts) AS BIGINT) * 100
              + CAST(month(ts) AS BIGINT) AS BIGINT) AS ym,
         ts, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), closing AS (
  SELECT user_id, ym, cents AS balance
  FROM (SELECT user_id, ym, cents,
               row_number() OVER (PARTITION BY user_id, ym
                                  ORDER BY ts DESC, event_id DESC)
                 AS rk
        FROM base) t
  WHERE rk = 1
)
SELECT ym,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(balance) AS BIGINT) AS total_balance,
       CAST(max(balance) AS BIGINT) AS max_balance
FROM closing GROUP BY 1
"""


def q_time_to_convert(spark, sf_dir):
    """Per-user CLICK-TO-PURCHASE latency — within each gap-session,
    the microsecond gap from the session's first click to the first
    purchase at-or-after it; per user, the conversion count and the
    exact LOWER-MEDIAN gap in seconds. The time-dimension complement
    to `session_funnel`'s pattern matching and `attribution`'s
    credit assignment.

    Everything keys on (user, session): two conditional-min
    aggregates pick the click/purchase anchors, the median is a
    rank pick over the user's conversion gaps (bounded by sessions
    per user), and the only division is the exact µs → seconds
    integer div."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    s = W.sessionize(
        ev, key="user_id", ts="ts", gap_seconds=SESSION_GAP_S
    ).select(
        "user_id",
        "session_id",
        _us("ts").alias("us"),
        "event_type",
    )
    anchors = s.groupBy("user_id", "session_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("us"))
        ).alias("click_us")
    )
    conv = (
        s.join(anchors, ["user_id", "session_id"])
        .where(
            (F.col("event_type") == "purchase")
            & F.col("click_us").isNotNull()
            & (F.col("us") >= F.col("click_us"))
        )
        .groupBy("user_id", "session_id", "click_us")
        .agg(F.min("us").alias("purchase_us"))
        .select(
            "user_id",
            F.expr("(purchase_us - click_us) div 1000000")
            .cast("bigint")
            .alias("gap_s"),
        )
    )
    wrk = Window.partitionBy("user_id").orderBy("gap_s")
    wcnt = Window.partitionBy("user_id")
    ranked = conv.withColumn(
        "rk", F.row_number().over(wrk)
    ).withColumn("n_conv", F.count(F.lit(1)).over(wcnt))
    return ranked.where(
        F.col("rk") == F.expr("(n_conv + 1) div 2")
    ).select(
        "user_id",
        F.col("n_conv").cast("bigint").alias("n_conversions"),
        F.col("gap_s").alias("median_gap_s"),
    )


SQL_TIME_TO_CONVERT = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts)
                   > {SESSION_GAP_S} * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - 1 AS BIGINT)
           AS session_id
  FROM flagged
), anchors AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'click' THEN us END) AS click_us
  FROM sess GROUP BY 1, 2
), conv AS (
  SELECT s.user_id,
         CAST((min(s.us) - a.click_us) // 1000000 AS BIGINT) AS gap_s
  FROM sess s
  JOIN anchors a
    ON s.user_id = a.user_id AND s.session_id = a.session_id
  WHERE s.event_type = 'purchase' AND a.click_us IS NOT NULL
    AND s.us >= a.click_us
  GROUP BY s.user_id, s.session_id, a.click_us
), ranked AS (
  SELECT user_id, gap_s,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_s)
           AS rk,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
           AS n_conv
  FROM conv
)
SELECT user_id, n_conv AS n_conversions, gap_s AS median_gap_s
FROM ranked WHERE rk = (n_conv + 1) // 2
"""


def q_abandonment(spark, sf_dir):
    """Per-user SESSION ABANDONMENT — of the gap-sessions containing
    a click, the fraction with NO purchase at-or-after the first
    click: the conversion-funnel drop-off rate, exact-rational until
    one rounded division. The rate summary over the same
    (session, anchor) structure as `time_to_convert`.

    One sessionize pass, one per-session conditional agg, one
    per-user rollup — every shuffle keys on user_id."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    s = W.sessionize(
        ev, key="user_id", ts="ts", gap_seconds=SESSION_GAP_S
    ).select(
        "user_id", "session_id", _us("ts").alias("us"), "event_type"
    )
    per = s.groupBy("user_id", "session_id").agg(
        F.min(
            F.when(F.col("event_type") == "click", F.col("us"))
        ).alias("click_us"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).alias("last_purchase_us"),
    )
    flagged = per.where(F.col("click_us").isNotNull()).select(
        "user_id",
        (
            F.col("last_purchase_us").isNotNull()
            & (F.col("last_purchase_us") >= F.col("click_us"))
        )
        .cast("bigint")
        .alias("converted"),
    )
    agg = flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("click_sessions"),
        F.sum("converted").cast("bigint").alias("converted_sessions"),
    )
    return agg.select(
        "user_id",
        "click_sessions",
        "converted_sessions",
        F.round(
            (F.col("click_sessions") - F.col("converted_sessions"))
            .cast("double")
            / F.col("click_sessions").cast("double"),
            6,
        ).alias("abandonment_rate"),
    )


SQL_ABANDONMENT = f"""
WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts)
                   > {SESSION_GAP_S} * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) - 1 AS BIGINT)
           AS session_id
  FROM flagged
), per AS (
  SELECT user_id, session_id,
         min(CASE WHEN event_type = 'click' THEN us END) AS click_us,
         max(CASE WHEN event_type = 'purchase' THEN us END)
           AS last_purchase_us
  FROM sess GROUP BY 1, 2
), fl AS (
  SELECT user_id,
         CAST(last_purchase_us IS NOT NULL
              AND last_purchase_us >= click_us AS BIGINT) AS converted
  FROM per WHERE click_us IS NOT NULL
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS click_sessions,
       CAST(sum(converted) AS BIGINT) AS converted_sessions,
       round(CAST(count(*) - sum(converted) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS abandonment_rate
FROM fl GROUP BY 1
"""


def q_seasonal_naive_mae(spark, sf_dir):
    """Per-event-type SEASONAL-NAIVE forecast error — predict each
    day's count with the count 7 days earlier and report MAE and
    the mean-relative MAE: the standard forecastability floor every
    real model must beat (and a direct weekly-seasonality strength
    read — low relative MAE means lag-7 explains the series).

    The forecast alignment is one self-join of the per-(type, day)
    table on (type, d - 7); absolute errors and day sums are exact
    BIGINTs; two rounded divisions at the end."""
    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.d") == F.col("a.d") + 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("b.c").alias("actual"),
        F.col("a.c").alias("forecast"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        .cast("bigint")
        .alias("abs_err"),
        F.sum("actual").cast("bigint").alias("actual_sum"),
    )
    return agg.where(F.col("actual_sum") > 0).select(
        "event_type",
        "n_pairs",
        F.round(
            F.col("abs_err").cast("double")
            / F.col("n_pairs").cast("double"),
            6,
        ).alias("mae"),
        F.round(
            F.col("abs_err").cast("double")
            / F.col("actual_sum").cast("double"),
            6,
        ).alias("rel_mae"),
    )


SQL_SEASONAL_NAIVE_MAE = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(ts AS DATE)) AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, b.c AS actual, a.c AS forecast
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.d = a.d + 7
), agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(abs(actual - forecast)) AS BIGINT) AS abs_err,
         CAST(sum(actual) AS BIGINT) AS actual_sum
  FROM pairs GROUP BY 1
)
SELECT event_type, n_pairs,
       round(CAST(abs_err AS DOUBLE) / CAST(n_pairs AS DOUBLE),
             6) AS mae,
       round(CAST(abs_err AS DOUBLE) / CAST(actual_sum AS DOUBLE),
             6) AS rel_mae
FROM agg WHERE actual_sum > 0
"""


def q_gap_percentiles(spark, sf_dir):
    """Per-user EXACT p50/p90 of inter-event gaps (seconds) — the
    distributional cadence summary behind `gap_detection`'s
    threshold flags and `order_gap_cv`'s single dispersion number:
    p50 is typical rhythm, p90 the routine long pause, and their
    ratio a tail-heaviness read that needs no model.

    Gaps come from one lag window; both percentiles are exact
    LOWER-percentile rank picks ((n+1) div 2 and ceil(9n/10) —
    integer arithmetic both engines) over a per-user rank window,
    folded to one output row per user with conditional aggregates.
    No float percentile interpolation anywhere."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select(
            "user_id", _us("ts").alias("us"), "event_id"
        )
        .withColumn("prev_us", F.lag("us").over(wseq))
        .where(F.col("prev_us").isNotNull())
        .select(
            "user_id",
            F.expr("(us - prev_us) div 1000000")
            .cast("bigint")
            .alias("gap_s"),
        )
    )
    wrk = Window.partitionBy("user_id").orderBy("gap_s")
    wcnt = Window.partitionBy("user_id")
    ranked = gaps.withColumn(
        "rk", F.row_number().over(wrk)
    ).withColumn("n", F.count(F.lit(1)).over(wcnt))
    return (
        ranked.groupBy("user_id", "n")
        .agg(
            F.max(
                F.when(
                    F.col("rk") == F.expr("(n + 1) div 2"),
                    F.col("gap_s"),
                )
            )
            .cast("bigint")
            .alias("p50_gap_s"),
            F.max(
                F.when(
                    F.col("rk") == F.expr("(9 * n + 9) div 10"),
                    F.col("gap_s"),
                )
            )
            .cast("bigint")
            .alias("p90_gap_s"),
        )
        .select(
            "user_id",
            F.col("n").alias("n_gaps"),
            "p50_gap_s",
            "p90_gap_s",
        )
    )


SQL_GAP_PERCENTILES = """
WITH gaps AS (
  SELECT user_id,
         CAST((epoch_us(ts)
               - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts),
                                                  event_id))
              // 1000000 AS BIGINT) AS gap_s
  FROM events
), ranked AS (
  SELECT user_id, gap_s,
         row_number() OVER (PARTITION BY user_id ORDER BY gap_s)
           AS rk,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n
  FROM gaps WHERE gap_s IS NOT NULL
)
SELECT user_id, n AS n_gaps,
       CAST(max(CASE WHEN rk = (n + 1) // 2 THEN gap_s END)
            AS BIGINT) AS p50_gap_s,
       CAST(max(CASE WHEN rk = (9 * n + 9) // 10 THEN gap_s END)
            AS BIGINT) AS p90_gap_s
FROM ranked GROUP BY 1, 2
"""


_RBO_K = 20
_RBO_P = 0.9


def q_rbo_overlap(spark, sf_dir):
    """Per-source RANK-BIASED OVERLAP (Webber et al. 2010) between
    the source's top-20 tokens and the corpus top-20 — the
    top-weighted list-similarity measure that `topk_overlap`'s plain
    set intersection ignores rank for: agreement at depth 1 counts
    ~10x more than at depth 20 with p = 0.9.

    RBO@K = (1-p) * sum_d p^(d-1) * |A_d ∩ B_d| / d decomposes per
    MATCHED token into sum_{d >= max(r_A, r_B)} p^(d-1)/d, so the
    whole statistic is one join of the two top-K lists plus a range
    join against a 20-row depth table — every term ppb-fixed before
    the sum. The corpus list is a global top-K (TakeOrderedAndProject
    over the grouped vocab — no global window); the source lists are
    one partition-local rank window."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    ).where(F.col("token") != "")
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_s")
    )
    tot = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all")
    )
    wsrc = Window.partitionBy("source").orderBy(
        F.col("c_s").desc(), F.col("token")
    )
    src_top = st.withColumn("rs", F.row_number().over(wsrc)).where(
        F.col("rs") <= _RBO_K
    )
    cor_top = (
        tot.orderBy(F.col("c_all").desc(), F.col("token"))
        .limit(_RBO_K)
        .withColumn(
            "rc",
            F.row_number().over(
                Window.orderBy(F.col("c_all").desc(), F.col("token"))
            ),
        )
    )
    matches = src_top.join(F.broadcast(cor_top), "token").select(
        "source",
        F.greatest(F.col("rs"), F.col("rc")).alias("m"),
    )
    depths = spark.range(1, _RBO_K + 1).select(
        F.col("id").cast("bigint").alias("dep")
    )
    terms = matches.join(
        F.broadcast(depths), F.col("dep") >= F.col("m")
    ).select(
        "source",
        F.expr(
            f"CAST(round(1e9 * pow({_RBO_P}, dep - 1)"
            " / CAST(dep AS DOUBLE)) AS BIGINT)"
        ).alias("term_ppb"),
    )
    agg = terms.groupBy("source").agg(
        F.sum("term_ppb").cast("bigint").alias("sum_ppb"),
    )
    n_match = matches.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("overlap_k")
    )
    return agg.join(n_match, "source").select(
        "source",
        F.lit(_RBO_K).cast("bigint").alias("k"),
        "overlap_k",
        F.round(
            F.lit(1.0 - _RBO_P)
            * F.col("sum_ppb").cast("double")
            / F.lit(1e9),
            6,
        ).alias("rbo"),
    )


SQL_RBO_OVERLAP = f"""
WITH tok AS (
  SELECT source, t.token
  FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\\s+'))
         AS t(token)
  WHERE t.token <> ''
), st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c_s
  FROM tok GROUP BY 1, 2
), tot AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c_all
  FROM tok GROUP BY 1
), src_top AS (
  SELECT source, token, rs
  FROM (SELECT source, token,
               row_number() OVER (PARTITION BY source
                                  ORDER BY c_s DESC, token) AS rs
        FROM st) t
  WHERE rs <= {_RBO_K}
), cor_top AS (
  SELECT token, rc
  FROM (SELECT token,
               row_number() OVER (ORDER BY c_all DESC, token) AS rc
        FROM tot) t
  WHERE rc <= {_RBO_K}
), matches AS (
  SELECT s.source, greatest(s.rs, c.rc) AS m
  FROM src_top s JOIN cor_top c ON s.token = c.token
), depths AS (
  SELECT CAST(unnest(generate_series(1, {_RBO_K})) AS BIGINT) AS dep
), terms AS (
  SELECT m.source,
         CAST(round(1e9 * pow({_RBO_P}, d.dep - 1)
                    / CAST(d.dep AS DOUBLE)) AS BIGINT) AS term_ppb
  FROM matches m JOIN depths d ON d.dep >= m.m
), agg AS (
  SELECT source, CAST(sum(term_ppb) AS BIGINT) AS sum_ppb
  FROM terms GROUP BY 1
), nm AS (
  SELECT source, CAST(count(*) AS BIGINT) AS overlap_k
  FROM matches GROUP BY 1
)
SELECT a.source, CAST({_RBO_K} AS BIGINT) AS k, nm.overlap_k,
       round({1.0 - _RBO_P} * CAST(a.sum_ppb AS DOUBLE) / 1e9,
             6) AS rbo
FROM agg a JOIN nm ON a.source = nm.source
"""


def q_weighted_jaccard(spark, sf_dir):
    """Per-source WEIGHTED JACCARD similarity between the source's
    token distribution and the REST of the corpus — sum min(p, q) /
    sum max(p, q), the frequency-aware overlap that plain set
    Jaccard (`source_vocab_jaccard`) flattens to presence bits.

    FULLY EXACT: with the common denominator n_s * n_r, min(p, q)
    per token is min(c_s*n_r, c_r*n_s) — a BIGINT comparison, no
    floats — and the never-seen corpus tokens add (n_r - cr_seen) *
    n_s to the max side in closed form (their min side is 0), the
    same complement identity as tvd_drift/jsd_drift. ONE double
    division total."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), "\\s+")).alias("token"),
    ).where(F.col("token") != "")
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_s")
    )
    tot = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all")
    )
    n_s = st.groupBy("source").agg(F.sum("c_s").alias("n_s"))
    n_all = tot.agg(F.sum("c_all").alias("n_all"))
    j = (
        st.join(tot, "token")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(n_all))
        .select(
            "source",
            "n_s",
            (F.col("n_all") - F.col("n_s")).alias("n_r"),
            (F.col("c_s") * (F.col("n_all") - F.col("n_s"))).alias(
                "ps"
            ),
            ((F.col("c_all") - F.col("c_s")) * F.col("n_s")).alias(
                "qs"
            ),
            (F.col("c_all") - F.col("c_s")).alias("c_r"),
        )
    )
    per = j.groupBy("source", "n_s", "n_r").agg(
        F.sum(F.least(F.col("ps"), F.col("qs")))
        .cast("bigint")
        .alias("min_seen"),
        F.sum(F.greatest(F.col("ps"), F.col("qs")))
        .cast("bigint")
        .alias("max_seen"),
        F.sum("c_r").cast("bigint").alias("cr_seen"),
    )
    max_total = F.col("max_seen") + (
        F.col("n_r") - F.col("cr_seen")
    ) * F.col("n_s")
    return per.where(F.col("n_r") > 0).select(
        "source",
        "n_s",
        F.round(
            F.col("min_seen").cast("double") / max_total.cast("double"),
            6,
        ).alias("weighted_jaccard"),
    )


SQL_WEIGHTED_JACCARD = """
WITH tok AS (
  SELECT source, t.token
  FROM documents,
       LATERAL unnest(string_split_regex(trim(text), '\\s+'))
         AS t(token)
  WHERE t.token <> ''
), st AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c_s
  FROM tok GROUP BY 1, 2
), tot AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c_all
  FROM tok GROUP BY 1
), ns AS (
  SELECT source, CAST(sum(c_s) AS BIGINT) AS n_s FROM st GROUP BY 1
), na AS (
  SELECT CAST(sum(c_all) AS BIGINT) AS n_all FROM tot
), j AS (
  SELECT st.source, ns.n_s, na.n_all - ns.n_s AS n_r,
         st.c_s * (na.n_all - ns.n_s) AS ps,
         (tot.c_all - st.c_s) * ns.n_s AS qs,
         tot.c_all - st.c_s AS c_r
  FROM st
  JOIN tot ON st.token = tot.token
  JOIN ns ON st.source = ns.source
  CROSS JOIN na
), per AS (
  SELECT source, n_s, n_r,
         CAST(sum(least(ps, qs)) AS BIGINT) AS min_seen,
         CAST(sum(greatest(ps, qs)) AS BIGINT) AS max_seen,
         CAST(sum(c_r) AS BIGINT) AS cr_seen
  FROM j GROUP BY 1, 2, 3
)
SELECT source, n_s,
       round(CAST(min_seen AS DOUBLE)
             / CAST(max_seen + (n_r - cr_seen) * n_s AS DOUBLE),
             6) AS weighted_jaccard
FROM per WHERE n_r > 0
"""


def q_burstiness_gb(spark, sf_dir):
    """Per-user GOH-BARABASI burstiness of inter-event gaps —
    B = (sigma - mu)/(sigma + mu) over the gap-seconds series: -1
    for a metronome, 0 for Poisson, toward +1 for heavy-tailed
    bursts. The normalized one-number cadence next to
    `gap_percentiles`' quantiles and `order_gap_cv`'s order-stream
    CV (B is bounded, CV is not).

    Gaps from one lag window; moments exact BIGINTs; sigma/mu and B
    are one fixed double expression (sample std)."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select("user_id", _us("ts").alias("us"), "event_id")
        .withColumn("prev_us", F.lag("us").over(wseq))
        .where(F.col("prev_us").isNotNull())
        .select(
            "user_id",
            F.expr("(us - prev_us) div 1000000")
            .cast("bigint")
            .alias("g"),
        )
    )
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum(F.col("g") * F.col("g")).cast("bigint").alias("s2"),
    ).withColumn(
        "varn",
        (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
            "bigint"
        ),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        F.col("varn").cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    return m.where(
        (F.col("n") >= 2) & (F.col("s") > 0) & (F.col("varn") >= 0)
    ).select(
        "user_id",
        F.col("n").alias("n_gaps"),
        F.round(mu, 6).alias("mean_gap_s"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )


SQL_BURSTINESS_GB = """
WITH gaps AS (
  SELECT user_id,
         CAST((epoch_us(ts)
               - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                         ORDER BY epoch_us(ts),
                                                  event_id))
              // 1000000 AS BIGINT) AS g
  FROM events
), m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS s,
         CAST(sum(g * g) AS BIGINT) AS s2
  FROM gaps WHERE g IS NOT NULL GROUP BY 1
), k AS (
  SELECT user_id, n, s,
         CAST(n * s2 - s * s AS BIGINT) AS varn
  FROM m
)
SELECT user_id, n AS n_gaps,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_s,
       round((sqrt(CAST(varn AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE))
              - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / (sqrt(CAST(varn AS DOUBLE)
                     / CAST(n * (n - 1) AS DOUBLE))
                + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)),
             6) AS burstiness
FROM k WHERE n >= 2 AND s > 0 AND varn >= 0
"""


def q_lorenz_curve(spark, sf_dir):
    """LORENZ CURVE of event concentration over users, decile
    long-form — users ranked by activity, cut into 10 exact global
    deciles, each reporting its user count, event share, and the
    cumulative share (the curve `gini_skew` integrates to one
    number). The '10% of users produce X% of traffic' table.

    The global ranking runs through ``windows.global_row_number``
    (range repartition + broadcast prefix offsets — no
    single-partition window over users); deciles are integer rank
    arithmetic; the cumulative window runs over exactly 10 rows."""
    e = _t(spark, sf_dir, "events")
    per = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ranked = W.global_row_number(
        per, [F.col("c").asc(), F.col("user_id").asc()], "rk"
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
    )
    dec = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(
            "decile",
            F.expr("((rk - 1) * 10) div n_users + 1").cast("bigint"),
        )
        .groupBy("decile", "n_users", "n_events")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users_d"),
            F.sum("c").cast("bigint").alias("events_d"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dec.select(
        "decile",
        "n_users_d",
        "events_d",
        F.round(
            F.col("events_d").cast("double")
            / F.col("n_events").cast("double"),
            6,
        ).alias("share"),
        F.round(
            F.sum("events_d").over(wcum).cast("double")
            / F.col("n_events").cast("double"),
            6,
        ).alias("cum_share"),
    )


SQL_LORENZ_CURVE = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
), ranked AS (
  SELECT user_id, c,
         CAST(row_number() OVER (ORDER BY c, user_id) AS BIGINT)
           AS rk
  FROM per
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS n_events
  FROM per
), dec AS (
  SELECT ((rk - 1) * 10) // t.n_users + 1 AS decile,
         t.n_users, t.n_events,
         CAST(count(*) AS BIGINT) AS n_users_d,
         CAST(sum(c) AS BIGINT) AS events_d
  FROM ranked CROSS JOIN tot t
  GROUP BY 1, 2, 3
)
SELECT CAST(decile AS BIGINT) AS decile, n_users_d, events_d,
       round(CAST(events_d AS DOUBLE) / CAST(n_events AS DOUBLE),
             6) AS share,
       round(CAST(sum(events_d) OVER (ORDER BY decile
                                      ROWS BETWEEN UNBOUNDED
                                      PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
             / CAST(n_events AS DOUBLE), 6) AS cum_share
FROM dec
"""


_FIRSTK = 10


def q_first_k_profile(spark, sf_dir):
    """Per-user COLD-START profile over the FIRST 10 events — event
    count (<= 10), distinct types, click share, total value in
    cents, and the span in seconds: the features a ranking model has
    at onboarding time, computed leakage-free by construction (only
    the first K rows per user ever aggregate).

    One partition-local rank window, one conditional hash agg —
    both keyed on user_id."""
    e = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("us", "event_id")
    head = (
        e.select(
            "user_id",
            _us("ts").alias("us"),
            "event_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .withColumn("rk", F.row_number().over(wseq))
        .where(F.col("rk") <= _FIRSTK)
    )
    return head.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.count_distinct("event_type").cast("bigint").alias("n_types"),
        F.sum((F.col("event_type") == "click").cast("bigint"))
        .cast("bigint")
        .alias("n_clicks"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.expr("(max(us) - min(us)) div 1000000")
        .cast("bigint")
        .alias("span_s"),
    )


SQL_FIRST_K_PROFILE = f"""
WITH head AS (
  SELECT user_id, epoch_us(ts) AS us, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM (SELECT *,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id)
                 AS rk
        FROM events) t
  WHERE rk <= {_FIRSTK}
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clicks,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS span_s
FROM head GROUP BY 1
"""


def q_dwell_share(spark, sf_dir):
    """DWELL-TIME SHARE per event type — each event 'holds' until
    the user's next event (the same left-closed intervals as
    `time_weighted_avg`), and the holding time attributes to the
    CURRENT event's type: 'where does user time actually go?',
    which raw event counts misstate badly when types differ in
    dwell.

    One lead window per user, one global per-type agg, a broadcast
    one-row total; all sums exact millisecond BIGINTs with one
    rounded division per type."""
    e = _t(spark, sf_dir, "events")
    iv = (
        e.select(
            "user_id",
            _us("ts").alias("us"),
            "event_id",
            "event_type",
        )
        .withColumn(
            "next_us",
            F.lead("us").over(
                Window.partitionBy("user_id").orderBy("us", "event_id")
            ),
        )
        .where(F.col("next_us").isNotNull())
        .select(
            "event_type",
            F.expr("(next_us - us) div 1000").alias("w_ms"),
        )
    )
    per = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("w_ms").cast("bigint").alias("dwell_ms"),
    )
    tot = per.agg(F.sum("dwell_ms").cast("bigint").alias("total_ms"))
    return per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_intervals",
        "dwell_ms",
        F.round(
            F.col("dwell_ms").cast("double")
            / F.col("total_ms").cast("double"),
            6,
        ).alias("dwell_share"),
    )
