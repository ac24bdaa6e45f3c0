"""Text-analysis operators for a training-data pipeline over `documents`:
token stats, quality scoring, language-ID heuristic, fingerprinting, and
token-n-gram Jaccard near-dup pairs — all SQL-expressible with DuckDB oracles.

Cross-engine determinism: only functions with identical semantics in Spark
and DuckDB are used (split-on-space, replace, regexp_replace on fixed
classes, sha256, floor); ratios rounded to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load_table


def _round4(x):
    """Explicit half-up 4-decimal rounding: floor(x*10000 + 0.5)/10000.

    Engine-neutral: Spark's round() is HALF_UP while DuckDB's is HALF_EVEN,
    which diverges on exact ties (e.g. ratios like 1/32 = 0.03125); floor has
    no tie rule, and the IEEE double arithmetic feeding it is bit-identical
    in both engines for the same expression shape.
    """
    return F.floor(x * 10000 + F.lit(0.5)) / 10000


_ROUND4_SQL = "floor(({x}) * 10000 + 0.5) / 10000"


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenization) — SURVEY.md training-data op."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("token_cnt"),
        F.size(F.array_distinct(toks)).alias("distinct_token_cnt"),
        F.length("text").alias("char_cnt"),
    )


DOC_TOKEN_STATS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS token_cnt,
       len(list_distinct(string_split(text, ' '))) AS distinct_token_cnt,
       length(text) AS char_cnt
FROM documents
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: lexical diversity + alpha ratio + stopword signal."""
    docs = load_table(spark, sf_dir, "documents")
    # r6: a single-row-group documents file scans as ONE partition and the
    # three regexp passes are CPU-bound per row — spread them when the scan
    # is under-split (no-op on well-partitioned inputs; guide §2.5/§6)
    from ..stages.minhash_lsh import ensure_parallelism

    docs = ensure_parallelism(
        docs, int(spark.conf.get("spark.sql.shuffle.partitions"))
    )
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    alpha_cnt = F.length(F.regexp_replace(F.col("text"), "[^a-z]", ""))
    the_cnt = (
        (F.length("text") - F.length(F.regexp_replace(F.col("text"), "the", "")))
        / F.lit(3)
    ).cast("int")
    diversity = _round4(n_dis.cast("double") / n_tok)
    alpha_ratio = _round4(alpha_cnt.cast("double") / F.length("text"))
    return docs.select(
        "doc_id",
        diversity.alias("diversity"),
        alpha_ratio.alias("alpha_ratio"),
        the_cnt.alias("stopword_cnt"),
        _round4(0.5 * diversity + 0.5 * alpha_ratio).alias("quality_score"),
    )


_DIV_RAW = ("cast(len(list_distinct(string_split(text, ' '))) as double)"
            " / len(string_split(text, ' '))")
_ALPHA_RAW = ("cast(length(regexp_replace(text, '[^a-z]', '', 'g')) as double)"
              " / length(text)")
_DIV4 = _ROUND4_SQL.format(x=_DIV_RAW)
_ALPHA4 = _ROUND4_SQL.format(x=_ALPHA_RAW)

DOC_QUALITY_SQL = f"""
SELECT doc_id,
       {_DIV4} AS diversity,
       {_ALPHA4} AS alpha_ratio,
       cast((length(text) - length(regexp_replace(text, 'the', '', 'g'))) / 3
            AS int) AS stopword_cnt,
       {_ROUND4_SQL.format(x=f"0.5 * ({_DIV4}) + 0.5 * ({_ALPHA4})")} AS quality_score
FROM documents
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID (n-gram-heuristic stand-in): deterministic
    argmax over per-language marker counts with fixed precedence."""
    docs = load_table(spark, sf_dir, "documents")

    def cnt(marker: str):
        return (
            (F.length("text")
             - F.length(F.regexp_replace(F.col("text"), marker, "")))
            / F.lit(len(marker))
        ).cast("int")

    c_en, c_es, c_zh = cnt(" the "), cnt(" el "), cnt(" zh ")
    pred = (
        F.when((c_en >= c_es) & (c_en >= c_zh), "en")
        .when(c_es >= c_zh, "es")
        .otherwise("zh")
    )
    return docs.select(
        "doc_id", c_en.alias("c_en"), c_es.alias("c_es"), pred.alias("pred_lang")
    )


LANG_ID_SQL = """
SELECT doc_id,
       cast((length(text) - length(regexp_replace(text, ' the ', '', 'g'))) / 5 AS int) AS c_en,
       cast((length(text) - length(regexp_replace(text, ' el ', '', 'g'))) / 4 AS int) AS c_es,
       CASE
         WHEN cast((length(text) - length(regexp_replace(text, ' the ', '', 'g'))) / 5 AS int)
              >= cast((length(text) - length(regexp_replace(text, ' el ', '', 'g'))) / 4 AS int)
          AND cast((length(text) - length(regexp_replace(text, ' the ', '', 'g'))) / 5 AS int)
              >= cast((length(text) - length(regexp_replace(text, ' zh ', '', 'g'))) / 4 AS int)
         THEN 'en'
         WHEN cast((length(text) - length(regexp_replace(text, ' el ', '', 'g'))) / 4 AS int)
              >= cast((length(text) - length(regexp_replace(text, ' zh ', '', 'g'))) / 4 AS int)
         THEN 'es'
         ELSE 'zh'
       END AS pred_lang
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content-hash prefix + length bucket."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.substring(F.sha2(F.col("text"), 256), 1, 16).alias("fp"),
        F.floor(F.col("n_chars") / 100.0).cast("int").alias("len_bucket"),
    )


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       substr(sha256(text), 1, 16) AS fp,
       cast(floor(n_chars / 100.0) AS int) AS len_bucket
FROM documents
"""


# Document-frequency cap on grams entering the self-join: a gram shared by
# more than this many docs is boilerplate (a "stop-gram") and would emit
# O(df^2) join rows. Dropping it bounds per-gram output at C(cap, 2) pairs.
# Denominators (na/nb) stay the FULL distinct-gram counts, so the reported
# jacc is a lower bound of true Jaccard — pairs whose overlap is entirely
# boilerplate fall below the 0.15 threshold by design. Mirrored verbatim in
# the DuckDB oracle so the value-hash gate still agrees.
_NGRAM_DF_CAP = 64


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-3-gram Jaccard near-dup pairs (>= 0.15) — the SQL-expressible
    oracle twin of the MinHash/LSH channel (which estimates exactly this)."""
    docs = load_table(spark, sf_dir, "documents")
    # the gram build (transform + array_distinct over every token window) is
    # the CPU-heavy part and must NOT run on however few partitions the scan
    # produced (a small parquet file scans as ONE partition -> one core).
    # Shuffling the raw text first is cheap; at real scale the scan is
    # already wide and this coalesces nothing.
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if docs.rdd.getNumPartitions() < n_parts:
        docs = docs.repartition(n_parts)
    toks = F.split(F.col("text"), " ")
    grams_expr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
                F.element_at(toks, i + 3),
            ),
        )
    )
    g = (
        docs.where(F.size(toks) >= 3)
        .select("doc_id", grams_expr.alias("grams"))
        .select("doc_id", "grams", F.size("grams").alias("n_grams"))
    )
    ex = g.select("doc_id", "n_grams", F.explode("grams").alias("gram"))
    # ONE explicit hash shuffle of the exploded gram rows; the DF
    # aggregation (groupBy on the same key), the hot-gram anti-join
    # (broadcast -> map-side), and the self-join below all reuse this
    # partitioning — no second exchange of the gram strings. The explicit
    # partition count also stops AQE coalescing the self-join whose OUTPUT
    # explodes quadratically in bucket size: partition for the output.
    n_parts = int(ex.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ex = ex.repartition(n_parts, "gram").persist()
    # hot-gram cap: drop grams present in > _NGRAM_DF_CAP docs before the
    # self-join (grams are distinct per doc, so count == doc frequency).
    # Hot grams are few by construction (<= total_gram_rows / cap), so the
    # anti-join side broadcasts.
    hot = (
        ex.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > _NGRAM_DF_CAP)
        .select("gram")
    )
    ex = ex.join(F.broadcast(hot), "gram", "left_anti")
    a = ex.select(
        F.col("doc_id").alias("src"), F.col("n_grams").alias("na"), "gram"
    )
    b = ex.select(
        F.col("doc_id").alias("dst"), F.col("n_grams").alias("nb"), "gram"
    )
    pairs = (
        a.join(b, "gram")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = _round4(
        F.col("shared").cast("double")
        / (F.col("na") + F.col("nb") - F.col("shared"))
    )
    return (
        pairs.withColumn("jacc", jacc)
        .where(F.col("jacc") >= 0.15)
        .select("src", "dst", "jacc")
    )


NGRAM_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                        for i in range(1, len(t) - 1)]) AS g
  FROM toks WHERE len(t) >= 3
),
counted AS (SELECT doc_id, g, len(g) AS n_grams FROM grams),
ex_all AS (SELECT doc_id, n_grams, unnest(g) AS gram FROM counted),
cool AS (
  SELECT gram FROM ex_all GROUP BY gram HAVING count(*) <= {_NGRAM_DF_CAP}
),
ex AS (SELECT ex_all.* FROM ex_all JOIN cool USING (gram)),
pairs AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, a.n_grams AS na, b.n_grams AS nb,
         count(*) AS shared
  FROM ex a JOIN ex b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT src, dst,
       floor((cast(shared as double) / (na + nb - shared)) * 10000 + 0.5) / 10000 AS jacc
FROM pairs
WHERE floor((cast(shared as double) / (na + nb - shared)) * 10000 + 0.5) / 10000 >= 0.15
"""


def doc_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length z-scores (grouped-map UDF surface, SURVEY.md
    section 2.2 UDF row) — the oracle is the equivalent window aggregation,
    proving the grouped-map path agrees with native SQL.

    Scale shape (VERDICT r4): the per-lang moments come from a map-side
    partial `groupBy().agg()` whose output is one row per language,
    broadcast back onto the rows — never a whole language in one executor
    (the previous groupBy(lang).applyInPandas materialized one pandas frame
    per language; at 10^12 files one language is most of the corpus). The
    applyInPandas demonstration now runs the per-row arithmetic grouped on
    a SALTED key, so every group is ~one shuffle partition regardless of
    language skew — bounded by the same knob that bounds every other
    partition in the job."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    stats = docs.groupBy("lang").agg(
        F.avg("n_chars").alias("mu"),
        F.stddev_samp("n_chars").alias("sd"),
    )
    joined = docs.join(F.broadcast(stats), "lang")
    n_groups = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _z(pdf):
        import numpy as np

        n = pdf.n_chars.to_numpy(dtype="float64")
        mu = pdf.mu.to_numpy(dtype="float64")
        sd = pdf.sd.to_numpy(dtype="float64")
        # degenerate languages (one row -> sd NULL/NaN, constant -> sd 0)
        # must yield NULL exactly like the oracle's stddev_samp CASE
        ok = np.isfinite(sd) & (sd > 0)
        z = np.where(ok, (n - mu) / np.where(ok, sd, 1.0), np.nan)
        return pdf[["doc_id", "lang"]].assign(
            zscore=np.floor(z * 10000 + 0.5) / 10000
        )

    return (
        joined.withColumn("_g", F.pmod(F.xxhash64("doc_id"), F.lit(n_groups)))
        .groupBy("_g")
        .applyInPandas(_z, "doc_id long, lang string, zscore double")
    )


DOC_ZSCORE_SQL = """
SELECT doc_id, lang,
       CASE WHEN coalesce(stddev_samp(n_chars) OVER (PARTITION BY lang), 0) = 0
            THEN NULL
            ELSE floor(((n_chars - avg(n_chars) OVER (PARTITION BY lang))
                        / stddev_samp(n_chars) OVER (PARTITION BY lang))
                       * 10000 + 0.5) / 10000
       END AS zscore
FROM documents
"""


def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters (Rae et al. 2021,
    'Scaling Language Models' App. A1.1): the fraction of a doc's tokens /
    token-2-grams / token-3-grams that are repeats. Training pipelines drop
    docs above thresholds (e.g. dup 2-gram frac > 0.2) — loops, boilerplate
    menus, and degenerate generations all light these up.

    Whole-stage-codegen only: the n-grams are built with array expressions
    (sequence/transform/element_at), never exploded, so each doc's signals
    compute inside one projection — no shuffle, no Python. Per-doc arrays
    are doc-length-bounded, the same envelope every other text op assumes.
    Docs with < 3 tokens carry no usable signal and are excluded (mirrored
    in the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n = F.size(t)

    def grams(t, n, k: int):
        # positions 1 .. n-k+1; guarded so sequence() never sees start>stop
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def dup_frac(g):
        return _round4(1 - F.size(F.array_distinct(g)) / F.size(g))

    base = docs.select("doc_id", t.alias("t")).withColumn("n", F.size("t"))
    return (
        base.filter(F.col("n") >= 3)
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            dup_frac(F.col("t")).alias("dup_token_frac"),
            dup_frac(grams(F.col("t"), F.col("n"), 2)).alias("dup_2gram_frac"),
            dup_frac(grams(F.col("t"), F.col("n"), 3)).alias("dup_3gram_frac"),
        )
    )


def _grams_sql(k: int) -> str:
    parts = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len(t) >= {k} THEN "
        f"list_transform(range(1, len(t) - {k - 2}), i -> {parts}) "
        "ELSE []::VARCHAR[] END"
    )


def _dup_frac_sql(g: str) -> str:
    return _ROUND4_SQL.format(
        x=f"1 - len(list_distinct({g})) / len({g})"
    )


DOC_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id,
       cast(len(t) AS int) AS n_tokens,
       {_dup_frac_sql('t')} AS dup_token_frac,
       {_dup_frac_sql(_grams_sql(2))} AS dup_2gram_frac,
       {_dup_frac_sql(_grams_sql(3))} AS dup_3gram_frac
FROM toks
WHERE len(t) >= 3
"""


# vocabulary heavy-hitters: K large enough to be a real vocab slice, small
# enough that TakeOrderedAndProject keeps the merge driver-trivial
_VOCAB_K = 100


def token_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token heavy-hitters (vocabulary building / stop-list
    mining): top-K tokens by total occurrence count, ties broken by token.

    The classic wordcount shape Spark executes optimally at 100 TB:
    map-side partial counts collapse each task's tokens before the single
    hash exchange, and the ordered limit runs as TakeOrderedAndProject —
    per-partition top-K then a K-row driver merge, never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    ).alias("token")
    return (
        docs.select(tok)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(_VOCAB_K)
    )


TOKEN_VOCAB_SQL = f"""
SELECT token, count(*) AS cnt
FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {_VOCAB_K}
"""


QUERIES = {
    "doc_token_stats": (doc_token_stats, DOC_TOKEN_STATS_SQL),
    "doc_repetition_signals": (doc_repetition_signals, DOC_REPETITION_SQL),
    "token_vocab_topk": (token_vocab_topk, TOKEN_VOCAB_SQL),
    "doc_zscore_by_lang": (doc_zscore_by_lang, DOC_ZSCORE_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "ngram_jaccard_pairs": (ngram_jaccard_pairs, NGRAM_JACCARD_SQL),
}
