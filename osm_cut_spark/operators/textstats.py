"""Text-analysis operators for training-data pipelines (all JVM built-ins).

Language-ID (character n-gram heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + BPE-ish regex
split), and rolling-hash document fingerprinting.  Outputs favor integer /
exactly-reproducible arithmetic so the DuckDB oracle can replay them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,it,that,for,on,as,with,at,by,from,this,be"
).split(",")

# BPE-ish pretokenizer: words, numbers, or single non-space symbols
BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_distinct_tokens, n_bpe_tokens).

    Staged projection: the split+filter HOF runs interpreted (no codegen
    subexpression elimination), so it is named ONCE and the counts read
    the alias instead of re-splitting the text per output column."""
    from osm_cut_spark.session import spread_scan

    docs = spread_scan(docs, id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    return docs.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        toks.alias("_toks"),
    ).select(
        F.col(id_col),
        "n_chars",
        F.size("_toks").alias("n_ws_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct_tokens"),
        "n_bpe_tokens",
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + a 0..100 integer score.

    Features: stopword hits (English stopword list), alpha fraction,
    mean word length band, repetition (distinct/total).  Integer score so
    cross-engine comparison is exact.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    # staged: the split/filter HOFs run interpreted (no subexpression
    # elimination) — name them once, derive every count from the aliases
    staged = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")).alias("_n_alpha"),
        F.length(text_col).alias("_n_chars"),
    ).select(
        F.col(id_col),
        F.size("_toks").alias("_n"),
        F.size(
            F.filter(F.col("_toks"), lambda t: F.array_contains(stop_arr, t))
        ).alias("_n_stop"),
        F.size(F.array_distinct("_toks")).alias("_n_distinct"),
        "_n_alpha",
        "_n_chars",
    )
    n, n_stop = F.col("_n"), F.col("_n_stop")
    n_alpha, n_chars = F.col("_n_alpha"), F.col("_n_chars")
    # floor() (not cast) so the DuckDB oracle can replay the rounding exactly
    score = F.floor(
        F.least(n, F.lit(200)) / 4  # length credit up to 50
        + F.when(n > 0, (n_stop * 100) / n).otherwise(0) / 4  # stopword credit up to 25
        + F.when(n_chars > 0, (n_alpha * 25) / n_chars).otherwise(0)  # alpha credit up to 25
    ).cast("int")
    return staged.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_alpha.alias("n_alpha_chars"),
        F.col("_n_distinct").alias("n_distinct"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Character-class language family heuristic (deterministic).

    Counts characters per script class and labels latin/cjk/cyrillic/other
    by majority — integer comparisons only, replayable in ANSI SQL.
    """
    n_latin = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    n_cyr = F.length(F.regexp_replace(F.col(text_col), r"[^Ѐ-ӿ]", ""))
    n_cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    label = (
        F.when((n_latin >= n_cyr) & (n_latin >= n_cjk) & (n_latin > 0), "latin")
        .when((n_cyr > n_latin) & (n_cyr >= n_cjk), "cyrillic")
        .when(n_cjk > 0, "cjk")
        .otherwise("unknown")
    )
    return docs.select(
        F.col(id_col),
        n_latin.alias("n_latin"),
        n_cyr.alias("n_cyrillic"),
        n_cjk.alias("n_cjk"),
        label.alias("lang_family"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 50, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary head: top-k tokens by total term frequency with
    document frequency — the vocab/IDF table every tokenizer build and
    stopword analysis starts from.  (token, tf, df), ties at the cut
    broken by token so the selection is deterministic.

    Plan: one explode + one groupBy(token) with partial (map-side)
    aggregation; df is count(DISTINCT doc) inside the same aggregate.
    The top-k is a TakeOrdered — no global sort materialization.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return (
        docs.select(F.col(id_col).alias("_doc"), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("_doc").alias("df"),
        )
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition/quality signals, entirely shuffle-free.

    Per document: token count, the most-frequent word's count and
    fraction, the longest consecutive same-word run, and the duplicate
    2-/3-gram fractions (1 - distinct/total) — the standard repetition
    filters a pretraining cleanup pass applies before dedup (high
    duplicate-n-gram fraction = boilerplate/spam; long word runs =
    degenerate generation or markup residue).

    100 TB plan shape: every signal is a per-row JVM higher-order fold
    (``aggregate`` over the sorted token array for the top-word count,
    over the raw array for the run length; ``zip_with`` shifted slices
    for the n-grams) — NO explode, no Python; the whole operator is one
    narrow projection, so it composes with any scan at any scale.  The
    only possible shuffle is ``spread_scan``'s read-side repartition when
    the SOURCE is underpartitioned (tiny/unsplittable files); a
    well-partitioned scan keeps the shuffle-free plan.  Fractions keep
    the exact integer-subtraction-then-divide shape so the DuckDB oracle
    replays them bit-for-bit.
    """
    from osm_cut_spark.session import spread_scan

    docs = spread_scan(docs, id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    t = F.col("_toks")
    n = F.size(t)

    def max_run(arr):
        """Longest run of equal adjacent elements via one sequential fold
        (state: previous token, current run, best run)."""
        init = F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        )

        def step(acc, x):
            run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run2.alias("run"),
                F.greatest(acc["best"], run2).alias("best"),
            )

        return F.aggregate(arr, init, step, lambda acc: acc["best"])

    # (the max run of the SORTED array is the max term frequency — see
    # the counts projection below)
    g2 = F.when(
        n >= 2,
        F.zip_with(
            F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g3 = F.when(
        n >= 3,
        F.zip_with(
            F.slice(t, 1, n - 2),
            F.zip_with(
                F.slice(t, 2, n - 2), F.slice(t, 3, n - 2),
                lambda b, c: F.concat_ws(" ", b, c),
            ),
            lambda a, bc: F.concat_ws(" ", a, bc),
        ),
    ).otherwise(F.array().cast("array<string>"))

    # STAGED projections: higher-order expressions run INTERPRETED (no
    # whole-stage codegen, hence no subexpression elimination) — naming
    # each expensive expression once per stage keeps the folds and the
    # n-gram builds from being evaluated 2-3x (the single-Project form
    # re-ran the whole aggregate(array_sort(...)) inside top_word_frac).
    # The intermediate Projects carry only per-row scalars/arrays, so the
    # staging costs nothing at any scale.
    grams = base.select(
        F.col(id_col), t.alias("_toks"), g2.alias("_g2"), g3.alias("_g3")
    )
    counts = grams.select(
        F.col(id_col),
        F.size(F.col("_toks")).alias("n_words"),
        max_run(F.array_sort(F.col("_toks"))).alias("top_word_count"),
        max_run(F.col("_toks")).alias("max_word_run"),
        F.size("_g2").alias("_t2"),
        F.size(F.array_distinct("_g2")).alias("_d2"),
        F.size("_g3").alias("_t3"),
        F.size(F.array_distinct("_g3")).alias("_d3"),
    )

    def dup_frac(tot, dst):
        return F.when(
            F.col(tot) > 0,
            (F.col(tot) - F.col(dst)).cast("double") / F.col(tot).cast("double"),
        ).otherwise(F.lit(0.0))

    return counts.select(
        F.col(id_col),
        "n_words",
        "top_word_count",
        "max_word_run",
        F.when(
            F.col("n_words") > 0,
            F.col("top_word_count").cast("double") / F.col("n_words").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_word_frac"),
        dup_frac("_t2", "_d2").alias("dup_2gram_frac"),
        dup_frac("_t3", "_d3").alias("dup_3gram_frac"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    replayable: bool = False,
) -> DataFrame:
    """Cross-document repeated word-n-gram windows (boilerplate heads).

    Finds the n-token windows that appear in at least ``min_df`` distinct
    documents — headers, footers, license blurbs, templated spam — the
    corpus-level signal the per-document ``repetition_stats`` cannot see
    (Lee et al.'s repeated-substring observation motivates masking these
    before training).  Returns the top-``k`` by (df, tf); ties at the cut
    break on the n-gram's 64-bit hash (deterministic, and replayable by
    the oracle without shipping text), output re-sorted by (df, tf,
    ngram) for humans.

    100 TB plan shape: per-row n-gram construction is a JVM HOF
    (``sequence``+``slice``+``array_join``, no Python); the n-gram STRING
    is hashed to one long (xxhash64, or the md5-derived twin when
    ``replayable``) before the aggregation, so both exchanges of the
    count-distinct (keyed (hash, doc) then (hash)) carry 8-byte longs
    instead of ~n×word-width text — boilerplate detection is exactly the
    regime where most n-grams are near-distinct and partial agg cannot
    collapse them, so exchange width IS the bottleneck at scale.  The
    top-k hashes are a TakeOrdered; only then does a second narrow pass
    resolve the k winning strings (broadcast semi-join on the hash ->
    tiny ``min(ngram)`` aggregate — under 64-bit hash collision both
    engines merge identically, and at k~100 the collision odds are
    ~k·|grams|/2^64, negligible).
    """
    from osm_cut_spark.operators.dedup import _hash64
    from osm_cut_spark.session import spread_scan

    docs = spread_scan(docs, id_col)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("_doc"), toks.alias("_toks"))
    grams = F.when(
        F.size(F.col("_toks")) >= n,
        F.expr(
            f"transform(sequence(1, size(_toks) - {n} + 1),"
            f" i -> array_join(slice(_toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # explode_outer + isNotNull == explode row-for-row here (gram strings
    # are concat_ws outputs, never null; short docs' empty arrays yield one
    # null row that the filter drops) — but unlike explode it synthesizes
    # no size(grams)>0 predicate for pushdown to re-expand the staged token
    # alias below the spread exchange (see dedup.minhash_sig_cols)
    exploded = base.select("_doc", F.explode_outer(grams).alias("ngram")).filter(
        F.col("ngram").isNotNull()
    )
    hashed = exploded.select(
        _hash64(F.col("ngram"), replayable).alias("_h"), "_doc"
    )
    top = (
        hashed.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("tf"), F.countDistinct("_doc").alias("df"))
        .filter(F.col("df") >= min_df)
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("_h"))
        .limit(k)
    )
    texts = (
        exploded.select(_hash64(F.col("ngram"), replayable).alias("_h"), "ngram")
        .join(F.broadcast(top.select("_h")), "_h", "left_semi")
        .groupBy("_h")
        .agg(F.min("ngram").alias("ngram"))
    )
    return (
        top.join(F.broadcast(texts), "_h")
        .select("ngram", "tf", "df")
        .orderBy(F.desc("df"), F.desc("tf"), F.asc("ngram"))
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", replayable: bool = False
) -> DataFrame:
    """Rolling-hash document fingerprint: 8 evenly-spaced text-window
    hashes + full-text hash (winnowing-style sketch, fixed offsets).

    ``replayable=True`` hashes with the md5-derived h64 (DuckDB twin) so
    the sketch is oracle-checkable; offsets use floor() (not a bare int
    cast) because DuckDB's double->int cast rounds where Spark truncates.
    """
    from osm_cut_spark.operators.dedup import _hash64

    n = F.length(text_col)
    win = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda i: _hash64(
            F.substring(
                F.col(text_col),
                F.floor(i * F.greatest(n - 32, F.lit(1)) / 8).cast("int") + 1,
                32,
            ),
            replayable,
        ),
    )
    return docs.select(
        F.col(id_col),
        _hash64(F.col(text_col), replayable).alias("full_hash"),
        win.alias("window_hashes"),
    )
