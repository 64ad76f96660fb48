"""Corpus-curation operators for LLM training-data pipelines.

Beyond-reference capability (like ``dedup``/``textops``): the four passes
every production pretraining pipeline runs between raw corpus and tokenizer,
each as a first-class oracle-checked query over ``documents``. Everything
is built-in JVM expressions — no Python UDFs.

Scale design (100 TB):

- decontamination   — inverted-index equi-join on eval-set shingles (shuffle
                      keyed on shingle; real eval sets are tiny, so AQE
                      broadcasts that side and the train corpus never
                      shuffles). Never an all-pairs comparison.
- repetition filter — narrow per-row map (Gopher-style duplicate-n-gram
                      fraction from HOF arrays); no shuffle at all.
- PII scrub         — narrow per-row regexp map; no shuffle. The fixture
                      corpus is synthetic, so deterministic PII is INJECTED
                      first (both engines inject identically), making the
                      scrub verifiable rather than vacuously zero.
- stratified sample — deterministic per-stratum LCG-hash thresholding:
                      stable across runs/machines/engines (unlike
                      ``randomSplit``), exactly reproducible by the oracle,
                      and embarrassingly parallel (per-row arithmetic +
                      one vocabulary-bounded aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import bind, t, t_par

# ---------------------------------------------------------------- decontam

_DECON_N = 5  # eval/train overlap shingle width (tokens)


def _ngrams(n: int, col: str = "text") -> Column:
    """Distinct word n-gram shingles (0-based array subscripts). Token
    array bound once per row (``common.bind``) — n references per shingle
    would otherwise re-split the text n times per element.

    The short-doc guard lives INSIDE the expression (when()), not in a
    DataFrame filter: codegen subexpression elimination hoists shared
    expressions to the top of a fused predicate, so a `size >= n` filter
    conjunct does NOT prevent the shingle expr from evaluating on short
    rows first — observed as ANSI INVALID_ARRAY_INDEX from inside
    FilterEvaluator. CaseWhen branches are exempt from that hoisting."""
    return bind(
        F.split(F.col(col), " "),
        lambda w: F.when(
            F.size(w) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.concat_ws(" ", *[w[i + j] for j in range(n)]),
                )
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def cur_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-eval decontamination: find train-split documents sharing at
    least one 5-token shingle with any eval-split document (the standard
    n-gram-overlap test-set-leakage check), with the count of distinct
    leaked shingles per train doc.

    Split is the deterministic key-hash split from ``tx_train_split``
    (doc_id % 10: 0-7 train, 8-9 eval). The join is an inverted-index
    equi-join on the shingle string — at scale the eval side is small
    enough to broadcast, so the train corpus is never shuffled."""
    docs = t_par(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= _DECON_N
    )
    sh = docs.select(
        "doc_id", (F.col("doc_id") % 10 < 8).alias("is_train"), _ngrams(_DECON_N).alias("sh")
    )
    train = sh.filter("is_train").select("doc_id", F.explode("sh").alias("shingle"))
    # distinct eval shingles: the contamination reference set
    eval_sh = (
        sh.filter(~F.col("is_train")).select(F.explode("sh").alias("shingle")).distinct()
    )
    return (
        # explicit broadcast (not just AQE's runtime downgrade): the eval
        # reference set is the small side by construction, and the train
        # corpus must never shuffle
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_leaked_shingles"))
    )


# -------------------------------------------------------------- repetition

_REP_N = 3  # Gopher-style duplicate n-gram width
_REP_MAX_DUP_FRAC = 0.2


def cur_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition stats (the Gopher repetition filters,
    adapted to the fixture's single-line documents): total vs distinct
    3-gram counts, the duplicate fraction, the most-repeated token's share,
    and the keep/drop verdict at a 20% duplicate-n-gram budget. Narrow
    per-row map — no shuffle."""
    docs = t(spark, sf_dir, "documents")

    def stats(w: Column) -> Column:
        # guard short docs INSIDE the expression: the nw>=N filter below
        # runs on this same struct, so without the when() a 1-2-token doc
        # would evaluate sequence(0, negative) -> descending indices ->
        # ANSI INVALID_ARRAY_INDEX before the filter could drop it
        grams = F.when(
            F.size(w) >= _REP_N,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - _REP_N),
                lambda i: F.concat_ws(" ", w[i], w[i + 1], w[i + 2]),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # most frequent single token's count in the doc
        top_tok_n = F.array_max(
            F.transform(
                F.array_distinct(w), lambda tok: F.size(F.filter(w, lambda x: x == tok))
            )
        )
        return F.struct(
            F.size(grams).alias("n"),
            F.size(F.array_distinct(grams)).alias("nd"),
            top_tok_n.alias("top"),
            F.size(w).alias("nw"),
        )

    s = bind(F.split(F.col("text"), " "), stats)
    return (
        docs.select("doc_id", s.alias("s"))
        .filter(F.col("s")["nw"] >= _REP_N)
        .select(
            "doc_id",
            F.col("s")["n"].alias("n_ngrams"),
            F.col("s")["nd"].alias("n_distinct_ngrams"),
            F.round((F.col("s")["n"] - F.col("s")["nd"]) / F.col("s")["n"], 6).alias(
                "dup_frac"
            ),
            F.round(F.col("s")["top"] / F.col("s")["nw"], 6).alias("top_token_share"),
            (
                (F.col("s")["n"] - F.col("s")["nd"]) / F.col("s")["n"]
                <= _REP_MAX_DUP_FRAC
            ).alias("keep"),
        )
    )


# ----------------------------------------------------------- gopher rules

# Published Gopher quality-rule thresholds (Rae et al. 2021, table A1),
# adapted to the fixture's single-line documents (the line-shape rules —
# bullet/ellipsis line fractions — have no line structure to act on here,
# so the ellipsis test runs per occurrence instead of per line). Word-count
# bounds are scaled to the fixture's 10-99-word corpus so the verdict
# splits instead of being vacuously all-keep.
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 20, 80
_GOPHER_MIN_MWL, _GOPHER_MAX_MWL = 3.0, 10.0
_GOPHER_MAX_SYMBOL_RATIO = 0.1
_GOPHER_MIN_ALPHA_FRAC = 0.8
_GOPHER_MIN_STOP_HITS = 2
_GOPHER_STOPWORDS = ("the", "a", "of", "and", "in")


def cur_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery: per-document word count, mean
    word length, symbol-to-word ratio (# and ... occurrences), fraction of
    words containing an alphabetic character, stopword hits, and the
    conjunctive keep/drop verdict. Narrow per-row map — no shuffle, no UDF;
    every rule is a JVM expression over one bound token array."""
    docs = t(spark, sf_dir, "documents")

    def stats(w0: Column) -> Column:
        w = F.filter(w0, lambda x: x != F.lit(""))
        n = F.size(w)
        char_sum = F.aggregate(
            w, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
        )
        n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-zA-Z]")))
        stop_hits = sum(
            (F.size(F.filter(w, lambda x: x == F.lit(s))) for s in _GOPHER_STOPWORDS),
            F.lit(0),
        )
        return F.struct(
            n.alias("n"),
            char_sum.alias("cs"),
            n_alpha.alias("na"),
            stop_hits.alias("sh"),
        )

    s = bind(F.split(F.col("text"), " "), stats)
    n_words = F.col("s")["n"]
    denom = F.greatest(n_words, F.lit(1))
    mean_word_len = F.col("s")["cs"] / denom
    n_hash = F.length("text") - F.length(F.regexp_replace(F.col("text"), "#", ""))
    n_ellipsis = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), r"\.\.\.", ""))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis) / denom
    alpha_frac = F.col("s")["na"] / denom
    stop_hits = F.col("s")["sh"]
    keep = (
        n_words.between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
        & mean_word_len.between(_GOPHER_MIN_MWL, _GOPHER_MAX_MWL)
        & (symbol_ratio < _GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_frac > _GOPHER_MIN_ALPHA_FRAC)
        & (stop_hits >= _GOPHER_MIN_STOP_HITS)
    )
    return docs.select("doc_id", "text", s.alias("s")).select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("bigint").alias("n_stop_hits"),
        keep.alias("keep"),
    )


_GOPHER_SQL = f"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split(text, ' '), x -> x != '') AS w
        FROM documents
    ), st AS (
        SELECT doc_id, text,
               len(w) AS n_words,
               greatest(len(w), 1) AS denom,
               CAST(list_sum([len(x) FOR x IN w]) AS BIGINT) AS char_sum,
               len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
                   AS n_alpha,
               CAST(len(list_filter(w,
                   x -> x IN {_GOPHER_STOPWORDS!r})) AS BIGINT) AS n_stop_hits,
               (len(text) - len(replace(text, '#', ''))) AS n_hash,
               (len(text) - len(replace(text, '...', ''))) / 3.0 AS n_ellipsis
        FROM toks
    )
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           round(COALESCE(char_sum, 0) / CAST(denom AS DOUBLE), 6)
               AS mean_word_len,
           round((n_hash + n_ellipsis) / denom, 6) AS symbol_ratio,
           round(n_alpha / CAST(denom AS DOUBLE), 6) AS alpha_word_frac,
           n_stop_hits,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS}
            AND COALESCE(char_sum, 0) / CAST(denom AS DOUBLE)
                BETWEEN {_GOPHER_MIN_MWL} AND {_GOPHER_MAX_MWL}
            AND (n_hash + n_ellipsis) / denom < {_GOPHER_MAX_SYMBOL_RATIO}
            AND n_alpha / CAST(denom AS DOUBLE) > {_GOPHER_MIN_ALPHA_FRAC}
            AND n_stop_hits >= {_GOPHER_MIN_STOP_HITS}) AS keep
    FROM st
"""


# -------------------------------------------------------------------- PII

_EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+\.[A-Za-z]+"
_PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}"


def _with_injected_pii(docs: DataFrame) -> Column:
    """Deterministically inject synthetic PII (the fixture corpus has none):
    every 7th doc gains an email, every 11th a phone number. The oracle
    performs the identical injection, so the scrub is genuinely tested."""
    email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(F.lit(" call +49-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, phone)


def cur_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and redact email addresses and phone numbers
    (regexp patterns chosen to be RE2/Java-regex compatible so the oracle
    runs them verbatim). Output carries the counts and an md5 of the
    redacted text — enough to verify the rewrite without shipping it."""
    docs = t(spark, sf_dir, "documents")
    txt = _with_injected_pii(docs)
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(_EMAIL_RE), F.lit(0)))
    n_phones = F.size(F.regexp_extract_all(txt, F.lit(_PHONE_RE), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(txt, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --------------------------------------------------------------- sampling

# per-language keep-rate in percent: downsample the majority language,
# keep half of everything else (the data-mixture rebalancing step)
_SAMPLE_RATES = {"en": 20}
_SAMPLE_DEFAULT_RATE = 50
# LCG constants (glibc): doc_id → pseudo-uniform in [0, 100); exact in both
# engines' int64 (doc_id * 1103515245 stays far below 2^63 at any fixture SF)
_LCG_A, _LCG_C, _LCG_M = 1103515245, 12345, 2_147_483_648


def cur_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling with per-stratum accounting:
    language-keyed keep-rates applied by LCG-hash thresholding on doc_id
    (reproducible across engines — the oracle computes the identical
    arithmetic; ``sampleBy`` would not be). Returns per (lang, source)
    population vs sample counts and sampled token mass."""
    docs = t(spark, sf_dir, "documents")
    h = ((F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M) % 100
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in _SAMPLE_RATES.items()],
        F.lit(_SAMPLE_DEFAULT_RATE),
    )
    sampled = (h < rate).cast("int")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(sampled).alias("n_sampled"),
            F.sum(sampled * n_tokens).alias("sampled_tokens"),
        )
    )


def cur_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix planning: per-source token mass, its share of the
    corpus, and the up/down-sampling weight that would equalize the mix
    (weight = total / (n_sources * source_tokens) — multiply each source's
    sampling rate by its weight and every source contributes equal
    tokens). The report every data-mixture ablation starts from.

    Determinism: shares/weights are single IEEE divisions of exact
    integers (both engines correctly round), then rounded — no float
    accumulation anywhere. Scale shape: one source-keyed aggregation
    (map-side combined, group count = n_sources), then a window over that
    tiny aggregate — the global-window funnel is over n_sources rows, not
    data."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens.cast("long")).alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = F.sum("n_tokens").over(w)
    n_sources = F.count(F.lit(1)).over(w)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / total, 6).alias("token_share"),
        F.round(total / (n_sources * F.col("n_tokens")), 6).alias("uniform_weight"),
    )


# Temperature-scaled mixing: p_i ∝ n_i^(1/2) — the multilingual-LM
# sampling trick (τ = 2, i.e. exponent 1/2) that boosts low-resource
# sources without letting any source dominate. Budget is the planned
# training-run token count the epochs column is quoted against.
_MIX_TOKEN_BUDGET = 10_000_000


def cur_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix plan on REAL subword counts: each
    source's sampling probability is proportional to sqrt(n_tokens)
    (temperature-2 sampling — the standard compromise between natural
    (τ=1, big sources drown small) and uniform (τ=∞, tiny sources repeat
    until memorized)). Reports natural vs temperature share, the
    over/under-sampling factor, and effective epochs at a fixed token
    budget — epochs >> 1 on a small source is the overfit warning this
    table exists to surface.

    Determinism: sqrt is IEEE-correctly-rounded in both engines and each
    per-source value rounds to 6 BEFORE the cross-source normalizer sum,
    which runs in decimal (exact, order-independent — float accumulation
    over sources would be partition-order-dependent); every share is then
    a single double division. Scale shape: the tokenizer fold is
    per-distinct-word, per-source totals are one partial-agg groupBy, and
    the normalizer window runs over n_sources rows only."""
    from pyspark.sql import Window

    from .textops import _word_subword_stats

    ws = _word_subword_stats(spark, sf_dir).select("w", "n_tok")
    docs = t(spark, sf_dir, "documents")
    per_src = (
        docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .join(ws, "w")
        .groupBy("source")
        .agg(F.sum("n_tok").cast("long").alias("n_tokens"))
    )
    sqrtr = F.round(F.sqrt(F.col("n_tokens")), 6).cast("decimal(38,6)")
    w = Window.partitionBy()
    staged = per_src.select(
        "source",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w))
        .alias("nat_raw"),
        (sqrtr.cast("double") / F.sum(sqrtr).over(w).cast("double"))
        .alias("temp_raw"),
    )
    return staged.select(
        "source",
        "n_tokens",
        F.round(F.col("nat_raw"), 6).alias("natural_share"),
        F.round(F.col("temp_raw"), 6).alias("temp_share"),
        F.round(F.col("temp_raw") / F.col("nat_raw"), 6).alias("sample_weight"),
        F.round(
            F.lit(_MIX_TOKEN_BUDGET) * F.col("temp_raw") / F.col("n_tokens"), 6
        ).alias("epochs_at_budget"),
    )


# DP release: Laplace scale b = sensitivity/epsilon = 1/1.0 for counting
# queries (adding/removing one person changes a count by at most 1)
_DP_EPSILON = 1.0


def cur_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (ε = 1 Laplace mechanism) —
    the third privacy gate after k-anonymity and l-diversity: per
    (nation, segment) class, the true count plus Laplace(1/ε) noise via
    inverse-CDF sampling, and the post-processed released count
    (rounded, clamped at 0). The uniform driving each class's noise is a
    SEEDED portable hash of the class key (md5 60-bit / 2^60 — the
    dd_simhash convention), so the release is reproducible and both
    engines draw the identical sample; a production release would use a
    fresh secret seed and publish ONLY the released column — the true
    count rides along here because this table exists to verify the
    mechanism, not to ship.

    Determinism: u is an exact 60-bit dyadic rational; the inverse CDF
    -b·sign(x)·ln(1-2|x|) is single IEEE ops with ln rounded to 6 (the
    tx_lm_score rule). Scale shape: one partial-agg shuffle bounded by
    quasi-identifier cardinality; the noise is a narrow map over the
    aggregate."""
    cust = t(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("true_count")
    )
    seed = F.concat(
        F.lit("dp:"),
        F.col("c_nationkey").cast("string"),
        F.lit(":"),
        F.col("c_mktsegment"),
    )
    u = (
        F.conv(F.substring(F.md5(seed), 1, 15), 16, 10).cast("long")
        / F.lit(float(2**60))
    )
    x = u - F.lit(0.5)
    b = 1.0 / _DP_EPSILON
    noise = F.round(
        -F.lit(b)
        * F.signum(x)
        * F.round(F.log(F.lit(1.0) - 2 * F.abs(x)), 6),
        6,
    )
    staged = classes.select(
        "c_nationkey", "c_mktsegment", "true_count", noise.alias("noise")
    )
    noisy = F.round(F.col("true_count") + F.col("noise"), 6)
    return staged.select(
        "c_nationkey",
        "c_mktsegment",
        "true_count",
        "noise",
        F.greatest(
            F.lit(0).cast("long"), F.round(noisy, 0).cast("long")
        ).alias("released_count"),
    )


# ---------------------------------------------------------- record linkage


def cur_fuzzy_blocked_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage — match a clean entity registry against
    a dirty copy (typos injected deterministically: 1/3 of names lose their
    first character, 1/3 get a 'Customer'→'Custoner' substitution) via
    edit-distance ≤ 2 WITHIN suffix blocks. The fixture corpus has no
    natural dirty twin, so the dirty side is derived in-query, identically
    in both engines — making the match set verifiable rather than
    vacuously diagonal (near-id collisions like …0123 vs …10123 produce
    genuine cross-entity fuzzy hits).

    Scale shape (100 TB): the classic blocking pattern — candidate pairs
    come from an EQUI-join on a cheap block key (last-4-char suffix, which
    both injected typo classes preserve), and the expensive levenshtein
    runs only inside blocks. Never all-pairs: cost is Σ|block_a|·|block_b|,
    bounded by the block-key granularity, which is the scale knob (widen
    the suffix, or add a second key like a phonetic code, as the registry
    grows). Both sides shuffle once on the block key."""
    cust = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    clean = cust.select(k.alias("a_key"), F.col("c_name").alias("a_name"))
    dirty = cust.select(
        k.alias("b_key"),
        F.when(k % 3 == 0, F.substring("c_name", 2, 1_000_000))
        .when(k % 3 == 1, F.expr("replace(c_name, 'Customer', 'Custoner')"))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
    )
    lev = F.levenshtein("a_name", "b_name")
    return (
        clean.join(
            dirty,
            F.substring("a_name", -4, 4) == F.substring("b_name", -4, 4),
        )
        .filter(lev <= 2)
        .select(
            "a_key",
            "b_key",
            "a_name",
            "b_name",
            lev.cast("int").alias("lev"),
            (F.col("a_key") == F.col("b_key")).alias("is_same_entity"),
        )
    )


# ------------------------------------------------------- weighted sampling


def cur_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement, top-20 per
    source — Efraimidis–Spirakis A-ES: each doc gets key ln(u)/w (u a
    uniform derived from md5(doc_id), w = n_chars), and the k largest keys
    per stratum ARE a weighted sample without replacement. Longer docs are
    proportionally likelier to be picked, and the draw is reproducible
    across runs, machines, and engines (both sides derive u from the same
    md5 hex prefix — no engine RNG anywhere).

    Determinism contract: the sample key is ROUNDED to 6 before ranking
    (doc_id tiebreak), the tx_lm_score/tx_keyword_extract rule, so both
    engines rank identically even among near-ties.

    Scale shape: per-row hash arithmetic + one top-k-per-group window over
    strata — embarrassingly parallel; at 100 TB swap the window for the
    bounded-heap per-partition top-k then merge, same contract."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    key6 = F.round(F.log(u) / F.col("n_chars").cast("double"), 6)
    w = Window.partitionBy("source").orderBy(
        F.desc("sample_key"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "source", "n_chars", key6.alias("sample_key"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("source", "rank", "doc_id", "n_chars", "sample_key")
    )


# -------------------------------------------------------- robust scaling


def cur_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorize + robust-scale a metric per group — the outlier-taming
    normalization applied to numeric quality signals before they feed a
    filter threshold or a model: clamp ``value`` to each event_type's
    [p05, p95], then scale as (winsorized − median) / IQR. Median/IQR
    resist the heavy tails that break mean/stddev scaling.

    Determinism contract: all five quantiles are rounded to 4 BEFORE the
    clamp/scale arithmetic (the a_percentiles rule — interpolation order
    inside the quantile is the only engine-variant step), so downstream
    comparisons and divisions run on identical doubles in both engines.

    Scale shape: one sort-agg per group for the quantile vector (swap in
    percentile_approx at 100 TB — same contract, mergeable sketch state),
    broadcast back (group cardinality is tiny); the clamp/scale itself is
    a narrow per-row map with no shuffle."""
    ev = t(spark, sf_dir, "events")
    qs = ev.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", F.lit(p)), 4).alias(n)
            for p, n in [
                (0.05, "p05"),
                (0.25, "p25"),
                (0.5, "p50"),
                (0.75, "p75"),
                (0.95, "p95"),
            ]
        ]
    )
    win = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    return (
        ev.join(F.broadcast(qs), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            win.alias("winsorized"),
            F.round(
                (win - F.col("p50")) / (F.col("p75") - F.col("p25")), 6
            ).alias("robust_z"),
        )
    )


_K_ANON = 10  # minimum equivalence-class size for release


def cur_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table's quasi-identifiers
    (nation, market segment): every equivalence class with its size, an
    ``at_risk`` flag (class smaller than k=10 → those rows are
    re-identifiable), and whether one generalization step — dropping the
    segment, keeping only the nation — already lifts the class above k
    (``still_at_risk``). This is the release-gate check a privacy review
    runs before a dataset with demographic columns ships.

    Scale shape: two partial-agg shuffles bounded by quasi-identifier
    cardinality (nation × segment), the second joined back broadcast —
    the fact table itself is touched once. Pure integer counting: exact
    in both engines."""
    cust = t(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size")
    )
    nation = classes.groupBy("c_nationkey").agg(
        F.sum("class_size").alias("generalized_size")
    )
    return (
        classes.join(F.broadcast(nation), "c_nationkey")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            (F.col("class_size") < _K_ANON).alias("at_risk"),
            "generalized_size",
            (F.col("generalized_size") < _K_ANON).alias("still_at_risk"),
        )
    )


# sensitive-attribute banding for the l-diversity audit: account balance
# quantized to four business bands (the sensitive value a k-anonymous
# class must still not reveal). Boundaries are exact decimal compares.
_L_DIVERSITY = 3


def _acct_band() -> Column:
    return (
        F.when(F.col("c_acctbal") < 0, F.lit("negative"))
        .when(F.col("c_acctbal") < 3000, F.lit("low"))
        .when(F.col("c_acctbal") < 7000, F.lit("mid"))
        .otherwise(F.lit("high"))
    )


def cur_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the step AFTER k-anonymity every privacy review
    runs: a class can be large (k-anonymous) yet still leak if everyone in
    it shares the same sensitive value. Per quasi-identifier class
    (nation, segment): distinct sensitive bands observed, the l >= 3 flag,
    and the dominant band's share (a 0.95 share means membership alone
    reveals the attribute with 95% confidence — the homogeneity attack).

    Determinism: pure integer counting over exact decimal band
    boundaries; the share is one int/int double division. Scale shape:
    two partial-agg shuffles bounded by quasi-identifier × band
    cardinality; the fact table is scanned once."""
    cust = t(spark, sf_dir, "customer")
    per_band = (
        cust.select("c_nationkey", "c_mktsegment", _acct_band().alias("band"))
        .groupBy("c_nationkey", "c_mktsegment", "band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_band.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n").alias("class_size"),
            F.count(F.lit(1)).alias("n_sensitive_values"),
            F.max("n").alias("top_band_count"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "class_size",
            "n_sensitive_values",
            (F.col("n_sensitive_values") >= _L_DIVERSITY).alias("l_diverse"),
            F.round(F.col("top_band_count") / F.col("class_size"), 6).alias(
                "top_band_share"
            ),
        )
    )


# t-closeness threshold: classes whose banded-balance distribution sits
# within EMD 0.2 of the global distribution are releasable
_T_CLOSE = 0.2
# fixed band order for the ordered-attribute EMD (cumulative differences)
_BANDS = ("negative", "low", "mid", "high")


def cur_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li, Venkatasubramanian 2007) — the third
    rung of the release-gate ladder after ``cur_k_anonymity`` and
    ``cur_l_diversity``: a class can be large AND diverse yet still leak
    if its sensitive-value DISTRIBUTION differs sharply from the global
    one (skewness attack: membership shifts the adversary's posterior).
    Per quasi-identifier class: the Earth Mover's Distance between the
    class' banded-balance distribution and the global distribution, and
    the t <= 0.2 release flag.

    For an ORDERED attribute with unit ground distances, EMD reduces to
    the mean absolute difference of the cumulative distributions
    (1/(m-1) · Σ|cumP_i − cumQ_i| over the m−1 interior prefixes) — pure
    arithmetic over per-band integer counts, no solver. Determinism:
    integer prefix sums, one double division per prefix, three abs-sums
    in fixed band order, rounded at the edge. Scale shape: one partial-agg
    shuffle bounded by QI × band cardinality, then a ONE-ROW global
    distribution cross-joined (constant at any fact size — the scalar-
    anchor shape)."""
    cust = t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", _acct_band().alias("band")
    )

    def band_counts(prefix: str) -> list[Column]:
        return [
            F.sum((F.col("band") == b).cast("long")).alias(f"{prefix}{i}")
            for i, b in enumerate(_BANDS)
        ]

    cls = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("class_size"), *band_counts("n")
    )
    glob = cust.agg(F.count(F.lit(1)).alias("gt"), *band_counts("g"))
    joined = cls.crossJoin(F.broadcast(glob))
    cs = F.col("class_size").cast("double")
    gt = F.col("gt").cast("double")

    def prefix_diff(k: int) -> Column:
        pn = sum(F.col(f"n{i}") for i in range(k + 1))
        pg = sum(F.col(f"g{i}") for i in range(k + 1))
        return F.abs(pn.cast("double") / cs - pg.cast("double") / gt)

    t_raw = (prefix_diff(0) + prefix_diff(1) + prefix_diff(2)) / F.lit(3.0)
    return joined.select(
        "c_nationkey",
        "c_mktsegment",
        "class_size",
        F.round(t_raw, 6).alias("t_distance"),
        (t_raw <= F.lit(_T_CLOSE)).alias("t_close"),
    )


QUERIES = {
    "cur_k_anonymity": cur_k_anonymity,
    "cur_l_diversity": cur_l_diversity,
    "cur_t_closeness": cur_t_closeness,
    "cur_dp_release": cur_dp_release,
    "cur_decontaminate": cur_decontaminate,
    "cur_fuzzy_blocked_join": cur_fuzzy_blocked_join,
    "cur_weighted_sample": cur_weighted_sample,
    "cur_robust_scale": cur_robust_scale,
    "cur_source_mix": cur_source_mix,
    "cur_temperature_mix": cur_temperature_mix,
    "cur_repetition_filter": cur_repetition_filter,
    "cur_gopher_rules": cur_gopher_rules,
    "cur_pii_scrub": cur_pii_scrub,
    "cur_stratified_sample": cur_stratified_sample,
}

_DECON_SQL = f"""
    WITH toks AS (
        SELECT doc_id, doc_id % 10 < 8 AS is_train, string_split(text, ' ') w
        FROM documents WHERE len(string_split(text, ' ')) >= {_DECON_N}
    ), sh AS (
        SELECT doc_id, is_train,
               list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                              || w[i+3] || ' ' || w[i+4]
                              for i in range(1, len(w) - {_DECON_N - 2})]) s
        FROM toks
    ), train AS (
        SELECT doc_id, unnest(s) shingle FROM sh WHERE is_train
    ), ev AS (
        SELECT DISTINCT unnest(s) shingle FROM sh WHERE NOT is_train
    )
    SELECT t.doc_id, count(DISTINCT t.shingle) AS n_leaked_shingles
    FROM train t JOIN ev e ON t.shingle = e.shingle
    GROUP BY t.doc_id
"""

_REP_SQL = f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') w FROM documents
        WHERE len(string_split(text, ' ')) >= {_REP_N}
    ), grams AS (
        SELECT doc_id, w,
               [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                for i in range(1, len(w) - 1)] g
        FROM toks
    )
    SELECT doc_id,
           CAST(len(g) AS INTEGER) AS n_ngrams,
           CAST(len(list_distinct(g)) AS INTEGER) AS n_distinct_ngrams,
           round((len(g) - len(list_distinct(g))) / CAST(len(g) AS DOUBLE), 6)
               AS dup_frac,
           round(list_max([len(list_filter(w, x -> x = tok))
                           for tok in list_distinct(w)]) / CAST(len(w) AS DOUBLE), 6)
               AS top_token_share,
           (len(g) - len(list_distinct(g))) / CAST(len(g) AS DOUBLE)
               <= {_REP_MAX_DUP_FRAC} AS keep
    FROM grams
"""

_PII_SQL = f"""
    WITH injected AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call +49-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS txt
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
           md5(regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g'))
               AS redacted_md5
    FROM injected
"""

# the CASE arms derive from _SAMPLE_RATES so editing the rates can never
# desynchronize the oracle from the Spark side
_RATE_CASE = "(CASE " + " ".join(
    f"WHEN lang = '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items()
) + f" ELSE {_SAMPLE_DEFAULT_RATE} END)"

_SAMPLE_SQL = f"""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN ((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % 100
                              < {_RATE_CASE}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN ((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % 100
                              < {_RATE_CASE}
                         THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
               AS sampled_tokens
    FROM documents
    GROUP BY lang, source
"""

def _temperature_mix_sql() -> str:
    # late import: keeps curation→textops a call-time edge, not import-time
    from .textops import _SUBWORD_CTES

    return f"""
        WITH RECURSIVE {_SUBWORD_CTES}, per_src AS MATERIALIZED (
            SELECT d.source, CAST(sum(s.n_tok) AS BIGINT) AS n_tokens
            FROM doc_words dw
            JOIN word_stats s USING (w)
            JOIN documents d USING (doc_id)
            GROUP BY d.source
        ), staged AS (
            SELECT source, n_tokens,
                   CAST(n_tokens AS DOUBLE)
                       / CAST(sum(n_tokens) OVER () AS BIGINT) AS nat_raw,
                   CAST(CAST(round(sqrt(n_tokens), 6) AS DECIMAL(38,6))
                        AS DOUBLE)
                       / CAST(sum(CAST(round(sqrt(n_tokens), 6)
                                       AS DECIMAL(38,6))) OVER ()
                              AS DOUBLE) AS temp_raw
            FROM per_src
        )
        SELECT source, n_tokens,
               round(nat_raw, 6) AS natural_share,
               round(temp_raw, 6) AS temp_share,
               round(temp_raw / nat_raw, 6) AS sample_weight,
               round({_MIX_TOKEN_BUDGET} * temp_raw / n_tokens, 6)
                   AS epochs_at_budget
        FROM staged
    """


ORACLE = {
    "cur_temperature_mix": _temperature_mix_sql(),
    "cur_dp_release": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS true_count
            FROM customer GROUP BY 1, 2
        ), seeded AS (
            SELECT *,
                   CAST('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)
                                            || ':' || c_mktsegment), 1, 15)
                        AS BIGINT) / CAST({float(2**60)} AS DOUBLE) AS u
            FROM classes
        ), noised AS (
            SELECT c_nationkey, c_mktsegment, true_count,
                   round(-{1.0 / _DP_EPSILON} * sign(u - 0.5)
                         * round(ln(1.0 - 2 * abs(u - 0.5)), 6), 6) AS noise
            FROM seeded
        )
        SELECT c_nationkey, c_mktsegment, true_count, noise,
               greatest(CAST(0 AS BIGINT),
                        CAST(round(round(true_count + noise, 6), 0) AS BIGINT))
                   AS released_count
        FROM noised
    """,
    "cur_l_diversity": f"""
        WITH per_band AS (
            SELECT c_nationkey, c_mktsegment,
                   CASE WHEN c_acctbal < 0 THEN 'negative'
                        WHEN c_acctbal < 3000 THEN 'low'
                        WHEN c_acctbal < 7000 THEN 'mid'
                        ELSE 'high' END AS band,
                   CAST(count(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT c_nationkey, c_mktsegment,
               CAST(sum(n) AS BIGINT) AS class_size,
               CAST(count(*) AS BIGINT) AS n_sensitive_values,
               count(*) >= {_L_DIVERSITY} AS l_diverse,
               round(max(n) / CAST(sum(n) AS BIGINT), 6) AS top_band_share
        FROM per_band GROUP BY 1, 2
    """,
    "cur_t_closeness": f"""
        WITH b AS (
            SELECT c_nationkey, c_mktsegment,
                   CASE WHEN c_acctbal < 0 THEN 'negative'
                        WHEN c_acctbal < 3000 THEN 'low'
                        WHEN c_acctbal < 7000 THEN 'mid'
                        ELSE 'high' END AS band
            FROM customer
        ), cls AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(count(*) AS BIGINT) AS class_size,
                   {", ".join(
                       f"CAST(sum(CASE WHEN band = '{bnd}' THEN 1 ELSE 0 END) "
                       f"AS BIGINT) AS n{i}"
                       for i, bnd in enumerate(_BANDS)
                   )}
            FROM b GROUP BY 1, 2
        ), g AS (
            SELECT CAST(count(*) AS BIGINT) AS gt,
                   {", ".join(
                       f"CAST(sum(CASE WHEN band = '{bnd}' THEN 1 ELSE 0 END) "
                       f"AS BIGINT) AS g{i}"
                       for i, bnd in enumerate(_BANDS)
                   )}
            FROM b
        ), j AS (
            SELECT *,
                   (abs(CAST(n0 AS DOUBLE) / CAST(class_size AS DOUBLE)
                        - CAST(g0 AS DOUBLE) / CAST(gt AS DOUBLE))
                    + abs(CAST(n0 + n1 AS DOUBLE) / CAST(class_size AS DOUBLE)
                          - CAST(g0 + g1 AS DOUBLE) / CAST(gt AS DOUBLE))
                    + abs(CAST(n0 + n1 + n2 AS DOUBLE) / CAST(class_size AS DOUBLE)
                          - CAST(g0 + g1 + g2 AS DOUBLE) / CAST(gt AS DOUBLE)))
                   / CAST(3 AS DOUBLE) AS t_raw
            FROM cls CROSS JOIN g
        )
        SELECT c_nationkey, c_mktsegment, class_size,
               round(t_raw, 6) AS t_distance,
               t_raw <= CAST({_T_CLOSE} AS DOUBLE) AS t_close
        FROM j
    """,
    "cur_k_anonymity": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment, count(*) AS class_size
            FROM customer GROUP BY 1, 2
        ), nation AS (
            SELECT c_nationkey, sum(class_size) AS generalized_size
            FROM classes GROUP BY 1
        )
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(c.class_size AS BIGINT) AS class_size,
               c.class_size < {_K_ANON} AS at_risk,
               CAST(n.generalized_size AS BIGINT) AS generalized_size,
               n.generalized_size < {_K_ANON} AS still_at_risk
        FROM classes c JOIN nation n USING (c_nationkey)
    """,
    "cur_decontaminate": _DECON_SQL,
    "cur_fuzzy_blocked_join": """
        WITH clean AS (
            SELECT c_custkey AS a_key, c_name AS a_name FROM customer
        ), dirty AS (
            SELECT c_custkey AS b_key,
                   CASE WHEN c_custkey % 3 = 0 THEN substr(c_name, 2)
                        WHEN c_custkey % 3 = 1
                            THEN replace(c_name, 'Customer', 'Custoner')
                        ELSE c_name END AS b_name
            FROM customer
        )
        SELECT a_key, b_key, a_name, b_name,
               CAST(levenshtein(a_name, b_name) AS INTEGER) AS lev,
               (a_key = b_key) AS is_same_entity
        FROM clean JOIN dirty ON right(a_name, 4) = right(b_name, 4)
        WHERE levenshtein(a_name, b_name) <= 2
    """,
    "cur_weighted_sample": """
        WITH keyed AS (
            SELECT doc_id, source, n_chars,
                   round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                                 ::UBIGINT + 0.5) / 4294967296.0)
                         / CAST(n_chars AS DOUBLE), 6) AS sample_key
            FROM documents
        )
        SELECT source, CAST(rank AS INTEGER) AS rank, doc_id, n_chars,
               sample_key
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY source
                  ORDER BY sample_key DESC, doc_id ASC) AS rank
              FROM keyed)
        WHERE rank <= 20
    """,
    "cur_robust_scale": """
        WITH qs AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.05), 4) AS p05,
                   round(quantile_cont(value, 0.25), 4) AS p25,
                   round(quantile_cont(value, 0.50), 4) AS p50,
                   round(quantile_cont(value, 0.75), 4) AS p75,
                   round(quantile_cont(value, 0.95), 4) AS p95
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type, value,
               least(greatest(value, p05), p95) AS winsorized,
               round((least(greatest(value, p05), p95) - p50) / (p75 - p25), 6)
                   AS robust_z
        FROM events e JOIN qs USING (event_type)
    """,
    "cur_source_mix": """
        WITH per_src AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                        AS BIGINT) AS n_tokens
            FROM documents GROUP BY source
        )
        SELECT source, n_docs, n_tokens,
               round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
                   AS token_share,
               round(CAST(sum(n_tokens) OVER () AS DOUBLE)
                     / (count(*) OVER () * n_tokens), 6) AS uniform_weight
        FROM per_src
    """,
    "cur_repetition_filter": _REP_SQL,
    "cur_gopher_rules": _GOPHER_SQL,
    "cur_pii_scrub": _PII_SQL,
    "cur_stratified_sample": _SAMPLE_SQL,
}
