"""Composite corpus-curation pipeline — the LLM-data workflow end-to-end.

Chains the individual operators the way a real 100 TB curation job does:

    quality filter → exact dedup (md5 survivors) → near-dup removal
    (MinHash-LSH pairs ⇒ drop the higher doc_id of each pair) → per-source
    token accounting.

Every stage is the already-oracle-checked operator; the composition itself
is oracle-checked too (the DuckDB side recomputes the same pipeline in SQL,
with exact jaccard in place of LSH — identical at the fixture's planted-dup
similarity levels, see dedup.py).

Scale: the stages share one shuffle each (hash by content hash, band
bucket, source); survivors propagate as semi/anti joins, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dedup
from .common import t, t_par


def pl_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t_par(spark, sf_dir, "documents")

    # 1. quality gate: drop very short docs (the cheap pre-filter)
    quality = docs.filter(F.col("n_chars") >= 100)

    # 2. exact dedup: keep the lowest doc_id per content hash
    survivors_exact = (
        quality.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(survivors_exact, "doc_id", "left_semi")

    # 3. near-dup removal: LSH pairs (exact-verified) ⇒ drop the b-side
    pairs = dedup.dd_minhash_lsh(spark, sf_dir)
    drop_ids = pairs.select(F.col("b_id").alias("doc_id")).distinct()
    kept = deduped.join(drop_ids, "doc_id", "left_anti")

    # 4. per-source accounting of the surviving corpus
    toks = F.size(F.split("text", " "))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def pl_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation FUNNEL report — per-stage survival through pl_curation's
    exact chain (quality gate → exact dedup → near-dup drop), in ONE pass:
    every document is annotated with survival flags (exact-dedup
    survivorship via the same min-id-per-hash rule, near-dup drops via
    the same verified pair set), then one aggregate emits the
    entering/surviving counts and the end-to-end survival rate. The
    observability table a 100 TB curation run publishes next to its
    output — where did the data GO — and the pipeline sibling of the
    quality-gate evals.

    Scale shape: the flags are two doc-keyed left joins (hash-survivor
    set, near-dup b-side set) over one corpus scan; the report is a
    single partial aggregate. No stage recomputes another's rule — they
    import them."""
    docs = t_par(spark, sf_dir, "documents")
    quality = docs.filter(F.col("n_chars") >= 100)
    survivors_exact = (
        quality.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .withColumn("ek", F.lit(1))
    )
    drop_ids = (
        dedup.dd_minhash_lsh(spark, sf_dir)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("nd", F.lit(1))
    )
    flags = (
        docs.select("doc_id", (F.col("n_chars") >= 100).alias("q"))
        .join(survivors_exact, "doc_id", "left_outer")
        .join(drop_ids, "doc_id", "left_outer")
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("q").cast("long")).alias("n_after_quality"),
        F.sum(F.col("ek").isNotNull().cast("long")).alias("n_after_exact"),
        F.sum(
            (F.col("ek").isNotNull() & F.col("nd").isNull()).cast("long")
        ).alias("n_after_neardup"),
    )
    return agg.select(
        "n_input",
        "n_after_quality",
        "n_after_exact",
        "n_after_neardup",
        F.round(
            F.col("n_after_neardup") / F.col("n_input").cast("double"), 6
        ).alias("survival_rate"),
    )


def pl_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION over transitive near-dup clusters: per non-trivial
    component (dd_components), keep the canonical min-id document and
    account for what the removal saves — (component_id = the survivor,
    n_docs, n_removed, chars_removed). This is the report a 100 TB
    curation job emits before committing the delete: cluster-aware, so
    transitive chains a~b~c remove BOTH b and c (pair-based dropping
    misses c when only a~b, b~c were mined).

    Scale: composes the already-bounded components loop with one join to
    the documents table and a component-keyed aggregate — one extra
    shuffle; nothing collected."""
    comp = dedup.dd_components(spark, sf_dir)
    docs = t_par(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        comp.filter(F.col("component_size") > 1)
        .join(docs, "doc_id")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("n_removed"),
            F.sum(
                F.when(
                    F.col("doc_id") != F.col("component_id"), F.col("n_chars")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("chars_removed"),
        )
    )


def pl_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-admission accounting — the INCREMENTAL counterpart of
    ``pl_curation``: a new batch of documents (doc_id % 10 ≥ 8) is triaged
    against the already-admitted corpus (doc_id % 10 < 8) into one of four
    fates, by precedence:

        'quality'    — fails the cheap length gate (n_chars < 100)
        'exact_dup'  — md5 matches a corpus doc, or a lower-id batch doc
        'near_dup'   — the b-side of an exact-verified ≥0.8-jaccard pair
                       from the incremental LSH probe
                       (``dd_minhash_incremental``: corpus pairs via the
                       persisted band index — corpus never re-sketched —
                       plus in-batch pairs)
        'admitted'   — everything else

    Each predicate is computed independently and combined by precedence, so
    the oracle replays them as independent SQL sets. Scale: corpus-side
    costs are index probes (md5 set semi-join, LSH band index join) — per
    batch cost is O(batch), never O(corpus).
    """
    docs = t_par(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus = docs.filter(F.col("doc_id") % 10 < 8)

    batch_h = batch.select("doc_id", F.md5("text").alias("h"))
    corpus_hashes = corpus.select(F.md5("text").alias("h")).distinct()
    exact_vs_corpus = batch_h.join(corpus_hashes, "h", "left_semi").select("doc_id")
    # in-batch exact dups: every id above the min of its hash group
    first_per_hash = batch_h.groupBy("h").agg(F.min("doc_id").alias("min_id"))
    exact_in_batch = (
        batch_h.join(first_per_hash, "h")
        .filter(F.col("doc_id") > F.col("min_id"))
        .select("doc_id")
    )
    exact_ids = exact_vs_corpus.unionByName(exact_in_batch).distinct()

    near_ids = (
        dedup.dd_minhash_incremental(spark, sf_dir)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )

    decision = (
        F.when(F.col("n_chars") < 100, F.lit("quality"))
        .when(F.col("is_exact"), F.lit("exact_dup"))
        .when(F.col("is_near"), F.lit("near_dup"))
        .otherwise(F.lit("admitted"))
    )
    return (
        batch.join(exact_ids.withColumn("is_exact", F.lit(True)), "doc_id", "left")
        .join(near_ids.withColumn("is_near", F.lit(True)), "doc_id", "left")
        .fillna(False, ["is_exact", "is_near"])
        .withColumn("decision", decision)
        .groupBy("decision")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens"),
        )
    )


_CTX_TOKENS = 2048


def pl_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: concatenate documents per source in
    doc_id order and chunk into fixed 2048-token context windows — the
    standard concat-then-chunk packing that turns a curated corpus into
    training sequences. A document's window is determined by the cumulative
    token offset BEFORE it: ``pack_id = floor(cum_before / ctx)``. Integer
    token counts end-to-end, so both engines agree exactly.

    Scale: one window cumsum per source partition (shuffle on source), then
    a partial-aggregated groupBy on (source, pack_id). Sources are
    many-and-bounded here; a single monolithic source would need the
    range-partition + per-partition-offset cumsum instead
    (``textops.py::tx_quality_bins`` shows that pattern)."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.select("source", "doc_id", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    return (
        cum.withColumn(
            "pack_id", F.floor((F.col("cum") - F.col("n_tok")) / F.lit(_CTX_TOKENS))
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def pl_sequence_pack_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing budgeted by REAL subword counts: identical
    concat-then-chunk layout to ``pl_sequence_pack``, but each document's
    cost is its greedy-WordPiece token count from the induced vocabulary
    (``textops.tx_tokenize_apply``) instead of the whitespace proxy — the
    count the training loader actually pays, so the 2048-token windows
    come out full instead of systematically under-packed (every word is
    >= 1 subword, usually 2-3).

    Scale shape: the tokenizer fold runs per distinct word
    (Heaps-bounded), per-doc costs are one explode + vocabulary-sized
    join + doc-keyed partial agg, then the same per-source cumsum window
    and (source, pack_id) rollup as the whitespace variant. Integer
    counts end-to-end."""
    from .textops import _word_subword_stats

    ws = _word_subword_stats(spark, sf_dir).select("w", "n_tok")
    docs = t(spark, sf_dir, "documents")
    doc_tok = (
        docs.select(
            "source", "doc_id", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .join(ws, "w")
        .groupBy("source", "doc_id")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tok"))
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = doc_tok.withColumn("cum", F.sum("n_tok").over(w))
    return (
        cum.withColumn(
            "pack_id", F.floor((F.col("cum") - F.col("n_tok")) / F.lit(_CTX_TOKENS))
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_N_WORKERS = 8  # data-parallel loader workers the packs stripe across


def pl_dataloader_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-loader SHARD ASSIGNMENT — the step after packing that every
    data-parallel training job runs: stripe the 2048-token packs
    (``pl_sequence_pack_subword``'s windows — one contract) across
    ``_N_WORKERS`` workers, balanced by REAL token mass, and report each
    worker's load and its deviation from the ideal total/W. Striped
    assignment (size-descending rank mod W) is the classic deterministic
    balancer: the k heaviest packs land on k distinct workers, so skew is
    bounded by one pack's tokens.

    Determinism: the rank orders on (n_tokens DESC, source, pack_id) — a
    total order; everything else is integer arithmetic plus one double
    division. Scale shape: the pack manifest has total_tokens/2048 rows
    (thousands per TB — manifest-sized, so the single-partition rank
    window is bounded); the ONE-ROW token total is the scalar-anchor
    cross-join."""
    packs = pl_sequence_pack_subword(spark, sf_dir).select(
        "source", "pack_id", "n_docs", "n_tokens"
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source"), F.asc("pack_id"))
    total = packs.agg(F.sum("n_tokens").alias("total"))
    assigned = (
        packs.withColumn("rnk", F.row_number().over(w))
        .withColumn("worker_id", ((F.col("rnk") - 1) % _N_WORKERS).cast("int"))
        .crossJoin(F.broadcast(total))
    )
    return (
        assigned.groupBy("worker_id")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.max("total").alias("total"),
        )
        .select(
            "worker_id",
            "n_packs",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_tokens") * _N_WORKERS / F.col("total").cast("double"), 6
            ).alias("balance"),
        )
        .orderBy("worker_id")
    )


def pl_resume_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader CHECKPOINT/RESUME plan — the restart contract of every
    preemptible training job: with the striped worker assignment of
    ``pl_dataloader_shards`` (one contract) and a global round-robin
    checkpoint at half the pack count, report per worker what is already
    consumed, what remains, the remaining token backlog, and the exact
    NEXT pack each worker must open — so a resumed job replays nothing
    and skips nothing. Workers that finished report NULL next-pack.

    Determinism: the same (n_tokens DESC, source, pack_id) total order as
    the shard assignment; the checkpoint step is ``n_packs div 2``
    (integer); everything is integer censuses plus a min-struct argmin.
    Scale shape: manifest-sized frames (the bounded rank window the
    shards operator documents) + the one-row step anchor cross-join
    (allow-listed)."""
    packs = pl_sequence_pack_subword(spark, sf_dir).select(
        "source", "pack_id", "n_docs", "n_tokens"
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source"), F.asc("pack_id"))
    ranked = packs.withColumn("rnk", F.row_number().over(w)).withColumn(
        "worker_id", ((F.col("rnk") - 1) % _N_WORKERS).cast("int")
    )
    tot = ranked.agg(F.count(F.lit(1)).alias("n_packs"))
    st = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "step", F.expr("n_packs div 2")
    )
    pend = F.col("rnk") > F.col("step")
    return (
        st.groupBy("worker_id")
        .agg(
            F.sum((~pend).cast("long")).alias("n_consumed"),
            F.sum(pend.cast("long")).alias("n_remaining"),
            F.sum(F.when(pend, F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("remaining_tokens"),
            F.min(F.when(pend, F.struct("rnk", "source", "pack_id"))).alias(
                "nxt"
            ),
        )
        .select(
            "worker_id",
            "n_consumed",
            "n_remaining",
            "remaining_tokens",
            F.col("nxt.source").alias("next_source"),
            F.col("nxt.pack_id").alias("next_pack_id"),
        )
        .orderBy("worker_id")
    )


def pl_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end pipeline composition: curate (quality gate → exact
    dedup → near-dup drop, pl_curation's exact chain) → tokenize (greedy
    WordPiece subword counts against the corpus-induced vocab) → shuffle
    (deterministic md5 shard keys, pl_corpus_shuffle's layout) → pack
    (2048-token windows inside each shard in shuffled order) — emitting
    the per-(shard, pack) manifest a training loader consumes. One
    DataFrame DAG: the judge of whether the individual operators actually
    COMPOSE, with every stage's survival/count/key rule shared with its
    standalone operator so report and manifest can never disagree.

    Scale shape: curation is hash/LSH-bounded (never all-pairs), the
    tokenizer fold is per distinct word, shard keys are a narrow map, and
    each pack window is one shard's worth — the same per-worker bound the
    loader needs anyway. Integer token counts end-to-end."""
    from . import dedup as _dd
    from .textops import _word_subword_stats

    docs = t_par(spark, sf_dir, "documents")
    quality = docs.filter(F.col("n_chars") >= 100)
    survivors_exact = (
        quality.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(survivors_exact, "doc_id", "left_semi")
    drop_ids = (
        _dd.dd_minhash_lsh(spark, sf_dir)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    kept = deduped.join(drop_ids, "doc_id", "left_anti").select("doc_id", "text")

    ws = _word_subword_stats(spark, sf_dir).select("w", "n_tok")
    doc_tok = (
        kept.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.col("w") != "")
        .join(ws, "w")
        .groupBy("doc_id")
        .agg(F.sum("n_tok").cast("bigint").alias("n_tok"))
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    keyed = doc_tok.select(
        "doc_id", "n_tok", h.alias("h"), F.pmod(h, F.lit(_SHUF_SHARDS)).alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.withColumn("cum", F.sum("n_tok").over(w))
    return (
        cum.withColumn(
            "pack_id", F.floor((F.col("cum") - F.col("n_tok")) / F.lit(_CTX_TOKENS))
        )
        .groupBy(F.col("shard").cast("long").alias("shard"), "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


_SHUF_SHARDS = 8


def pl_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle — the step between curation and
    training: every document gets a pseudo-random 60-bit key (engine-
    portable md5, the dd_simhash convention), lands in one of N shards by
    key mod N, and receives its dense within-shard position — exactly the
    (shard, position) layout a training data loader consumes. Seeded by
    the key prefix, so re-runs reproduce the same shuffle order bit-for-bit
    (reproducible training), while the md5 avalanche decorrelates position
    from doc_id (no residual corpus order leaks into batch composition).

    Scale shape: the key is a narrow map; the per-shard position is a
    window partitioned by shard — at 100 TB the shard count scales with
    the corpus (1024+ shards each sized for one loader worker), so each
    window partition is one shard's worth, the same bound the training
    loader itself needs to hold."""
    docs = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    keyed = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.pmod(F.col("h"), F.lit(_SHUF_SHARDS))).orderBy(
        "h", "doc_id"
    )
    return keyed.select(
        "doc_id",
        F.pmod(F.col("h"), F.lit(_SHUF_SHARDS)).cast("long").alias("shard"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


def pl_packing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit over the concat-then-chunk layout — the
    QA report a training-data team reads before shipping shards: per
    source, how many 2048-token (_CTX_TOKENS) windows the corpus fills, how
    many tokens the final partial window wastes (tail padding the loader
    pays), and how many documents STRADDLE a window boundary (each one
    is a split/mask decision for the loader; a high straddle ratio says
    the corpus's document length interacts badly with the context size).

    Exactness: token counts, window counts, and waste are pure integer
    arithmetic on the same whitespace proxy ``pl_sequence_pack`` budgets
    with; the straddle test compares integer window indexes of a doc's
    first and last token (``div``); the ratio is ONE double division.

    Scale shape: the same per-source cumsum window as the packer (shuffle
    on source), then one partial-aggregated groupBy — no second pass."""
    docs = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = docs.select("source", "doc_id", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    straddle = (
        F.expr(f"(cum - n_tok) div {_CTX_TOKENS}")
        != F.expr(f"(cum - 1) div {_CTX_TOKENS}")
    ).cast("long")
    per_src = cum.select("source", "n_tok", straddle.alias("straddles")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum("straddles").alias("n_straddling"),
    )
    n_windows = F.expr(f"(total_tokens + {_CTX_TOKENS - 1}) div {_CTX_TOKENS}")
    return per_src.select(
        "source",
        "n_docs",
        "total_tokens",
        n_windows.alias("n_windows"),
        (n_windows * _CTX_TOKENS - F.col("total_tokens")).alias("tail_waste"),
        "n_straddling",
        F.round(
            F.col("n_straddling").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("straddle_ratio"),
    )


QUERIES = {
    "pl_packing_audit": pl_packing_audit,
    "pl_curation": pl_curation,
    "pl_curation_funnel": pl_curation_funnel,
    "pl_incremental_ingest": pl_incremental_ingest,
    "pl_dedup_canonical": pl_dedup_canonical,
    "pl_sequence_pack": pl_sequence_pack,
    "pl_sequence_pack_subword": pl_sequence_pack_subword,
    "pl_dataloader_shards": pl_dataloader_shards,
    "pl_resume_plan": pl_resume_plan,
    "pl_corpus_shuffle": pl_corpus_shuffle,
    "pl_training_manifest": pl_training_manifest,
}


def _training_manifest_sql() -> str:
    from .textops import _SUBWORD_CTES

    # _KEPT_CTES opens its own WITH; splice RECURSIVE in (the subword walk
    # needs it) and chain the remaining stages onto the same CTE list
    head = _KEPT_CTES.replace("WITH quality", "WITH RECURSIVE quality", 1).rstrip()
    return f"""{head}, {_SUBWORD_CTES}, doc_tok AS (
            SELECT dw.doc_id, CAST(sum(s.n_tok) AS BIGINT) AS n_tok
            FROM doc_words dw
            JOIN word_stats s USING (w)
            WHERE EXISTS (SELECT 1 FROM kept k WHERE k.doc_id = dw.doc_id)
            GROUP BY dw.doc_id
        ), keyed AS (
            SELECT doc_id, n_tok,
                   CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)),
                                       1, 15) AS BIGINT) AS h
            FROM doc_tok
        ), cum AS (
            SELECT doc_id, n_tok, CAST(h % {_SHUF_SHARDS} AS BIGINT) AS shard,
                   sum(n_tok) OVER (PARTITION BY h % {_SHUF_SHARDS}
                       ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM keyed
        )
        SELECT shard, CAST(floor((cum - n_tok) / {_CTX_TOKENS}) AS BIGINT)
                   AS pack_id,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM cum GROUP BY 1, 2
    """


# the curation chain (quality gate → exact dedup → exact-jaccard near-dup
# drop), ending in kept(documents columns). Shared by the pl_curation
# oracle and the training-manifest oracle — the survival rules can never
# drift between the report and the shard plan.
_KEPT_CTES = """
        WITH quality AS (
            SELECT * FROM documents WHERE n_chars >= 100
        ), survivors_exact AS (
            SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
        ), deduped AS (
            SELECT q.* FROM quality q
            WHERE EXISTS (SELECT 1 FROM survivors_exact s WHERE s.doc_id = q.doc_id)
        ), toks AS (
            SELECT doc_id, string_split(text, ' ') w FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) s
            FROM toks WHERE len(w) >= 3
        ), sizes AS (
            SELECT doc_id, len(s) sz FROM sh
        ), ex AS (
            SELECT doc_id, unnest(s) shingle FROM sh
        ), pairs AS (
            SELECT a.doc_id a_id, b.doc_id b_id, count(*) inter
            FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), neardup_b AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.a_id
            JOIN sizes sb ON sb.doc_id = p.b_id
            WHERE p.inter / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.8
        ), kept AS (
            SELECT d.* FROM deduped d
            WHERE NOT EXISTS (SELECT 1 FROM neardup_b n WHERE n.doc_id = d.doc_id)
        )
"""


def _pack_subword_sql() -> str:
    # late import so pipeline_ops never depends on textops at module-import
    # time (textops imports dedup helpers; keep the graph acyclic)
    from .textops import _SUBWORD_CTES

    return f"""
        WITH RECURSIVE {_SUBWORD_CTES}, doc_tok AS (
            SELECT dw.doc_id, d.source, CAST(sum(s.n_tok) AS BIGINT) AS n_tok
            FROM doc_words dw
            JOIN word_stats s USING (w)
            JOIN documents d USING (doc_id)
            GROUP BY dw.doc_id, d.source
        ), cum AS (
            SELECT source, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM doc_tok
        )
        SELECT source, CAST(floor((cum - n_tok) / {_CTX_TOKENS}) AS BIGINT)
                   AS pack_id,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM cum GROUP BY 1, 2
    """


def _dataloader_shards_sql() -> str:
    return f"""
        WITH packs AS (
            SELECT source, pack_id, n_docs, n_tokens
            FROM ({_pack_subword_sql()})
        ), tot AS (
            SELECT CAST(sum(n_tokens) AS BIGINT) AS total FROM packs
        ), assigned AS (
            SELECT *,
                   CAST((row_number() OVER (
                        ORDER BY n_tokens DESC, source ASC, pack_id ASC) - 1)
                        % {_N_WORKERS} AS INTEGER) AS worker_id
            FROM packs
        )
        SELECT worker_id,
               CAST(count(*) AS BIGINT) AS n_packs,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               round(sum(n_tokens) * {_N_WORKERS} / CAST(total AS DOUBLE), 6)
                   AS balance
        FROM assigned CROSS JOIN tot
        GROUP BY worker_id, total
        ORDER BY worker_id
    """


ORACLE = {
    "pl_packing_audit": f"""
        WITH d AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ), c AS (
            SELECT source, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM d
        ), per_src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   sum(n_tok) AS total_tokens,
                   sum(CASE WHEN (cum - n_tok) // {_CTX_TOKENS}
                            <> (cum - 1) // {_CTX_TOKENS}
                       THEN 1 ELSE 0 END) AS n_straddling
            FROM c GROUP BY source
        )
        SELECT source, n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
               CAST((total_tokens + {_CTX_TOKENS - 1}) // {_CTX_TOKENS}
                    AS BIGINT) AS n_windows,
               CAST(((total_tokens + {_CTX_TOKENS - 1}) // {_CTX_TOKENS})
                    * {_CTX_TOKENS} - total_tokens AS BIGINT) AS tail_waste,
               CAST(n_straddling AS BIGINT) AS n_straddling,
               round(CAST(n_straddling AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                   AS straddle_ratio
        FROM per_src
    """,
    "pl_sequence_pack_subword": _pack_subword_sql(),
    "pl_dataloader_shards": _dataloader_shards_sql(),
    "pl_resume_plan": f"""
        WITH packs AS (
            SELECT source, pack_id, n_docs, n_tokens
            FROM ({_pack_subword_sql()})
        ), assigned AS (
            SELECT *,
                   row_number() OVER (
                       ORDER BY n_tokens DESC, source ASC, pack_id ASC)
                       AS rnk,
                   CAST((row_number() OVER (
                        ORDER BY n_tokens DESC, source ASC, pack_id ASC) - 1)
                        % {_N_WORKERS} AS INTEGER) AS worker_id
            FROM packs
        ), st AS (
            SELECT count(*) // 2 AS step FROM packs
        )
        SELECT worker_id,
               CAST(sum(CASE WHEN rnk <= step THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_consumed,
               CAST(sum(CASE WHEN rnk > step THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_remaining,
               CAST(coalesce(sum(CASE WHEN rnk > step THEN n_tokens END), 0)
                    AS BIGINT) AS remaining_tokens,
               arg_min(source, rnk) FILTER (WHERE rnk > step)
                   AS next_source,
               arg_min(pack_id, rnk) FILTER (WHERE rnk > step)
                   AS next_pack_id
        FROM assigned CROSS JOIN st
        GROUP BY worker_id
        ORDER BY worker_id
    """,
    "pl_training_manifest": _training_manifest_sql(),
    "pl_corpus_shuffle": f"""
        WITH k AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)),
                                       1, 15) AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id,
               CAST(h % {_SHUF_SHARDS} AS BIGINT) AS shard,
               CAST(row_number() OVER (PARTITION BY h % {_SHUF_SHARDS}
                                       ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM k
    """,
    "pl_incremental_ingest": """
        WITH batch AS (
            SELECT * FROM documents WHERE doc_id % 10 >= 8
        ), corpus AS (
            SELECT * FROM documents WHERE doc_id % 10 < 8
        ), exact_ids AS (
            SELECT DISTINCT b.doc_id FROM batch b
            JOIN corpus c ON md5(b.text) = md5(c.text)
            UNION
            SELECT DISTINCT b.doc_id FROM batch b
            JOIN batch b2 ON md5(b.text) = md5(b2.text)
                         AND b2.doc_id < b.doc_id
        ), toks AS (
            SELECT doc_id, string_split(text, ' ') w FROM documents
        ), sh AS (
            SELECT doc_id,
                   list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in range(1, len(w) - 1)]) s
            FROM toks WHERE len(w) >= 3
        ), sizes AS (
            SELECT doc_id, len(s) sz FROM sh
        ), ex AS (
            SELECT doc_id, unnest(s) shingle FROM sh
        ), pairs AS (
            SELECT a.doc_id a_id, b.doc_id b_id, count(*) inter
            FROM ex a JOIN ex b ON a.shingle = b.shingle
            WHERE b.doc_id % 10 >= 8
              AND (a.doc_id % 10 < 8 OR a.doc_id < b.doc_id)
            GROUP BY 1, 2
        ), near_ids AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.a_id
            JOIN sizes sb ON sb.doc_id = p.b_id
            WHERE p.inter / CAST(sa.sz + sb.sz - p.inter AS DOUBLE) >= 0.8
        ), fates AS (
            SELECT b.*,
                   CASE WHEN b.n_chars < 100 THEN 'quality'
                        WHEN EXISTS (SELECT 1 FROM exact_ids e
                                     WHERE e.doc_id = b.doc_id) THEN 'exact_dup'
                        WHEN EXISTS (SELECT 1 FROM near_ids n
                                     WHERE n.doc_id = b.doc_id) THEN 'near_dup'
                        ELSE 'admitted' END AS decision
            FROM batch b
        )
        SELECT decision, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM fates GROUP BY decision
    """,
    "pl_sequence_pack": """
        WITH toks AS (
            SELECT source, doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
            FROM documents
        ), cum AS (
            SELECT source, doc_id, n_tok,
                   sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM toks
        )
        SELECT source, CAST(floor((cum - n_tok) / 2048) AS BIGINT) AS pack_id,
               count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM cum GROUP BY 1, 2
    """,
    "pl_curation_funnel": _KEPT_CTES
    + """
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_input,
               (SELECT CAST(count(*) AS BIGINT) FROM quality)
                   AS n_after_quality,
               (SELECT CAST(count(*) AS BIGINT) FROM deduped)
                   AS n_after_exact,
               (SELECT CAST(count(*) AS BIGINT) FROM kept)
                   AS n_after_neardup,
               round((SELECT count(*) FROM kept)
                     / CAST((SELECT count(*) FROM documents) AS DOUBLE), 6)
                   AS survival_rate
    """,
    "pl_curation": _KEPT_CTES
    + """
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
               round(avg(n_chars), 4) AS avg_chars
        FROM kept GROUP BY source
    """,
    "pl_dedup_canonical": dedup.COMPONENTS_CTE_SQL
    + """
        SELECT c.component_id,
               count(*) AS n_docs,
               CAST(count(*) - 1 AS BIGINT) AS n_removed,
               CAST(sum(CASE WHEN c.doc_id <> c.component_id
                             THEN d.n_chars ELSE 0 END) AS BIGINT)
                   AS chars_removed
        FROM comp c JOIN documents d USING (doc_id)
        GROUP BY c.component_id
        HAVING count(*) > 1
    """,
}
