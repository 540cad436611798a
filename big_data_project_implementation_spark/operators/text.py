"""Text-analysis operators for training-data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no Python
UDFs anywhere, so they run at scan throughput on any corpus size.

- tokenization + token counting (whitespace and BPE-ish regex)
- quality scoring (length / punctuation / stopword / repetition ratios)
- language identification (stopword-profile n-gram heuristic)
- document fingerprinting (rolling/content hash)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from big_data_project_implementation_spark.operators.dedup import _spread

# Tiny per-language stopword profiles for the heuristic language ID.
# Real pipelines plug in fastText/CLD3 via mapInPandas (see multimodal
# stubs); the heuristic keeps everything JVM-side and deterministic.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "en", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "in", "zu"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

# BPE-ish token regex: runs of word chars OR single non-space symbols —
# approximates subword segmentation cheaply.
BPE_TOKEN_RE = r"[A-Za-z0-9_]+|[^\sA-Za-z0-9_]"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens."""
    return F.split(text, r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-ish regex tokens (subword-cost proxy)."""
    col = F.col(text) if isinstance(text, str) else text
    # regexp_count keeps this JVM-side; a real tokenizer would be a
    # pandas_udf over mapInPandas.
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("bigint")


def punct_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    words = STOPWORD_PROFILES[lang]
    toks = tokens(F.lower(text) if isinstance(text, str) else F.lower(text))
    hits = F.size(F.filter(toks, lambda w: w.isin(*words)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def repetition_ratio(text: Column | str) -> Column:
    """1 - distinct/total tokens: high value → boilerplate/spam."""
    toks = tokens(text)
    return F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(
        F.size(toks), F.lit(1)
    )


def mean_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: penalize extreme length, high
    punctuation, and heavy repetition. Deterministic, expression-only."""
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col).cast("double")
    length_ok = F.when((n >= 20) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))
    rep_ok = F.lit(1.0) - repetition_ratio(col)
    return (length_ok * 0.3 + punct_ok * 0.3 + rep_ok * 0.4).cast("double")


def stopword_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens in ``words``. NB: pyspark higher-order lambdas
    must take exactly the declared params (element[, index]) — closures
    via helper functions like this one, never default args."""
    return F.size(F.filter(toks, lambda w: w.isin(*words)))


def language_scores(text: Column | str) -> Column:
    """Map lang → stopword-hit count (the raw language-ID signal)."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in STOPWORD_PROFILES]),
        F.array(
            *[stopword_hits(toks, words) for words in STOPWORD_PROFILES.values()]
        ),
    )


def detect_language(text: Column | str) -> Column:
    """argmax over language_scores; 'und' when nothing matches."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    scored = F.array(
        *[
            F.struct(
                stopword_hits(toks, words).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in STOPWORD_PROFILES.items()
        ]
    )
    best = F.array_max(scored)
    return F.when(best.getField("hits") > 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint(text: Column | str, normalize: bool = True) -> Column:
    """64-bit content fingerprint for exact dedup at scale.

    Normalization (lowercase, collapse whitespace) before hashing makes
    the fingerprint robust to trivial formatting diffs. xxhash64 is the
    JVM-side vectorized hash (no Python)."""
    col = F.col(text) if isinstance(text, str) else text
    if normalize:
        col = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(col)


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full stat block — one projection, zero shuffles."""
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(repetition_ratio(text_col), 6).alias("repetition_ratio"),
        F.round(mean_token_len(text_col), 6).alias("mean_token_len"),
        F.round(quality_score(text_col), 6).alias("quality"),
        detect_language(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def pipe_transform(
    df: DataFrame,
    command: list[str],
    input_col: str = "text",
    output_col: str = "piped",
    batch_size: int = 1000,
) -> DataFrame:
    """Pipe a string column through an external command, line-per-row —
    ScriptTransformation / Hive TRANSFORM / RDD.pipe parity (reference
    sql/hive/.../execution/ScriptTransformation.scala and
    core/.../rdd/PipedRDD; SURVEY §2.9).

    Modern shape: ``mapInPandas`` launches the subprocess once per
    Arrow batch on the executor — no Python row loop, no driver
    involvement. Newlines in values are escaped so row alignment
    survives the line protocol."""
    import subprocess

    from pyspark.sql.types import StringType, StructField, StructType

    in_schema = df.schema
    out_schema = StructType(list(in_schema) + [StructField(output_col, StringType())])

    def run(batches):
        for pdf in batches:
            lines = (
                pdf[input_col]
                .fillna("")
                .str.replace("\\", "\\\\", regex=False)
                .str.replace("\n", "\\n", regex=False)
            )
            proc = subprocess.run(
                command,
                input=("\n".join(lines) + "\n").encode("utf-8"),
                capture_output=True,
                check=True,
            )
            out_lines = proc.stdout.decode("utf-8").split("\n")
            if out_lines and out_lines[-1] == "":
                out_lines.pop()
            if len(out_lines) != len(pdf):
                raise ValueError(
                    f"pipe command {command!r} returned {len(out_lines)} lines "
                    f"for {len(pdf)} input rows — not line-aligned"
                )
            pdf = pdf.copy()
            pdf[output_col] = out_lines
            yield pdf

    return df.mapInPandas(run, out_schema)


# --- cleaning / curation (C4- and Gopher-style corpus prep) ----------

# Deliberately simple, cross-engine-identical patterns (Java regex and
# DuckDB RE2 agree on this subset) so the scrub is oracle-checkable.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
}


def scrub_pii(text: Column | str) -> Column:
    """Redact emails then URLs with typed placeholder tokens.

    Expression-only (two chained regexp_replace): scan-throughput on a
    100 TB corpus, no Python. Real pipelines extend PII_PATTERNS (phone
    formats, id numbers) the same way; order matters — emails first so
    mailto:-style overlaps resolve deterministically."""
    col = F.col(text) if isinstance(text, str) else text
    col = F.regexp_replace(col, PII_PATTERNS["email"], "<EMAIL>")
    return F.regexp_replace(col, PII_PATTERNS["url"], "<URL>")


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind redaction counts (regexp_count, JVM-side)."""
    col = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("bigint")
        for kind, pat in PII_PATTERNS.items()
    }


#: Gopher-ish keep rules over the with_text_stats() columns, evaluated
#: in order; a doc's ``drop_reason`` is the FIRST failed rule (null =
#: keep). Thresholds follow Rae et al. 2021 (Gopher §A1.1) adapted to
#: whitespace tokens.
QUALITY_RULES: tuple[tuple[str, str], ...] = (
    ("too_short", "n_tokens < 3"),
    ("too_long", "n_tokens > 100000"),
    ("token_len_out_of_range", "mean_token_len < 2 OR mean_token_len > 12"),
    ("too_much_punct", "punct_ratio > 0.3"),
    ("too_repetitive", "repetition_ratio > 0.5"),
)


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based quality filter: adds stats columns plus ``keep`` /
    ``drop_reason``. Single projection over the scan — rules are a
    CASE chain, so filtering 100 TB is pure codegen with zero shuffles;
    the keep-predicate pushes into the scan when selected on."""
    out = with_text_stats(df, text_col=text_col)
    reason = F.lit(None).cast("string")
    for name, cond in reversed(QUALITY_RULES):
        reason = F.when(F.expr(cond), F.lit(name)).otherwise(reason)
    return out.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def hash_split(
    id_col: Column | str,
    train: int = 12,
    val: int = 2,
    seed: str = "",
) -> Column:
    """Deterministic train/val/test assignment from the id alone.

    md5 (identical across engines, unlike xxhash64/DuckDB-hash) of the
    id's string form, first hex nibble bucketed 16 ways:
    [0,train) -> 'train', [train,train+val) -> 'val', rest 'test'.
    Stable under re-runs, resharding, and engine swap — membership is a
    pure function of the id, never of partition layout or sampling
    state. ``seed`` salts the hash to draw a fresh split."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    nibble = F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(seed))), 1, 1), 16, 10
    ).cast("int")
    return (
        F.when(nibble < F.lit(train), F.lit("train"))
        .when(nibble < F.lit(train + val), F.lit("val"))
        .otherwise(F.lit("test"))
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train: int = 12,
    val: int = 2,
    seed: str = "",
) -> DataFrame:
    """Train/val/test assignment keyed on the normalized CONTENT
    fingerprint instead of the id: every doc whose normalized text is
    byte-identical lands in the same split by construction, so exact
    duplicates can never straddle the train/test boundary — the
    classic eval-leakage failure of id-keyed splits (duplicate docs
    get independent ids, id-hash scatters them across splits, and the
    test set silently contains training text).

    Returns (id, content_fp, split); split = ``hash_split`` over the
    fingerprint, so it inherits the same engine/partition/reshard
    invariance. For NEAR-dup safety, key on the dedup cluster
    representative instead: join ``dedup.assign_dedup_clusters`` and
    pass its survivor id through ``hash_split`` — same no-straddle
    guarantee, cluster-granular (pytest demonstrates the composition).

    Scale shape: one codegen projection — no shuffle, no state; the
    fingerprint reuses exact_dedup's normalization so "same content"
    means the same thing in both operators."""
    from big_data_project_implementation_spark.operators.dedup import _norm

    fp = F.md5(_norm(F.col(text_col)))
    return df.select(
        F.col(id_col),
        fp.alias("content_fp"),
        hash_split(fp, train=train, val=val, seed=seed).alias("split"),
    )


def pack_sequences(
    df: DataFrame,
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    partition_col: Column | str | None = None,
) -> DataFrame:
    """Sequence packing: assign docs (in ``order_col`` order) to
    fixed-token-budget packs — ``pack_id`` = which context-window bin
    the doc starts in, by running token count. Deterministic streaming
    packing (the common LLM-pretraining concatenation strategy), not
    NP-hard best-fit.

    The running sum is a window over ``partition_col`` when given (one
    pack stream per shard — embarrassingly parallel, the 100 TB shape);
    the unpartitioned form is for bounded groups only, same caveat as
    any global window."""
    w = (
        Window.partitionBy(partition_col)
        if partition_col is not None
        else Window.partitionBy()
    ).orderBy(order_col)
    cum_before = (F.sum(tokens_col).over(w) - F.col(tokens_col)).cast("bigint")
    return df.withColumn(
        "pack_id", F.floor(cum_before / F.lit(budget)).cast("bigint")
    ).withColumn("pack_offset", (cum_before % F.lit(budget)).cast("bigint"))


def hash_sample_bucket(id_col: Column | str, seed: str = "") -> Column:
    """256-way deterministic bucket from md5 hex chars 3-4 of the id
    (chars 1-2 would correlate with hash_split's nibble; disjoint
    substrings of md5 are independent for this purpose)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(
        F.substring(F.md5(F.concat(col.cast("string"), F.lit(seed))), 3, 2), 16, 10
    ).cast("bigint")


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum downsampling with a DETERMINISTIC membership
    function: keep a row iff its 256-way id-hash bucket is under
    rate*256 for its stratum. Unlike ``sampleBy`` (partition-order RNG)
    the kept set is a pure function of (id, stratum rates, seed) —
    reproducible across runs, engines, and repartitioning, which is
    what corpus-rebalancing pipelines need for auditability. Rates
    quantize to 1/256 granularity. Pure codegen expressions; the keep
    predicate pushes into the scan when the id/stratum columns do."""
    thresh = F.lit(default_rate * 256).cast("bigint")
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(rate * 256))
        ).otherwise(thresh)
    return df.filter(hash_sample_bucket(id_col, seed=seed) < thresh)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model (add-one smoothing) — the CCNet-style perplexity
    proxy: low scores flag gibberish / OOV-heavy docs, high scores flag
    boilerplate. Two passes, both shuffle-bounded:

    1. vocab: explode tokens -> groupBy(word).count (map-side combined,
       one shuffle; vocabulary-sized result).
    2. score: posting join tokens x vocab on word (at 100 TB the vocab
       side is Zipf-truncated and AQE picks broadcast vs shuffle), then
       one groupBy(doc) for the mean.

    Cross-engine determinism: each log term is cast to DECIMAL before
    the sum — double addition is order-sensitive and partial
    aggregation order differs between engines; decimal addition is
    exact, so the oracle hash cannot flip a low bit."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
    )
    vocab = toks.groupBy("word").agg(F.count("*").alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("total"), F.count("*").alias("v_size")
    )
    scored = (
        toks.join(vocab, "word")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.log((F.col("c") + 1) / (F.col("total") + F.col("v_size")))
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            # floor-rounded like bigram_logprob: ROUND-on-double is
            # half-even in DuckDB vs half-up in Spark at exact …805
            # boundaries
            (
                F.floor((F.sum("lp") / F.count("*")).cast("double") * 1e6 + 0.5)
                / 1e6
            ).alias("mean_logprob"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "mean_logprob")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-document top-``k`` characteristic terms by TF-IDF.

    Rank is integer-deterministic — (tf DESC, doc-frequency ASC, term
    ASC) — never by the float score, so engine-to-engine float noise
    cannot reorder the selected rows; the tfidf double (tf * ln(N/df))
    is reported, rounded to 6.

    Scale shape: two map-side-combined aggregations (doc-term counts,
    then term doc-frequencies over the already-collapsed doc-term
    table), the corpus size N as a one-row broadcast, and a per-doc
    ranking window over the doc partitioning. The shuffle carries
    (doc, term, count) triples — bounded by distinct terms per doc,
    not raw token count."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
    )
    tf = toks.groupBy("id", "word").agg(F.count("*").cast("bigint").alias("tf"))
    dfreq = tf.groupBy("word").agg(F.count("*").cast("bigint").alias("df"))
    n_docs = df.agg(F.count("*").cast("bigint").alias("n"))
    w = Window.partitionBy("id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("word")
    )
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n") / F.col("df")), 6)
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "rank", F.col("word").alias("term"),
            "tf", "df", "tfidf",
        )
    )


def bm25_scores(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document for a bag-of-words query
    (Robertson/Sparck Jones; the standard lexical retrieval scorer).
    Emits only docs matching >= 1 query term.

    Scale shape: the token explode filters to the query's terms
    BEFORE the doc-term aggregation, so the shuffle is bounded by
    |matching docs| x |query terms|; document length and the corpus
    stats (N, avgdl) come from a lengths-only projection (no explode)
    and a one-row broadcast. Per-term contributions are cast to
    DECIMAL before the per-doc sum — double addition is
    order-sensitive and partial aggregation order differs between
    engines; decimal addition is exact, so the score hash cannot flip
    a low bit."""
    # null text must yield null dl (Spark size(null) is -1, which would
    # silently pull avgdl down; DuckDB len(string_split(NULL)) is NULL
    # and SUM skips it — keep both engines on the skip semantics)
    lens = df.select(
        F.col(id_col).alias("id"),
        F.when(
            F.col(text_col).isNotNull(),
            token_count(F.lower(F.col(text_col))),
        ).alias("dl"),
    )
    stats = lens.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
        )
        .filter(F.col("word").isin(*query_terms))
        .groupBy("id", "word")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return (
        tf.join(dfreq, "word")
        .join(lens, "id")
        .crossJoin(F.broadcast(stats))
        .select("id", contrib.cast("decimal(28,10)").alias("c"))
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(F.sum("c").cast("double"), 6).alias("score"),
        )
        .select(F.col("id").alias(id_col), "n_terms", "score")
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Eval-set decontamination: flag training docs sharing any word
    k-gram with a benchmark/eval corpus (the standard n-gram-overlap
    decontamination rule for pretraining data).

    Scale shape: both sides shingle to DISTINCT k-grams, hash to
    8-byte keys (the shuffle carries longs, never gram strings), and
    the left-semi join against the (much smaller, deduped) eval gram
    set does the matching — eval grams broadcast when small, AQE
    decides otherwise. Per-doc counts come from one groupBy; docs with
    zero hits are restored by a left join so EVERY doc gets a row."""
    from big_data_project_implementation_spark.operators.dedup import shingles

    dg = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k)).alias("gram"),
    ).select("id", F.xxhash64("gram").alias("h"))
    eg = (
        eval_df.select(F.explode(shingles(F.col(text_col), k)).alias("gram"))
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
    )
    hits = dg.join(eg, "h", "left_semi").groupBy("id").agg(
        F.count("*").alias("n_hit")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(shingles(F.col(text_col), k)).cast("bigint").alias("n_grams"),
    )
    return (
        base.join(hits, "id", "left")
        .withColumn("n_hit", F.coalesce("n_hit", F.lit(0)).cast("bigint"))
        .withColumn("contaminated", F.col("n_hit") > 0)
        .select(F.col("id").alias(id_col), "n_grams", "n_hit", "contaminated")
    )


def passage_dedup(
    df: DataFrame,
    chunk: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Passage-level dedup (CCNet/RefinedWeb style, adapted to token
    chunks): split each document into non-overlapping ``chunk``-token
    passages, keep only the globally FIRST occurrence of each distinct
    passage (ordered by (doc_id, position)), and reassemble documents
    from their surviving passages. Boilerplate that repeats across the
    corpus — headers, navboxes, license blocks — vanishes from every
    doc but the first, without dropping whole documents the way
    doc-level dedup does.

    Returns (id, n_chunks, n_kept, dedup_text) — one row per input
    document, docs whose every passage was seen before keep a row with
    n_kept = 0 and empty text.

    Scale shape: one corpus shuffle — passages group by their 8-byte
    content hash with a map-side-combined min(doc, idx) to elect the
    first occurrence (ties impossible: (doc, idx) is unique), then the
    winner set joins back to the passage stream and a second groupBy
    reassembles per doc. Passage hashes + ids cross the wire, passage
    text only moves inside the reassembly groupBy of surviving rows.

    NULL-text documents are excluded entirely (no output row), matching
    the certified oracle's ``WHERE text IS NOT NULL`` base — the
    previous form emitted a (doc, 0, 0, '') row for them
    (``size(NULL) = -1 → ceil(-1/8) = 0``), which agreed with the
    oracle only because the fixture happens to contain no NULLs."""
    df = _spread(df.filter(F.col(text_col).isNotNull()))
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / chunk).cast("int")
    # sequence(0, -1) DESCENDS in Spark — empty docs must yield an
    # empty chunk array, not bogus chunks
    chunks = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * chunk + 1, chunk), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(
        F.col(id_col).alias("id"), F.posexplode(chunks).alias("idx", "passage")
    ).withColumn("h", F.xxhash64("passage"))
    first = ex.groupBy("h").agg(
        F.min(F.struct(F.col("id").alias("d"), F.col("idx").alias("i"))).alias("f")
    )
    kept = ex.join(first, "h").filter(
        (F.col("id") == F.col("f.d")) & (F.col("idx") == F.col("f.i"))
    )
    reassembled = kept.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("dedup_text"),
    )
    base = df.select(F.col(id_col).alias("id"), n_chunks.cast("bigint").alias("n_chunks"))
    return (
        base.join(reassembled, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("dedup_text", F.lit("")).alias("dedup_text"),
        )
    )


def pmi_pairs(
    df: DataFrame,
    window: int = 3,
    top_k: int = 50,
    min_count: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """Top-k word-pair PMI over a skip-gram window — the corpus
    collocation signal (word2vec/GloVe co-occurrence prep, phrase
    mining à la Mikolov et al. 2013): for every ordered token pair
    (a, b) with b at most ``window`` positions after a,
    PMI = ln(c_ab · T / (c_a · c_b)) where T is the total skip-gram
    count. Pairs below ``min_count`` are dropped (PMI of rare pairs is
    noise), survivors rank by PMI.

    Scale shape: skip-gram pairs expand in whole-stage codegen (flatten
    over the token array — no positional self-join), then ONE pair
    groupBy with map-side combine; unigram counts are a second, smaller
    groupBy; both count tables join at vocabulary size (pair-vocab
    bounded, corpus-independent under Zipf for fixed min_count), and
    the total is a 1-row broadcast. No corpus-sized join anywhere."""
    df = _spread(df)
    toks = F.split(F.col(text_col), " ")
    pairs = F.flatten(
        F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.transform(
                    F.sequence(
                        i + 1, F.least(i + window, F.size(toks))
                    ),
                    lambda j: F.struct(
                        F.element_at(toks, i).alias("w1"),
                        F.element_at(toks, j).alias("w2"),
                    ),
                ),
            ),
        ).otherwise(F.array().cast("array<array<struct<w1:string,w2:string>>>"))
    )
    pair_counts = (
        df.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c_pair"))
    )
    # vocabulary-sized and consumed twice (the w1 and w2 count joins):
    # without a checkpoint each join re-runs the corpus-wide token
    # explode + aggregation (round 14, guide §1.2 — the before-plan
    # carried FOUR parquet scans: two skip-gram expansions + two
    # unigram aggregations). One bounded materialization feeds both.
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c_w"))
        .localCheckpoint(eager=True)
    )
    # T = Σ c_pair over ALL pairs ≡ the number of skip-gram slots, a
    # closed form of each doc's token count: Σ_{i=1}^{L-1} min(w, L-i)
    # = L(L-1)/2 when L-1 ≤ w else w(w+1)/2 + (L-1-w)·w. Computing it
    # from lengths replaces the second full skip-gram expansion +
    # aggregation with a scalar codegen scan (round 14, guide §2.2 —
    # shuffle/expand fewer bytes). Exact integer equality with
    # SUM(c_pair): every product stays far inside bigint range.
    L = F.size(toks)
    w = F.lit(window)
    per_doc = (
        F.when(L < 2, F.lit(0).cast("bigint"))
        .when(L - 1 <= w, F.shiftright(L.cast("bigint") * (L - 1), 1))
        .otherwise(
            F.lit(window * (window + 1) // 2).cast("bigint")
            + (L - 1 - w).cast("bigint") * w
        )
    )
    total = df.agg(F.sum(per_doc).cast("double").alias("t"))
    scored = (
        pair_counts.filter(F.col("c_pair") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c_w", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c_w", "c2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "c_pair",
            (
                F.floor(
                    F.log(F.col("c_pair") * F.col("t") / (F.col("c1") * F.col("c2")))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2").limit(top_k)


def contaminated_ids(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """The id-set flavor of :func:`decontaminate`: just the ids of docs
    sharing any word k-gram with the eval corpus, for anti-join
    composition (``df.join(contaminated_ids(...), id, "left_anti")``).

    Skips decontaminate's per-doc hit counts and the left-join restore
    pass — one fewer full consumption of the (possibly expensive)
    upstream ``df`` plan, which matters when ``df`` is itself a
    filter+dedup pipeline. The eval gram set is deduped and explicitly
    broadcast: an eval/benchmark corpus is orders of magnitude smaller
    than the training corpus, so the corpus-side gram stream never
    shuffles — it streams through a broadcast semi-join at scan
    throughput."""
    from big_data_project_implementation_spark.operators.dedup import shingles

    dg = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), k)).alias("gram"),
    ).select(id_col, F.xxhash64("gram").alias("h"))
    eg = (
        eval_df.select(F.explode(shingles(F.col(text_col), k)).alias("gram"))
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
    )
    return dg.join(F.broadcast(eg), "h", "left_semi").select(id_col).distinct()


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "",
    buckets: int = 1,
) -> DataFrame:
    """Deterministic data-mixture sampling: fill each source's token
    budget by taking documents in md5-of-id order until the running
    token total would exceed the budget (greedy prefix; a doc is kept
    iff its own cumulative total still fits). The pretraining
    data-mixing step — "2B tokens of web, 1B of code" — as one
    engine-invariant DataFrame op: md5 ordering (not a RNG) makes the
    kept set reproducible across runs, engines, and partitionings, so
    the sample itself is oracle-certifiable. Sources absent from
    ``budgets`` are dropped.

    Scale shape: one window keyed by source — with few fat sources the
    per-source running sum serializes, so ``buckets=B`` splits every
    source into B md5-sliced sub-partitions with budget/B each
    (parallelism x B, same expected mixture; the greedy boundary doc
    per bucket is the only divergence from B=1). ``seed`` salts the
    order for a fresh draw."""
    bmap = F.create_map(
        *[F.lit(x) for kv in budgets.items() for x in kv]
    )
    ntok = (
        F.when(F.col(text_col).isNotNull(), token_count(F.col(text_col)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(source_col).alias("src"),
        ntok.alias("n_tokens"),
        order.alias("_ord"),
    )
    if buckets > 1:
        # first md5 nibble slices sub-partitions; per-bucket budget
        d = d.withColumn(
            "_bkt", F.conv(F.substring("_ord", 1, 2), 16, 10).cast("int") % buckets
        )
        part, budget = ["src", "_bkt"], F.floor(bmap[F.col("src")] / buckets)
    else:
        part, budget = ["src"], bmap[F.col("src")]
    w = (
        Window.partitionBy(*part)
        .orderBy("_ord", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select(
            F.col("id").alias(id_col),
            F.col("src").alias(source_col),
            "n_tokens",
            "cum_tokens",
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """RAG-style chunking: split each document into fixed-size token
    windows with ``overlap`` tokens of context shared between
    consecutive chunks (stride = chunk_tokens - overlap; the final
    chunk may be short; a doc shorter than one chunk yields one chunk).

    Scale shape: a pure per-row explode — zero shuffles, predicate
    and column pruning reach the scan untouched, and the expansion
    factor is bounded by ceil(n_tokens/stride). The chunk text is
    re-materialized with array slices inside codegen; no Python
    touches the hot path."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    d = df.withColumn("_toks", F.split(F.col(text_col), " ")).withColumn(
        "_n", F.size("_toks")
    )
    # n > chunk: 1 first window + ceil((n-chunk)/stride) more;
    # ceil(a/stride) == floor((a+stride-1)/stride) since a >= 1 there
    n_chunks = F.when(F.col("_n") <= chunk_tokens, F.lit(1)).otherwise(
        F.floor(
            (F.col("_n") - chunk_tokens + stride - 1) / F.lit(stride)
        ).cast("int")
        + 1
    )
    start = (F.col("chunk_idx") * stride).cast("int")
    chunk_toks = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return (
        d.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
            ).alias("chunk_idx"),
            "_toks",
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.size(chunk_toks).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(chunk_toks, " ").alias("chunk_text"),
        )
        .orderBy(id_col, "chunk_idx")
    )


def ngram_heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    k: int = 50,
) -> DataFrame:
    """Corpus-wide top-``k`` word ``n``-grams by exact count — the
    boilerplate/template detector that feeds line- and span-level
    curation policies.

    Scale shape: explode n-grams per doc, ONE map-side-combined
    groupBy on the gram, TakeOrderedAndProject for the top-k (no
    global sort). The shuffle carries (gram, partial_count) pairs —
    bounded by distinct-gram cardinality per task, not corpus size.
    Deterministic tie-break: (count DESC, gram ASC)."""
    gram_i = "concat(" + ", ' ', ".join(
        f"element_at(_toks, i + {j})" for j in range(n)
    ) + ")"
    grams = F.expr(
        f"transform(sequence(1, size(_toks) - {n - 1}), i -> {gram_i})"
    )
    d = df.withColumn("_toks", F.split(F.col(text_col), " "))
    return (
        d.select(
            F.explode(
                F.when(F.size("_toks") >= n, grams).otherwise(
                    F.array().cast("array<string>")
                )
            ).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(k)
    )


def strip_top_df_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 10,
) -> DataFrame:
    """Corpus-driven stopword stripping: learn the ``top_n`` terms by
    DOCUMENT frequency (distinct docs containing the term, tie-break
    term ASC), then remove every occurrence from every doc, preserving
    the order and multiplicity of the surviving tokens.

    Scale shape: the df-ranking is a distinct (doc, term) projection +
    one map-side-combined groupBy on term; the ``top_n`` list is a
    1-row array broadcast onto the corpus, where the strip itself is a
    JVM higher-order ``filter`` inside codegen — the corpus never
    shuffles and no Python runs. (array_except would dedup surviving
    tokens; filter + array_contains keeps multiplicity.)"""
    toks = df.withColumn("_toks", F.split(F.col(text_col), " "))
    dfreq = (
        toks.select(id_col, F.explode("_toks").alias("term"))
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(top_n)
    )
    sw = dfreq.agg(F.sort_array(F.collect_list("term")).alias("_sw"))
    kept = F.filter(
        "_toks", lambda t: ~F.array_contains(F.col("_sw"), t)
    )
    return (
        toks.join(F.broadcast(sw))
        .select(
            id_col,
            F.size(kept).cast("bigint").alias("n_kept"),
            F.array_join(kept, " ").alias("stripped"),
        )
        .orderBy(id_col)
    )


def word_ngrams(toks_col: str, n: int) -> Column:
    """Word ``n``-grams of a tokens-array column (empty array when the
    doc is shorter than ``n``) — pure codegen expressions."""
    gram_i = "concat(" + ", ' ', ".join(
        f"element_at({toks_col}, i + {j})" for j in range(n)
    ) + ")"
    grams = F.expr(
        f"transform(sequence(1, size({toks_col}) - {n - 1}), i -> {gram_i})"
    )
    return F.when(F.size(toks_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """Gopher-style per-document repetition signals: the duplicate
    2-gram fraction (1 - distinct/total), the share of 2-gram
    occurrences taken by the single most frequent 2-gram, and the
    fraction of 3-gram occurrences belonging to 3-grams repeated
    within the doc — the standard boilerplate/template filters for
    pretraining corpora (Rae et al., Gopher §A1.1).

    Scale shape: explode both gram sizes in one pass (union with an
    ``n`` tag), hash grams to 8-byte keys, then TWO map-side-combined
    groupBys — (doc, n, gram) counts, then (doc, n) stats — so the
    shuffles carry longs and partial counts, never gram strings. Docs
    too short for any gram are restored by a broadcastable left join
    and report zero fractions."""
    d = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    occ = None
    for n in (2, 3):
        o = d.select(
            "id",
            F.lit(n).alias("n"),
            F.explode(word_ngrams("_toks", n)).alias("gram"),
        )
        occ = o if occ is None else occ.unionByName(o)
    per_gram = occ.select(
        "id", "n", F.xxhash64("gram").alias("h")
    ).groupBy("id", "n", "h").agg(F.count("*").alias("cnt"))
    per_n = per_gram.groupBy("id", "n").agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("top"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("dup"),
    )
    stats = per_n.groupBy("id").agg(
        *[
            F.max(F.when(F.col("n") == n, F.col(c))).alias(f"{c}{n}")
            for n in (2, 3)
            for c in ("total", "n_distinct", "top", "dup")
        ]
    )
    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
    )
    t2, t3 = F.col("total2"), F.col("total3")
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(t2, F.lit(0)).cast("bigint").alias("n2_total"),
            frac(t2 - F.col("n_distinct2"), t2).alias("dup_2gram_frac"),
            frac(F.col("top2"), t2).alias("top_2gram_frac"),
            F.coalesce(t3, F.lit(0)).cast("bigint").alias("n3_total"),
            frac(F.col("dup3"), t3).alias("dup_3gram_frac"),
        )
    )
    return out.orderBy(id_col) if ordered else out


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    ordered: bool = True,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's ``n``-gram
    occurrences whose gram first appears (minimum doc id over the whole
    corpus) in THIS doc — a cheap exact proxy for "how much of this
    document is new text vs already-seen boilerplate" used to rank
    crawl snapshots and dedup incremental dumps.

    Scale shape: grams hash to 8-byte keys; (doc, gram) counts and the
    corpus-wide min-doc table are both map-side-combined groupBys, and
    the join back is on the gram hash — all shuffles carry longs.
    First-occurrence attribution via min(doc_id) is exact and
    associative, so it needs no ordered scan at any scale."""
    d = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_toks")
    )
    occ = d.select("id", F.explode(word_ngrams("_toks", n)).alias("gram"))
    per_gram = occ.select("id", F.xxhash64("gram").alias("h")).groupBy(
        "id", "h"
    ).agg(F.count("*").alias("cnt"))
    first = per_gram.groupBy("h").agg(F.min("id").alias("first_id"))
    per_doc = (
        per_gram.join(first, "h")
        .groupBy("id")
        .agg(
            F.sum("cnt").alias("total"),
            F.sum(
                F.when(F.col("first_id") == F.col("id"), F.col("cnt")).otherwise(0)
            ).alias("novel"),
        )
    )
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("total", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.when(
                    F.col("total") > 0,
                    F.col("novel").cast("double") / F.col("total"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("novelty_frac"),
        )
    )
    return out.orderBy(id_col) if ordered else out


def group_topk_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
    seed: str = "",
) -> DataFrame:
    """Exactly-``k``-per-group deterministic sampling: keep the first
    ``k`` rows of each group in md5-of-id order — the distributed,
    reproducible equivalent of per-group reservoir sampling (uniform
    over the group because md5 order is independent of the data), used
    to draw fixed-size eval/inspection slices per language or source.

    Scale shape: one hash exchange on the group key + a rank inside
    each partition; with heavy groups the window never materializes
    the group (running row_number only). ``seed`` salts the order for
    a fresh draw without touching the data."""
    order = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.select(group_col, id_col)
        .withColumn("rank_in_group", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_group") <= k)
        .orderBy(group_col, "rank_in_group")
    )


def pack_sequences_bfd(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str = "lang",
    budget: int = 2048,
) -> DataFrame:
    """Best-fit-decreasing sequence packing: within each shard, sort
    docs by token count descending and place each into the fullest
    existing pack that still fits, else open a new pack. Tighter than
    ``pack_sequences``' streaming concatenation (fewer packs, less
    padding waste) at the cost of being inherently sequential — so it
    runs per-shard via ``applyInPandas``: the legitimate
    custom-stateful escape hatch (SURVEY §7.3), Arrow-batched, one
    group per language shard, parallel across shards. Deterministic:
    ties in token count break on ``id_col``, and best-fit ties pick
    the lowest pack id.

    Oversized docs (> budget) get a singleton pack. Registered
    rows-only (a stateful loop is not SQL-expressible); invariants —
    budget respected, pack-count lower bound, partitioning
    independence — are pinned in tests/test_round4_ops.py."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, {shard_col} string, {tokens_col} long, "
        "pack_id long, pack_fill long"
    )

    def bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assign: list[int] = []
        for n in pdf[tokens_col]:
            best, best_fill = -1, -1
            for pid, fill in enumerate(fills):
                if fill + n <= budget and fill > best_fill:
                    best, best_fill = pid, fill
            if best < 0:
                fills.append(int(n))
                assign.append(len(fills) - 1)
            else:
                fills[best] += int(n)
                assign.append(best)
        pdf["pack_id"] = assign
        pdf["pack_fill"] = [fills[a] for a in assign]
        return pdf[[id_col, shard_col, tokens_col, "pack_id", "pack_fill"]]

    return (
        df.select(id_col, shard_col, F.col(tokens_col).cast("long"))
        .groupBy(shard_col)
        .applyInPandas(bfd, out_schema)
        .orderBy(shard_col, "pack_id", id_col)
    )


def hashed_linear_quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ordered: bool = True,
) -> DataFrame:
    """FastText-style linear quality classifier at scan throughput:
    score = sigmoid(mean of per-token hashed weights), where each
    token's weight comes from a hash of the token itself — the exact
    inference shape of a hashed-bag-of-words linear model (the standard
    pretraining quality classifier), with the weight table replaced by
    a deterministic hash so the query is engine-reproducible without
    shipping a model artifact. Swap ``_w`` for ``element_at(weights,
    hash)`` against a broadcast weight array to serve a real model —
    the plan is unchanged.

    Scale shape: pure per-row expressions (split, transform, aggregate,
    sigmoid) — zero shuffles, zero Python; runs inside whole-stage
    codegen at the scan's throughput. md5-derived weights (not
    xxhash64) so DuckDB can oracle the identical arithmetic."""
    toks = F.split(F.col(text_col), " ")
    # token weight in integer MILLI-units [-500, 500): first 8 md5 hex
    # chars as an int — integer summation is exact and order-free, so
    # the margin is bit-identical on any engine; only the sigmoid's
    # exp() is libm-dependent (score rounds at 4dp for that reason,
    # margin at 6)
    w = lambda tok: (  # noqa: E731
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % 1000
    ) - 500
    total = F.aggregate(
        F.transform(toks, lambda tok: w(tok)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    margin = total.cast("double") / 1000.0 / F.greatest(F.size(toks), F.lit(1))
    # explicit floor(x*10^d + 0.5)/10^d rounding: ROUND-on-double
    # disagrees between engines exactly on half boundaries
    r6 = F.floor(margin * 1e6 + 0.5) / 1e6
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    out = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        r6.alias("margin"),
        (F.floor(score * 1e4 + 0.5) / 1e4).alias("score"),
    )
    return out.orderBy(id_col) if ordered else out


def temperature_mixture(
    df: DataFrame,
    target_tokens: int,
    alpha_sqrt: bool = True,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/multi-source
    rebalancing rule of mBERT/XLM-R and pretraining mixtures): source
    s with t_s tokens gets target share ∝ t_s^α, here α = 0.5 via
    ``sqrt`` — IEEE-correctly-rounded on every engine, so the computed
    keep-rates are bit-reproducible cross-engine (pow() is not).
    Up-weights the tail, down-weights the head, never upsamples past a
    source's own mass (rate capped at 1).

    Membership is deterministic: per-source keep-rate quantized to
    1/256 and applied through the 256-way md5 id bucket
    (``hash_sample_bucket``) — same auditability contract as
    ``stratified_hash_sample``, but with the rates DERIVED from corpus
    statistics instead of hand-set. Plan shape: one map-side-combined
    per-source token agg (rows = #sources, broadcast back), then a
    pure codegen filter over the corpus — no corpus-keyed shuffle at
    all."""
    ntok = (
        F.when(F.col(text_col).isNotNull(), token_count(F.col(text_col)))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    d = df.withColumn("_ntok", ntok)
    stats = d.groupBy(F.col(source_col).alias("_src")).agg(
        F.sum("_ntok").cast("double").alias("_t")
    )
    tot = stats.agg(F.sum(F.sqrt("_t")).alias("_z"))
    rates = stats.crossJoin(F.broadcast(tot)).select(
        "_src",
        F.least(
            F.lit(1.0),
            F.lit(float(target_tokens)) * F.sqrt("_t") / F.col("_z") / F.col("_t"),
        ).alias("_rate"),
    )
    keep = d.join(
        F.broadcast(rates), d[source_col] == rates["_src"]
    ).filter(
        hash_sample_bucket(id_col, seed=seed)
        < F.floor(F.col("_rate") * 256).cast("bigint")
    )
    return keep.select(
        F.col(id_col),
        F.col(source_col),
        F.col("_ntok").alias("n_tokens"),
        F.floor(F.col("_rate") * 256).cast("bigint").alias("rate_256"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 1000,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: build the top-``vocab_size``
    token vocabulary by document frequency (ties broken token-ASC so
    the vocab is deterministic), then measure per-source OOV — total
    token occurrences, occurrences covered by the vocab, and the OOV
    rate. The pre-tokenizer sanity check a multilingual corpus needs
    before committing to a vocab.

    Plan shape: vocab selection is orderBy+limit → TakeOrderedAndProject
    (per-partition top-V then one V-row merge, never a global sort);
    the vocab then BROADCASTS into the occurrence stream, so the
    corpus-sized pass has no shuffle beyond the final per-source agg
    (rows = #sources)."""
    toks = df.select(
        F.col(source_col).alias("src"),
        F.col("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok") != "")
    doc_freq = (
        toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
    )
    vocab = (
        doc_freq.orderBy(F.desc("df"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy(F.col("src").alias(source_col))
        .agg(
            F.count("*").cast("bigint").alias("total_tokens"),
            F.sum(F.coalesce("_in_vocab", F.lit(0))).cast("bigint").alias("in_vocab"),
        )
        .withColumn(
            "oov_rate",
            F.floor(
                (F.lit(1.0) - F.col("in_vocab") / F.col("total_tokens")) * 1e6
                + 0.5
            )
            / 1e6,
        )
    )


def dsir_importance(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    scale: int = 1_000_000,
) -> DataFrame:
    """DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    Scores every document by how much its token distribution resembles
    a *target* slice of the corpus (``target`` is a boolean Column over
    ``df``, e.g. ``F.col("lang") == "en"``): tokens hash into
    ``buckets`` feature buckets; each bucket gets a smoothed
    target-vs-raw frequency ratio; a document's weight is the mean
    bucket ratio of its tokens. Documents are then kept by importance
    resampling downstream (``token_budget_sample`` /
    ``stratified_hash_sample`` take the score as input).

    DSIR uses the log-ratio; the ratio itself is the same ordering and
    — held in integer micro-units — makes the score exact integer
    arithmetic, bit-identical on any engine and partial-agg order
    (registry float convention). md5-derived bucket ids (not xxhash64)
    so DuckDB can oracle the identical arithmetic.

    Scale shape (100 TB): the token stream never carries text — only
    (id, bucket) pairs. Bucket stats are a ``buckets``-row aggregate
    (map-side combined) broadcast back onto the stream; the only
    corpus-sized shuffle is the final per-document sum, map-side
    combined on the natural document key. Reference parity: feature
    hashing ≈ mllib HashingTF (mllib/src/main/scala/org/apache/spark/
    mllib/feature/HashingTF.scala:1), re-expressed as relational ops.
    """
    toks = df.select(
        F.col(id_col),
        # when/otherwise (not a bare cast): a NULL target predicate must
        # count as non-target, matching the oracle's CASE WHEN
        F.when(target, 1).otherwise(0).alias("_is_target"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    bucketed = toks.select(
        id_col,
        "_is_target",
        (
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint")
            % buckets
        ).alias("_bkt"),
    )
    # buckets-row stats table: +1 add-one smoothing on both counts so
    # empty buckets get weight ~= scale * T/R, never a divide-by-zero
    stats = bucketed.groupBy("_bkt").agg(
        F.count("*").alias("_r_cnt"),
        F.sum("_is_target").alias("_t_cnt"),
    )
    weights = stats.select(
        "_bkt",
        F.expr(f"CAST((_t_cnt + 1) * {scale} DIV (_r_cnt + 1) AS BIGINT)").alias(
            "_w"
        ),
    )
    return (
        bucketed.join(F.broadcast(weights), "_bkt")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("_w").cast("bigint").alias("weight_sum"),
        )
        .withColumn(
            "score",
            F.floor(
                F.col("weight_sum") / F.col("n_tokens") / scale * 1e6 + 0.5
            )
            / 1e6,
        )
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    steps: int = 5,
) -> DataFrame:
    """Distributed BPE vocabulary learning (Sennrich et al. 2016): the
    first ``steps`` merge rules, each step = count adjacent symbol
    pairs over the word-frequency table → argmax (freq desc, pair asc
    tie-break) → apply the merge. Returns (rank, pair, merged, freq).

    The Spark shape that makes BPE tractable at 100 TB: the corpus is
    touched ONCE (word groupBy — the only corpus-sized shuffle); every
    merge iteration then runs on the distinct-word table (vocab-sized,
    millions of rows at worst), localCheckpoint-ed per step so lineage
    stays flat. The argmax pair is never collected to the driver — it
    is a 1-row DataFrame broadcast into a column-argument ``replace``,
    so the whole training loop is declarative.

    Merge application is one left-to-right non-overlapping replace
    scan of the space-separated symbol string (boundary-padded, so a
    pair can never match across symbol boundaries). On runs of the
    merged pair (aaa...) this differs from subword-nmt's re-scan by at
    most the run tail; counts are recomputed from the applied corpus
    each step, so rule ranks stay self-consistent. Reference parity:
    the iterate-small-state-table shape is mllib Word2Vec's vocab
    construction (mllib/src/main/scala/org/apache/spark/mllib/feature/
    Word2Vec.scala:1), re-expressed relationally."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            F.concat(
                F.lit(" "), F.array_join(F.split("w", ""), " "), F.lit(" ")
            ).alias("seq"),
            "n",
        )
        # the corpus pass ends here; everything below is vocab-sized
        .localCheckpoint(eager=True)
    )
    merges: list[DataFrame] = []
    cur = words
    for step in range(1, steps + 1):
        syms = F.split(F.trim(F.col("seq")), " ")
        pairs = (
            cur.select(
                "n",
                F.explode(
                    F.zip_with(
                        syms,
                        F.slice(syms, 2, F.size(syms)),
                        lambda l, r: F.when(r.isNull(), F.lit(None)).otherwise(
                            F.concat(l, F.lit(" "), r)
                        ),
                    )
                ).alias("pair"),
            ).filter(F.col("pair").isNotNull())
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("n").cast("bigint").alias("freq"))
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .withColumn("merged", F.replace(F.col("pair"), F.lit(" "), F.lit("")))
        )
        merges.append(
            top.select(
                F.lit(step).cast("bigint").alias("rank"), "pair", "merged", "freq"
            )
        )
        if step < steps:
            cur = (
                cur.join(F.broadcast(top))
                .select(
                    F.replace(
                        F.col("seq"),
                        F.concat(F.lit(" "), F.col("pair"), F.lit(" ")),
                        F.concat(F.lit(" "), F.col("merged"), F.lit(" ")),
                    ).alias("seq"),
                    "n",
                )
                .localCheckpoint(eager=True)
            )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out.orderBy("rank")


def bigram_logprob(
    df: DataFrame,
    train: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
) -> DataFrame:
    """Per-document mean bigram log-probability with stupid backoff
    (Brants et al. 2007) under a model trained on the ``train`` slice
    of the corpus (e.g. ``F.col("lang") == "en"`` — the CCNet shape:
    a target-domain LM scores the whole crawl; off-model documents
    surface as low scores):

        lp(w1 w2) = ln(c2(w1,w2) / c1(w1))          if the bigram is
                                                     in the model
                  = ln(backoff * (c1(w2)+1)/(T+V))   otherwise

    One corpus pass builds the bigram stream (zip_with over the token
    array — no positional self-join); model tables are train-slice
    aggregates joined back in (AQE elects broadcast when the model is
    Zipf-small). Per-term decimal sums per the registry float
    convention; backoff unigram is add-one smoothed so OOV words are
    defined."""
    arr = tokens(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("id"), F.when(train, 1).otherwise(0).alias("_tr"),
        arr.alias("a"),
    )
    pairs = (
        base.select(
            "id",
            "_tr",
            F.explode(
                F.zip_with(
                    F.col("a"),
                    F.slice(F.col("a"), 2, F.size("a")),
                    lambda l, r: F.when(r.isNull(), F.lit(None)).otherwise(
                        F.struct(l.alias("w1"), r.alias("w2"))
                    ),
                )
            ).alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .select("id", "_tr", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    uni = (
        base.filter(F.col("_tr") == 1)
        .select(F.explode("a").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    tot = uni.agg(F.sum("c1").alias("total"), F.count("*").alias("v"))
    bc = (
        pairs.filter(F.col("_tr") == 1)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    scored = (
        pairs.join(bc, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("cu2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "id",
            F.when(
                F.col("c2").isNotNull(), F.log(F.col("c2") / F.col("c1"))
            )
            .otherwise(
                F.log(
                    F.lit(backoff)
                    * (F.coalesce(F.col("cu2"), F.lit(0)) + 1)
                    / (F.col("total") + F.col("v"))
                )
            )
            .cast("decimal(28,10)")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            # explicit floor(x*1e6+0.5) rounding: ROUND-on-double is
            # half-even in DuckDB, half-up in Spark — exact boundary
            # sums (…805) flip between them
            (
                F.floor((F.sum("lp") / F.count("*")).cast("double") * 1e6 + 0.5)
                / 1e6
            ).alias("mean_logprob"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "mean_logprob")
    )


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int = 100,
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    2006): each row draws u ~ U(0,1) deterministically from md5 of its
    id and keeps key = ln(u)/w; the k largest keys are a weighted
    sample without replacement — the one-pass, coordination-free way
    to sample k documents proportional to quality/importance weights
    (e.g. a DSIR score or token count) across any number of executors.

    Scale shape: a pure projection (md5 + ln, codegen) followed by a
    global top-k = TakeOrderedAndProject — per-partition heaps of k,
    only k rows per partition reach the driver-side merge; no sort, no
    shuffle of the corpus. md5-derived u (not rand()) keeps the draw
    reproducible and engine-portable.

    Weights must be strictly positive — E-S keys are only defined for
    w > 0 (w = 0 divides ln(u) by zero; w < 0 flips the key sign so
    junk rows would deterministically win the top-k). Non-positive-
    weight rows are excluded from the draw, matching the convention
    that zero weight means "never sample"."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (h + 1) / F.lit(float(2**32 + 1))
    key = F.log(u) / weight
    return (
        df.filter(weight > 0)
        .withColumn("es_key", F.floor(key * 1e12 + 0.5) / 1e12)
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )


def epoch_shuffle(
    df: DataFrame,
    batch_size: int = 32,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-epoch shuffle + minibatch assignment:
    every row gets a global position in md5(id, epoch) order, then
    ``batch_idx`` / ``pos_in_batch`` — the dataloader shard plan for a
    pretraining run, computed ONCE on the cluster instead of per
    worker. md5 ordering (not a RNG) makes epoch E's batch composition
    a pure function of (ids, E): reproducible across reruns, engines,
    partitionings, and elastic worker counts, and every epoch is a
    fresh permutation.

    Scale shape: the global position comes from the distributed
    zipWithIndex (range-repartition on the shuffle key + per-partition
    prefix offsets — operators.relational.zip_with_index), so there is
    no single-task global window anywhere; batch arithmetic is
    codegen."""
    from big_data_project_implementation_spark.operators.relational import (
        zip_with_index,
    )

    keyed = df.withColumn(
        "_shuf",
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#epoch{epoch}"))),
    )
    indexed = zip_with_index(keyed, ["_shuf", id_col], index_col="position")
    return (
        indexed.withColumn(
            "batch_idx", (F.col("position") / batch_size).cast("bigint")
        )
        .withColumn(
            "pos_in_batch", (F.col("position") % batch_size).cast("bigint")
        )
        .drop("_shuf")
    )


def source_quota(
    df: DataFrame,
    max_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Per-source document quota — the mixing guardrail that stops one
    crawl/domain from dominating a training corpus: keep at most
    ``max_per_source`` docs per source, chosen deterministically by
    md5(id, seed) order (not arrival order, so the kept subset is
    unbiased w.r.t. crawl position and reproducible on any engine or
    partitioning).

    Scale shape: one source-key exchange + per-source rank window;
    the shuffle carries (source, id, md5) triples. Sources under quota
    pass through untouched. Skew note: a single giant source makes one
    hot partition — at extreme skew pre-filter with a sampled
    per-source count and only window the over-quota sources."""
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), F.col(id_col)
    )
    return (
        df.withColumn("_qr", F.row_number().over(w))
        .filter(F.col("_qr") <= max_per_source)
        .drop("_qr")
    )


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply trained BPE merges to the corpus (the other half of
    :func:`bpe_merges`): every word is greedily merged lowest-rank-
    first (exact subword-nmt/GPT-2 application semantics), giving
    (id, n_tokens, n_pieces, pieces). The tokenizer-apply pass of a
    pretraining pipeline — token budgeting, packing, and loss masking
    all consume these pieces.

    Scale shape: the corpus explodes to (id, pos, word), but the
    Python-side BPE loop runs on the DISTINCT word table only (the
    standard trick: encode each vocabulary word once, join back) —
    corpus-sized work stays JVM-side (explode, join, re-assembly
    groupBy); Python sees vocab-sized Arrow batches. The merge table
    is a model artifact bounded by the training step count (≤ a few
    thousand rows), collected once and broadcast into the UDF —
    a documented bounded collect, same class as the LSH hyperplanes.

    Pandas UDF (not per-row Python): the greedy merge loop is genuinely
    iterative per word — the one shape expressions can't write — so it
    rides the Arrow batch path on the smallest possible input."""
    # module under `from __future__ import annotations`: the UDF's
    # pd.Series hints are strings, so pandas must be resolvable from
    # this function's globals for pyspark's hint inference
    global pd
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks: dict[tuple[str, str], int] = {
        tuple(r["pair"].split(" ")): int(r["rank"])
        for r in merges.select("rank", "pair").collect()
    }

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        def one(w: str) -> list[str]:
            syms = list(w)
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (syms[i], syms[i + 1])
                if best_pair is None:
                    break
                a, b = best_pair
                out, i = [], 0
                while i < len(syms):
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(one)

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    vocab = toks.select("w").distinct().withColumn("pieces", encode("w"))
    return (
        toks.join(vocab, "w")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.size("pieces")).cast("bigint").alias("n_pieces"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "n_pieces", "pieces")
    )


def train_quality_classifier(
    df: DataFrame,
    label: Column,
    n_features: int = 64,
    iters: int = 5,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the hashed-linear quality classifier by distributed batch
    gradient descent (logistic loss) — the companion to
    :func:`hashed_linear_quality_score`, closing the loop: weak labels
    in, filter weights out, all on the cluster. Returns one row per
    iteration: (iter, loss, grad_norm, weights array<double>) — the
    last row's weights are the model.

    Scale shape (MLlib's treeAggregate pattern, kept declarative):
    features are built ONCE — hashed-unigram relative frequencies
    scattered into a dense ``n_features`` array per doc, plus bias —
    and localCheckpoint-ed; each GD iteration is then a single
    map-side-combined aggregation: the per-doc margin, sigmoid, and
    per-component gradient contributions all happen inside one codegen
    projection (weights enter as a broadcast 1-row table), and only
    n_features partial sums per task cross the wire. No corpus
    re-shuffle per iteration, no driver-side data loops — the model
    state is a 1-row DataFrame the whole way."""
    toks = df.select(
        F.col(id_col).alias("id"),
        label.cast("double").alias("y"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
    ).filter(F.col("w") != "")
    counts = (
        toks.groupBy("id", "y", F.pmod(F.xxhash64("w"), F.lit(n_features)).alias("b"))
        .agg(F.count("*").cast("double").alias("c"))
    )
    feat = (
        counts.groupBy("id", "y")
        .agg(
            F.map_from_arrays(
                F.collect_list("b"), F.collect_list("c")
            ).alias("m"),
            F.sum("c").alias("tot"),
        )
        .select(
            "id",
            "y",
            # dense normalized features + trailing bias component
            F.concat(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_features - 1)),
                    lambda i: F.coalesce(
                        F.element_at(F.col("m"), i.cast("bigint")), F.lit(0.0)
                    )
                    / F.col("tot"),
                ),
                F.array(F.lit(1.0)),
            ).alias("f"),
        )
        .localCheckpoint(eager=True)
    )
    dim = n_features + 1
    n_docs = feat.count()  # 1-row scalar, once (not per iteration)
    spark = df.sparkSession
    # The model is dim = n_features + 1 doubles — a BOUNDED driver
    # vector (same class as the vocab-bounded BPE merge table), so the
    # GD loop holds it driver-side and runs exactly ONE job per
    # iteration: the gradient aggregation, collected as one dim-row
    # array. The old 1-row-DataFrame form paid a broadcast build plus
    # an eager localCheckpoint job per iteration for the same floats
    # (guide §1.2: per-iteration fixed costs are the stage here).
    # Numerics are bit-identical: the weight update, squared-norm fold
    # and dot product run in the SAME left-to-right IEEE order the old
    # zip_with/aggregate expressions used (pinned by the numpy-parity
    # test), and math.sqrt == F.sqrt (both correctly rounded).
    import math

    w_cur = [0.0] * dim
    out_rows: list[tuple] = []
    for it in range(1, iters + 1):
        w_lit = F.array(*[F.lit(x) for x in w_cur])
        scored = feat.select(
            "y",
            "f",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -F.aggregate(
                            F.zip_with("f", w_lit, lambda x, wt: x * wt),
                            F.lit(0.0),
                            lambda acc, v: acc + v,
                        )
                    )
                )
            ).alias("p"),
        )
        stats = (
            scored.select(
                F.posexplode(
                    F.transform("f", lambda x: x * (F.col("p") - F.col("y")))
                ).alias("pos", "g"),
                (
                    -(
                        F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                        + (1 - F.col("y"))
                        * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))
                    )
                    / dim
                ).alias("l"),
            )
            .groupBy("pos")
            .agg(F.sum("g").alias("g"), F.sum("l").alias("l"))
            # dim rows at ANY corpus scale (the map-side partial did
            # the data-sized work): one reduce task, and the global
            # fold below then reads one partition instead of
            # shuffle-partition-many near-empty ones (round 14)
            .coalesce(1)
        )
        row = stats.groupBy().agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "g"))),
                lambda s: s["g"] / n_docs,
            ).alias("grad"),
            (F.sum("l") / n_docs).alias("loss"),
        ).first()
        grad_list, loss = list(row["grad"]), row["loss"]
        sq = 0.0
        for g in grad_list:  # left fold, same order as the old aggregate()
            sq += g * g
        grad_norm = math.sqrt(sq)
        w_cur = [wt - lr * g for wt, g in zip(w_cur, grad_list)]
        out_rows.append((it, loss, grad_norm, list(w_cur)))
    out = spark.createDataFrame(
        out_rows, "iter bigint, loss double, grad_norm double, weights array<double>"
    )
    # the 6dp rounding stays in Spark so the rounding function is the
    # same one every other query output uses (HALF_UP, not Python's
    # bankers rounding)
    return out.select(
        "iter",
        F.round("loss", 6).alias("loss"),
        F.round("grad_norm", 6).alias("grad_norm"),
        "weights",
    )


def classifier_auc(
    df: DataFrame,
    score_col: Column | str,
    label: Column,
    scale: int = 1_000_000,
) -> DataFrame:
    """Exact Mann-Whitney AUC of a classifier score against binary
    labels — THE metric a curation team reads before trusting a
    quality filter — with average-rank tie handling, computed in the
    grouped-rank formulation so it scales:

    AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺ · n⁻), R⁺ = Σ avg-rank of positives.

    Scale shape: one groupBy on the QUANTIZED score (state bounded by
    distinct score values — ≤ 2·scale+1 cells, never corpus rows),
    then one window + final aggregate over that small grouped table.
    The corpus is scanned once; no global row-level sort ever happens.

    Integer-exact: scores quantize to ``scale`` units (the input is
    already floor-rounded at 6dp, so this is lossless); ranks live in
    2× units to stay integral under averaging. Returns ONE row
    (n_pos, n_neg, auc_num, auc_den, auc_q6) where auc_num/auc_den is
    the EXACT rational 2(R⁺ − n⁺(n⁺+1)/2) / 2n⁺n⁻ — the certifiable
    contract — and auc_q6 its 6dp floor-rounding (exact-integer-valued
    doubles below 2^53, so the division is engine-identical at any
    gate scale)."""
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col
    s = df.select(
        F.floor(score_col * F.lit(float(scale)) + F.lit(0.5))
        .cast("long")
        .alias("sq"),
        label.cast("int").alias("y"),
    )
    g = s.groupBy("sq").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("np"),
    )
    # two-level cumulative count (round 8, VERDICT r7 #7): the old
    # Window.orderBy("sq") collapsed the grouped margin table to ONE
    # partition. Bounded (≤ 2·scale+1 rows) but needless — coarse
    # buckets give the same exact ranks with no SinglePartition window:
    # per-bucket totals → cross-bucket offsets via a broadcast
    # theta-join over the tiny bucket table (≤ ~scale/B rows), then a
    # bucket-PARTITIONED window for the within-bucket remainder.
    B = 4096
    g = g.withColumn(
        "c", F.floor(F.col("sq") / F.lit(float(B))).cast("long")
    )
    bt = g.groupBy("c").agg(F.sum("n").cast("long").alias("bn"))
    off = (
        bt.alias("a")
        .join(F.broadcast(bt.alias("b")), F.col("b.c") < F.col("a.c"), "left")
        .groupBy(F.col("a.c").alias("c"))
        .agg(F.coalesce(F.sum("b.bn"), F.lit(0)).cast("long").alias("boff"))
    )
    w_in = (
        Window.partitionBy("c")
        .orderBy("sq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.join(off, "c").withColumn(
        "cum",
        F.col("boff")
        + F.coalesce(F.sum("n").over(w_in), F.lit(0).cast("long")),
    )
    stats = r.agg(
        # 2·R⁺ = Σ over score groups: np · (2·cum_before + n + 1)
        F.sum(F.col("np") * (2 * F.col("cum") + F.col("n") + 1))
        .cast("long")
        .alias("r2"),
        F.sum("np").cast("long").alias("n_pos"),
        F.sum(F.col("n") - F.col("np")).cast("long").alias("n_neg"),
    )
    # single-class input makes the Mann-Whitney denominator zero — a
    # silently-NaN auc_q6 is garbage a hash gate would happily certify,
    # so fail loudly per the _q6_checked convention (ADVICE r7)
    auc_ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    auc_err = F.concat(
        F.lit("classifier_auc undefined: n_pos="),
        F.col("n_pos").cast("string"),
        F.lit(", n_neg="),
        F.col("n_neg").cast("string"),
        F.lit(" — AUC needs at least one example of EACH class"),
    )
    return (
        stats.withColumn(
            "auc_num",
            (F.col("r2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("bigint"),
        )
        .withColumn(
            "auc_den", (2 * F.col("n_pos") * F.col("n_neg")).cast("bigint")
        )
        .select(
            F.col("n_pos").cast("bigint").alias("n_pos"),
            F.col("n_neg").cast("bigint").alias("n_neg"),
            "auc_num",
            "auc_den",
            F.when(
                F.assert_true(auc_ok, auc_err).isNull(),
                F.floor(
                    F.col("auc_num").cast("double")
                    / F.col("auc_den").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6,
            ).alias("auc_q6"),
        )
    )


def classifier_reliability(
    df: DataFrame,
    score_col: Column | str,
    label: Column,
    bins: int = 10,
) -> DataFrame:
    """Calibration/reliability table: bucket the corpus by predicted
    score and compare each bucket's mean score against its empirical
    positive rate — the standard companion plot to AUC (a filter can
    rank well and still be badly calibrated, which matters when its
    score becomes a sampling WEIGHT downstream).

    Scale shape: one map-side-combined groupBy on the bin key (state =
    ``bins`` cells). Integer-exact: scores arrive 4dp-rounded, so they
    scale to exact 1e-4 integers; the bin comes from INTEGER
    arithmetic on that scaled value (floor of score·bins on a double
    misrounds exactly at bin boundaries — 0.3·10 is 2.999…96), and
    the per-bin means are floor integer divisions. Returns
    (bin, n, n_pos, mean_score_q6, pos_rate_q6) ordered by bin."""
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col
    s = df.select(
        F.floor(score_col * F.lit(1e4) + F.lit(0.5)).cast("long").alias("s4"),
        label.cast("int").alias("y"),
    ).select(
        F.least(
            F.expr(f"s4 * {bins} div 10000"), F.lit(bins - 1).cast("bigint")
        )
        .cast("int")
        .alias("bin"),
        "s4",
        "y",
    )
    return (
        s.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum("s4").cast("long").alias("_ssum"),
        )
        .select(
            "bin",
            "n",
            "n_pos",
            (F.expr("_ssum * 100 div n") / 1e6).alias("mean_score_q6"),
            (F.expr("n_pos * 1000000 div n") / 1e6).alias("pos_rate_q6"),
        )
        .orderBy("bin")
    )


def classifier_pr_curve(
    df: DataFrame,
    score_col: Column | str,
    label: Column,
    bins: int = 10,
) -> DataFrame:
    """Precision/recall at every decile threshold (round 8): for each
    occupied score bin b, the confusion counts of the filter "keep iff
    score lands in bin ≥ b" — the table a curation team reads to PICK
    the threshold (AUC says the score ranks; calibration says the
    score means what it claims; this says what a concrete cutoff
    costs in kept-junk vs lost-keepers).

    Scale shape: the same one ``bins``-cell groupBy as
    :func:`classifier_reliability`, then suffix sums via a broadcast
    theta-join over the ≤ ``bins``-row bin table (the AUC two-level
    discipline — no SinglePartition window, not even over tiny
    state). Integer-exact throughout: bin assignment is integer
    arithmetic on the 4dp-scaled score, tp/fp/fn are exact longs, and
    the q6 ratios are floor integer divisions — the whole curve
    hash-matches. Returns (threshold_bin, n_flagged, tp, fp, fn,
    precision_q6, recall_q6) ordered by threshold_bin."""
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col
    b = (
        df.select(
            F.floor(score_col * F.lit(1e4) + F.lit(0.5))
            .cast("long")
            .alias("s4"),
            label.cast("int").alias("y"),
        )
        .select(
            F.least(
                F.expr(f"s4 * {bins} div 10000"),
                F.lit(bins - 1).cast("bigint"),
            )
            .cast("int")
            .alias("bin"),
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("np"),
        )
    )
    tot = b.agg(F.sum("np").cast("bigint").alias("pos"))
    thr = b.select(F.col("bin").alias("threshold_bin"))
    cum = (
        thr.join(F.broadcast(b), F.col("bin") >= F.col("threshold_bin"))
        .groupBy("threshold_bin")
        .agg(
            F.sum("n").cast("bigint").alias("n_flagged"),
            F.sum("np").cast("bigint").alias("tp"),
        )
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            "threshold_bin",
            "n_flagged",
            "tp",
            (F.col("n_flagged") - F.col("tp")).cast("bigint").alias("fp"),
            (F.col("pos") - F.col("tp")).cast("bigint").alias("fn"),
            (F.expr("tp * 1000000 div n_flagged") / 1e6).alias(
                "precision_q6"
            ),
            F.when(
                # fail loudly on zero positive labels (the assert_true
                # convention classifier_auc / score_drift use): a
                # silent-NULL recall must never reach a hash gate
                F.assert_true(
                    F.col("pos") > 0,
                    F.lit(
                        "classifier_pr_curve: zero positive labels — "
                        "recall is undefined"
                    ),
                ).isNull(),
                F.expr("tp * 1000000 div pos") / 1e6,
            ).alias("recall_q6"),
        )
        .orderBy("threshold_bin")
    )


def filter_agreement(
    df: DataFrame, pred_a: Column, pred_b: Column
) -> DataFrame:
    """Agreement between two binary filters — contingency counts plus
    Cohen's kappa (chance-corrected agreement), the standard check
    before swapping one quality gate for another (raw accuracy is
    meaningless when both filters keep ~everything).

    kappa = (p_o − p_e) / (1 − p_e) with p_o the observed agreement
    and p_e the marginal-product chance agreement. Returned as the
    EXACT integer rational over the contingency table:

      kappa_num = n·(n00+n11) − [(n00+n01)(n00+n10) + (n10+n11)(n01+n11)]
      kappa_den = n² − [same bracket]

    plus ``kappa_q6``, its 6dp floor-rounding (exact-integer-valued
    doubles: bit-identical on any engine for n below 2^26.5 ≈ 9.4e7;
    at larger corpora read the exact pair). ONE map-side-combined
    aggregate over the scan — zero shuffles of data rows."""
    s = df.select(
        pred_a.cast("int").alias("a"), pred_b.cast("int").alias("b")
    )
    c = s.agg(
        F.count("*").cast("long").alias("n"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
    )
    bracket = (F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10")) + (
        F.col("n10") + F.col("n11")
    ) * (F.col("n01") + F.col("n11"))
    return (
        c.withColumn(
            "kappa_num",
            (F.col("n") * (F.col("n00") + F.col("n11")) - bracket).cast(
                "bigint"
            ),
        )
        .withColumn(
            "kappa_den", (F.col("n") * F.col("n") - bracket).cast("bigint")
        )
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("n00").cast("bigint").alias("n00"),
            F.col("n01").cast("bigint").alias("n01"),
            F.col("n10").cast("bigint").alias("n10"),
            F.col("n11").cast("bigint").alias("n11"),
            "kappa_num",
            "kappa_den",
            (
                F.floor(
                    F.col("kappa_num").cast("double")
                    / F.col("kappa_den").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("kappa_q6"),
        )
    )


def score_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    score_col: Column | str = "score",
    bins: int = 10,
) -> DataFrame:
    """Distribution drift of a classifier score between two corpus
    slices (old crawl vs new crawl, source A vs source B) — the check
    that catches a quality model silently mis-scoring a new snapshot
    before it skews the training mix. Reports the per-decile counts
    and the total-variation distance

        TV = ½ Σ_i |a_i/n_a − b_i/n_b| = Σ_i |a_i·n_b − b_i·n_a| / (2·n_a·n_b)

    as an EXACT integer rational (tv_num / tv_den) — deliberately TV
    and not PSI/KL: those need ln(), whose last-ulp behavior differs
    across engines, while TV is pure integer arithmetic over the bin
    counts and therefore hash-certifiable. Binning reuses the
    integer-exact rule of :func:`classifier_reliability`.

    Returns (bin, n_a, n_b, tv_num, tv_den, tv_q6) — one row per
    occupied bin, the TV columns constant (1-row broadcast, the
    converged-flag idiom). Scale shape: two ``bins``-cell groupBys +
    scalar broadcasts; the corpora are scanned once each."""
    score_col = F.col(score_col) if isinstance(score_col, str) else score_col

    def binned(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.floor(score_col * F.lit(1e4) + F.lit(0.5))
                .cast("long")
                .alias("s4")
            )
            .select(
                F.least(
                    F.expr(f"s4 * {bins} div 10000"),
                    F.lit(bins - 1).cast("bigint"),
                )
                .cast("int")
                .alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").cast("long").alias(out))
        )

    j = (
        binned(df_a, "na")
        .join(binned(df_b, "nb"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("na", F.lit(0).cast("long")).alias("na"),
            F.coalesce("nb", F.lit(0).cast("long")).alias("nb"),
        )
    )
    tot = j.agg(
        F.sum("na").cast("long").alias("n_a"),
        F.sum("nb").cast("long").alias("n_b"),
    )
    per = j.crossJoin(F.broadcast(tot))
    tv = per.agg(
        F.sum(
            F.abs(F.col("na") * F.col("n_b") - F.col("nb") * F.col("n_a"))
        )
        .cast("bigint")
        .alias("tv_num"),
        F.max(2 * F.col("n_a") * F.col("n_b")).cast("bigint").alias("tv_den"),
        F.max("n_a").cast("bigint").alias("_na"),
        F.max("n_b").cast("bigint").alias("_nb"),
    ).withColumn(
        "tv_q6",
        # an empty slice zeroes tv_den and a silent-NaN tv_q6 would
        # hash-certify garbage — fail loudly per the _q6_checked
        # convention (ADVICE r7)
        F.when(
            F.assert_true(
                (F.col("_na") > 0) & (F.col("_nb") > 0),
                F.concat(
                    F.lit("score_drift undefined: n_a="),
                    F.col("_na").cast("string"),
                    F.lit(", n_b="),
                    F.col("_nb").cast("string"),
                    F.lit(" — both slices must be non-empty"),
                ),
            ).isNull(),
            F.floor(
                F.col("tv_num").cast("double")
                / F.col("tv_den").cast("double")
                * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        ),
    ).drop("_na", "_nb")
    return (
        per.select("bin", F.col("na").alias("n_a"), F.col("nb").alias("n_b"))
        .crossJoin(F.broadcast(tv))
        .orderBy("bin")
    )


def classifier_gradient_step_q(
    df: DataFrame,
    label: Column,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Certification companion of :func:`train_quality_classifier`
    (round 7, VERDICT r6 #7): ONE full-batch logistic gradient step,
    integer-exact end to end, so an external SQL engine replays the
    distributed gradient AGGREGATION bit-for-bit.

    Why one step suffices without libm: at w = 0 the sigmoid is
    EXACTLY 0.5 for every doc, so the gradient is
    (1/n)·Σ f·(0.5 − y) = (1/2n)·Σ f·(1 − 2y) — a rational whose
    numerator is an exact bigint once features are integer micro-units.
    The returned ``g2n_q6`` per component is Σ_docs fq·(1 − 2y), i.e.
    2·n_docs·10⁶ times the true first gradient — certifying the
    tokenize → hash → per-doc normalize → map-side-combined component
    aggregation pipeline, which is exactly the treeAggregate shape the
    fp trainer runs every iteration. The fp iterations themselves keep
    their exact numpy-parity and monotone-loss pytests (the later
    sigmoids are genuinely libm-order-sensitive; this row certifies
    the distributed-aggregation logic those tests cannot).

    Engine portability: md5-derived feature buckets (not xxhash64) and
    floor integer division for the micro-unit feature normalization.
    Docs with zero non-empty tokens drop out (the trainer's feat table
    does the same); the bias feature is component ``n_features``.
    Returns (pos, g2n_q6, n_docs) ordered by pos."""
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            label.cast("int").alias("y"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy(
        "id",
        "y",
        (
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
            % n_features
        ).alias("pos"),
    ).agg(F.count("*").cast("bigint").alias("c"))
    feat = (
        counts.withColumn("tot", F.sum("c").over(Window.partitionBy("id")))
        .select("id", "y", "pos", F.expr("(c * 1000000) div tot").alias("fq"))
        .unionByName(
            counts.select("id", "y")
            .distinct()
            .select(
                "id",
                "y",
                F.lit(n_features).cast("bigint").alias("pos"),
                F.lit(1_000_000).cast("bigint").alias("fq"),
            )
        )
    )
    n_docs = counts.select("id").distinct().agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        feat.groupBy("pos")
        .agg(
            F.sum(F.col("fq") * (1 - 2 * F.col("y")))
            .cast("bigint")
            .alias("g2n_q6")
        )
        .crossJoin(F.broadcast(n_docs))
        .orderBy("pos")
    )


def unicode_normalize_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode NFC normalization + audit — the canonicalization pass a
    multilingual corpus needs before any hash-based dedup (composed
    'é' and 'e'+COMBINING ACUTE are different bytes, the same text):
    returns (id, changed, n_chars_before, n_chars_after, normalized).
    Downstream fingerprints/shingles run on ``normalized``.

    Spark has no NFC builtin, so this is a Pandas UDF over Python's
    unicodedata (the reference Unicode implementation) — Arrow-batched,
    and the one honest use of Python here since the operation is a
    character-level table lookup no SQL expression can write. DuckDB's
    nfc_normalize implements the same UAX #15 spec, which makes this
    operator end-to-end oracle-checkable across engines."""
    global pd
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(texts: pd.Series) -> pd.Series:
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return df.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        F.length(text_col).cast("bigint").alias("n_chars_before"),
        nfc(F.col(text_col)).alias("normalized"),
    ).select(
        id_col,
        (F.col("normalized") != F.col("_orig")).alias("changed"),
        "n_chars_before",
        F.length("normalized").cast("bigint").alias("n_chars_after"),
        "normalized",
    )


def heaps_curve(
    df: DataFrame,
    buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct-word
    count after each ``buckets``-ile of the corpus (in id order) —
    the corpus diagnostic that says whether more data still buys new
    vocabulary (sub-linear growth flattening = diminishing returns;
    a break in the curve = a domain shift or contamination event).

    Scale shape: one token shuffle — each word's FIRST-occurrence
    bucket is an associative min over (word → bucket(id)), then the
    curve is a cumulative sum over ``buckets`` rows. No ordered scan,
    no window over the corpus.

    PRECONDITION: ``id_col`` must be dense 0-based integers
    (0..n_docs-1) — the bucket is ``floor(id * buckets / n_docs)``, so
    sparse or offset ids would silently pile all mass into the clamped
    last bucket and degenerate the curve. Checked loudly (min/max ride
    the same pre-pass job as the count): callers with arbitrary ids
    should assign dense ones first via
    ``operators.relational.zip_with_index``."""
    stats = df.agg(
        F.count("*").alias("n"), F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    n_docs = stats["n"]
    if n_docs and (stats["lo"] < 0 or stats["hi"] >= n_docs):
        raise ValueError(
            f"heaps_curve needs dense 0-based ids in {id_col!r} "
            f"(got min={stats['lo']}, max={stats['hi']}, n={n_docs}); "
            "assign dense ids first, e.g. relational.zip_with_index"
        )
    bucket = F.least(
        F.lit(buckets - 1),
        F.floor(F.col(id_col) * buckets / F.lit(n_docs)).cast("int"),
    )
    first = (
        df.select(bucket.alias("b"), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.min("b").alias("first_b"))
        .groupBy("first_b")
        .agg(F.count("*").cast("bigint").alias("new_words"))
    )
    w = Window.orderBy("first_b").rowsBetween(Window.unboundedPreceding, 0)
    return (
        first.withColumn("vocab_size", F.sum("new_words").over(w).cast("bigint"))
        .select(
            F.col("first_b").cast("bigint").alias("bucket"),
            "new_words",
            "vocab_size",
        )
        .orderBy("bucket")
    )


def lexical_index_state(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The MAINTAINED inverted-index state for lexical retrieval
    (round 11 — the IVM theme applied to text statistics): a BM25
    scorer's sufficient statistics, every one of them mergeable under
    document arrivals, so the index refreshes at cost ∝ |Δ| and never
    rescans the corpus (the batch complement of a search engine's
    segment merge):

        postings  (word, id, tf)   — appends
        lens      (id, dl)         — appends (NULL text → NULL dl,
                                     the bm25_scores skip semantics)
        docfreq   (word, df)       — counts: a group under addition
        stats     (n, sumdl)       — scalars: likewise

    Returns the four as DataFrames; persist each (postings bucketed by
    word at deployment scale, so a query's term filter prunes the
    scan). ``bm25_from_index`` scores any query from this state
    bit-identically to :func:`bm25_scores` over the same corpus."""
    lens = docs.select(
        F.col(id_col).alias("id"),
        F.when(
            F.col(text_col).isNotNull(),
            token_count(F.lower(F.col(text_col))),
        ).alias("dl"),
    )
    postings = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word"),
        )
        .groupBy("id", "word")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    docfreq = postings.groupBy("word").agg(
        F.count("*").cast("bigint").alias("df")
    )
    stats = lens.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").cast("bigint").alias("sumdl"),
    )
    return postings, lens, docfreq, stats


def lexical_index_refresh(
    state: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    delta_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Fold arriving documents into the maintained index: postings and
    lens APPEND, docfreq and stats MERGE (counts are a group under
    addition — one union + map-side-combined groupBy each, cost
    ∝ |Δ| + |vocab|, never the corpus). Exact: refresh == rebuild
    bag-for-bag, which the registry row certifies through the BM25
    score hash (any df/tf/dl/n drift flips a score)."""
    postings, lens, docfreq, stats = state
    d_post, d_lens, d_df, d_stats = lexical_index_state(
        delta_docs, text_col, id_col
    )
    new_docfreq = (
        docfreq.unionByName(d_df)
        .groupBy("word")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    new_stats = (
        stats.unionByName(d_stats)
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sumdl").cast("bigint").alias("sumdl"),
        )
    )
    return (
        postings.unionByName(d_post),
        lens.unionByName(d_lens),
        new_docfreq,
        new_stats,
    )


def lexical_index_retract(
    state: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    deleted_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_deltas: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Apply document DELETIONS to the maintained index: postings and
    lens drop the dead ids (broadcast anti probes — the stored index
    is scanned once, never shuffled), docfreq and stats SUBTRACT the
    deleted documents' own state (counts are a group; a word whose df
    reaches 0 leaves the vocabulary, matching a rebuild). No repair
    scan exists or is needed — unlike min/max, every index statistic
    is additive. The id anti joins are NULL-SAFE: the state groups a
    NULL-id document like any other (GROUP BY semantics), so its
    deletion must drop its postings/lens rows too — a plain anti join
    would leave them as zombies while the subtracted counts diverged
    (the ADVICE-r10 null-join defect class). ``deleted_docs`` is
    deduplicated on ``id_col`` first: a CDC feed that repeats a
    deletion would otherwise subtract the document's docfreq/stats
    once PER COPY while the anti join drops its postings/lens rows
    only once, leaving df and n under-counted vs a rebuild (ADVICE
    round 11) — one document has one set of statistics, however many
    times its tombstone arrives."""
    from .relational import _nullsafe_semi_anti

    postings, lens, docfreq, stats = state
    d_post, d_lens, d_df, d_stats = lexical_index_state(
        deleted_docs.dropDuplicates([id_col]), text_col, id_col
    )
    dead_ids = d_lens.select("id").distinct()
    neg = d_df.select("word", (-F.col("df")).alias("df"))
    new_docfreq = (
        docfreq.unionByName(neg)
        .groupBy("word")
        .agg(F.sum("df").cast("bigint").alias("df"))
        .filter(F.col("df") > 0)
    )
    new_stats = (
        stats.unionByName(
            d_stats.select(
                (-F.col("n")).alias("n"), (-F.col("sumdl")).alias("sumdl")
            )
        )
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sumdl").cast("bigint").alias("sumdl"),
        )
    )
    return (
        _nullsafe_semi_anti(postings, dead_ids, ["id"], "anti", broadcast_deltas),
        _nullsafe_semi_anti(lens, dead_ids, ["id"], "anti", broadcast_deltas),
        new_docfreq,
        new_stats,
    )


def bm25_from_index(
    state: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score a bag-of-words query from the MAINTAINED index state —
    the same expression tree as :func:`bm25_scores` (decimal-summed
    contributions, identical association order), so the score is
    bit-identical to a from-scratch run over the equivalent corpus.
    The postings scan filters to the query's terms first (bucketed
    postings prune it at deployment scale); docfreq joins in, stats
    broadcast as one row."""
    postings, lens, docfreq, stats = state
    tf = postings.filter(F.col("word").isin(*query_terms))
    dfreq = docfreq.filter(F.col("word").isin(*query_terms))
    stats1 = stats.select(
        "n", (F.col("sumdl").cast("double") / F.col("n")).alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    return (
        tf.join(F.broadcast(dfreq), "word")
        .join(lens, "id")
        .crossJoin(F.broadcast(stats1))
        .select("id", contrib.cast("decimal(28,10)").alias("c"))
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.round(F.sum("c").cast("double"), 6).alias("score"),
        )
        .select(F.col("id").alias(id_col), "n_terms", "score")
    )
