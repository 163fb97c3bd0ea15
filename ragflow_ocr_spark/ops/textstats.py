"""Text analysis operators over ``documents`` — language-ID heuristic,
quality scoring, token counting, fingerprinting. All computed with
built-in JVM functions (no Python), each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ragflow_ocr_spark.ops._tables import read_fanout

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_fanout(spark, sf_dir, "documents")


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, mean token length,
    stopword ratio, alpha ratio, plus a composite keep/drop flag —
    the standard pretraining-corpus filter shape."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), " +")
    n_tok = F.when(F.length(F.trim(F.col("text"))) == 0, 0).otherwise(F.size(toks))
    n_chars = F.length(F.col("text"))
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS))
    )
    out = d.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(0.0), 6
        ).alias("chars_per_token"),
        F.round(
            F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0), 6
        ).alias("alpha_ratio"),
        F.round(
            F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(0.0), 6
        ).alias("stopword_ratio"),
    )
    return out.withColumn(
        "keep",
        (
            (F.col("n_tokens") >= 10)
            & (F.col("alpha_ratio") >= 0.6)
            & (F.col("chars_per_token") >= 3.0)
        ).cast("int"),
    )


_SW_SQL = "('" + "','".join(_STOPWORDS) + "')"

ORACLE_QUALITY = f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), ' +')) END AS n_tokens,
         LENGTH(text) AS n_chars,
         LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
         len(list_filter(regexp_split_to_array(TRIM(text), ' +'),
                         t -> LOWER(t) IN {_SW_SQL})) AS n_stop
  FROM documents
), feats AS (
  SELECT doc_id, n_tokens,
         ROUND(CASE WHEN n_tokens > 0 THEN n_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS chars_per_token,
         ROUND(CASE WHEN n_chars > 0 THEN n_alpha / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 6) AS alpha_ratio,
         ROUND(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS stopword_ratio
  FROM base
)
SELECT doc_id, n_tokens, chars_per_token, alpha_ratio, stopword_ratio,
       CAST(n_tokens >= 10 AND alpha_ratio >= 0.6 AND chars_per_token >= 3.0 AS INT) AS keep
FROM feats
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-free language-ID heuristic: English stopword density.
    Emits per-(lang) accuracy of the guess against the labeled column —
    the evaluation shape of a real lang-ID stage."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), " +")
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(_STOPWORDS)))
    guess = F.when(
        (n_tok > 0) & (n_stop.cast("double") / n_tok >= 0.08), F.lit("en")
    ).otherwise(F.lit("other"))
    return (
        d.withColumn("guess", guess)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("guess") == "en") == (F.col("lang") == "en"), 1
                ).otherwise(0)
            ).cast("long").alias("n_correct"),
        )
    )


ORACLE_LANG = f"""
WITH g AS (
  SELECT lang,
         CASE WHEN len(regexp_split_to_array(TRIM(text), ' +')) > 0
               AND len(list_filter(regexp_split_to_array(TRIM(text), ' +'),
                                   t -> LOWER(t) IN {_SW_SQL}))
                   / CAST(len(regexp_split_to_array(TRIM(text), ' +')) AS DOUBLE) >= 0.08
              THEN 'en' ELSE 'other' END AS guess
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN (guess = 'en') = (lang = 'en') THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
FROM g GROUP BY lang
"""


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token budgeting: whitespace words split into ≤4-char
    subword pieces (ceil(len/4)) — the corpus-level token-count shape
    used for training-data budgeting. Aggregated per source."""
    d = _docs(spark, sf_dir)
    words = d.select(
        "doc_id", "source", F.explode(F.split(F.trim(F.col("text")), " +")).alias("w")
    ).where(F.length("w") > 0)
    pieces = F.ceil(F.length("w") / 4.0).cast("long")
    return (
        words.withColumn("pieces", pieces)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("pieces").alias("n_bpe_tokens"),
        )
    )


ORACLE_BPE = """
WITH w AS (
  SELECT source, UNNEST(regexp_split_to_array(TRIM(text), ' +')) AS w
  FROM documents
)
SELECT source, COUNT(*) AS n_words,
       CAST(SUM(CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT)) AS BIGINT) AS n_bpe_tokens
FROM w WHERE LENGTH(w) > 0 GROUP BY source
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization fingerprint: md5 of lowercased alphanumeric-only
    text — robust doc identity under formatting noise. Per-source
    distinct-fingerprint counts = dedup-rate report."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]", "")
    fp = F.md5(F.encode(norm, "UTF-8"))
    return (
        d.withColumn("fp", fp)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
    )


ORACLE_FP = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(REGEXP_REPLACE(LOWER(COALESCE(text, '')), '[^a-z0-9]', '', 'g'))) AS n_unique
FROM documents GROUP BY source
"""


_GRAM = 8
_STRIDE = 4


def q_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling k-gram fingerprint (winnowing-style): hash every 8-char
    gram at stride 4 of the normalized text, keep the minimum — robust
    near-identity under local edits. Hash = md5 hex (lexicographic
    min), portable to the oracle. All JVM-side: sequence → transform →
    array_min, no explode/shuffle."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), "[^a-z0-9]", "")
    grams = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.length(norm) - (_GRAM - 1), F.lit(1)),
            F.lit(_STRIDE),
        ),
        lambda i: F.md5(F.encode(norm.substr(i, F.lit(_GRAM)), "UTF-8")),
    )
    return d.select(
        "doc_id",
        F.when(F.length(norm) >= _GRAM, F.array_min(grams))
        .otherwise(F.lit(None))
        .alias("winnow_fp"),
    )


ORACLE_WINNOW = f"""
WITH n AS (
  SELECT doc_id,
         REGEXP_REPLACE(LOWER(COALESCE(text, '')), '[^a-z0-9]', '', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       CASE WHEN LENGTH(norm) >= {_GRAM} THEN
         list_min([md5(substr(norm, CAST(i AS INT), {_GRAM}))
                   FOR i IN RANGE(1, GREATEST(LENGTH(norm) - {_GRAM - 1}, 1) + 1, {_STRIDE})])
       ELSE NULL END AS winnow_fp
FROM n
"""


TOP_NGRAMS_K = 50


def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide word-bigram frequencies, top-K — the vocab/ngram
    statistics pass every pretraining corpus runs. Explode → one
    hash-groupBy (map-side combine carries most of the reduction: the
    bigram space is Zipfian, so partial aggregation collapses the head
    before the shuffle) → TakeOrderedAndProject for the top-K. Ties
    broken lexicographically for cross-engine determinism."""
    d = _docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return (
        d.where(n >= 2)
        .select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(TOP_NGRAMS_K)
    )


ORACLE_TOP_BIGRAMS = f"""
SELECT bigram, COUNT(*) AS n FROM (
  SELECT UNNEST([w[i] || ' ' || w[i+1] FOR i IN RANGE(1, len(w))]) AS bigram
  FROM (SELECT string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 2)
GROUP BY bigram
ORDER BY n DESC, bigram LIMIT {TOP_NGRAMS_K}
"""


# ------------------------------------------------------- char entropy
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-unigram Shannon entropy — the classic
    gibberish/boilerplate signal (low entropy = repeated filler, high =
    random bytes; natural language sits in a band).

    Fully relational: explode positions → substr chars → two
    aggregations (char counts, then −Σ p·log2 p per doc). The explode
    multiplies rows by document length, but both aggregations combine
    map-side, so the shuffle carries |distinct chars per doc| rows —
    bounded by the alphabet, not by text length. Entropy is ROUND(6):
    the unordered float sum differs between engines only at ~1e-15."""
    d = _docs(spark, sf_dir)
    chars = (
        d.where(F.length("text") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
            "text",
        )
        .select("doc_id", "lang", F.expr("substring(text, i, 1)").alias("ch"))
    )
    counts = chars.groupBy("doc_id", "lang", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id", "lang")
        .agg(
            F.max("n").cast("long").alias("n_ch"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"),
        )
    )


ORACLE_ENTROPY = """
WITH chars AS (
  SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 1) AS ch
  FROM documents, UNNEST(RANGE(1, LENGTH(text) + 1)) AS t(i)
  WHERE text IS NOT NULL AND LENGTH(text) > 0
), cnt AS (
  SELECT doc_id, lang, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2, 3
), tot AS (
  SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY 1
)
SELECT doc_id, lang, CAST(MAX(n) AS BIGINT) AS n_ch,
       ROUND(-SUM((c / CAST(n AS DOUBLE)) * LOG2(c / CAST(n AS DOUBLE))), 6)
         AS entropy
FROM cnt JOIN tot USING (doc_id)
GROUP BY doc_id, lang
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style repetition filters: per document, the
    fraction of word mass in repeated unigrams (1 − distinct/total)
    and the fraction claimed by the single most frequent word bigram —
    the two classic "template junk / keyword stuffing" signals.

    Ties for the top bigram are broken by taking MAX(count) (the
    fraction only needs the count, not the bigram), so the output is
    deterministic. Aggregations combine map-side; the shuffle carries
    distinct (doc, gram) rows only."""
    d = _docs(spark, sf_dir)
    words = F.split(F.trim(F.col("text")), " +")
    base = d.where(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id", words.alias("w")
    )
    uni = base.select("doc_id", F.explode("w").alias("g"))
    uni_stats = uni.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.countDistinct("g").cast("bigint").alias("n_distinct"),
    )
    bi = (
        base.where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("w") - 2)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.element_at("w", F.col("i") + 1), F.element_at("w", F.col("i") + 2)
            ).alias("g"),
        )
    )
    bi_counts = bi.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    bi_stats = bi_counts.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.max("c").cast("bigint").alias("top_bigram_c"),
    )
    return (
        uni_stats.join(bi_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(
                1.0 - F.col("n_distinct") / F.col("n_words").cast("double"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.coalesce(
                    F.col("top_bigram_c") / F.col("n_bigrams").cast("double"),
                    F.lit(0.0),
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )


ORACLE_REPETITION = """
WITH base AS (
  SELECT doc_id, string_split(TRIM(regexp_replace(text, ' +', ' ', 'g')), ' ') AS w
  FROM documents WHERE LENGTH(TRIM(text)) > 0
), uni AS (
  SELECT doc_id, UNNEST(w) AS g FROM base
), uni_stats AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct
  FROM uni GROUP BY doc_id
), bi AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] AS g
  FROM base, UNNEST(RANGE(1, len(w))) AS t(i)
  WHERE len(w) >= 2
), bi_counts AS (
  SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2
), bi_stats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_c
  FROM bi_counts GROUP BY doc_id
)
SELECT u.doc_id, u.n_words,
       ROUND(1.0 - u.n_distinct / CAST(u.n_words AS DOUBLE), 6) AS dup_word_frac,
       ROUND(COALESCE(b.top_bigram_c / CAST(b.n_bigrams AS DOUBLE), 0.0), 6)
         AS top_bigram_frac
FROM uni_stats u LEFT JOIN bi_stats b ON u.doc_id = b.doc_id
"""


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: average log-probability of each
    document under a character-bigram model TRAINED ON THE CORPUS
    ITSELF — the relational analogue of the KenLM-perplexity filters
    production pipelines run (low score = unlike the corpus:
    gibberish, boilerplate soup, wrong-language residue).

    Two passes, both fully relational:
    1. model: corpus bigram counts / context counts (MLE — every
       document bigram was observed, so no zero probabilities);
    2. score: per-doc AVG(ln p(c2|c1)) over its bigrams.
    The model tables are alphabet², tiny at ANY corpus size → the
    score join broadcasts; the explode shuffles only distinct
    (doc, bigram) rows after map-side combine."""
    d = _docs(spark, sf_dir)
    bi = (
        d.where(F.length("text") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text") - 1)).alias("i"),
            "text",
        )
        .select("doc_id", F.expr("substring(text, i, 2)").alias("bg"))
    )
    doc_bi = bi.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    model_bi = doc_bi.groupBy("bg").agg(F.sum("c").alias("bc"))
    model_ctx = (
        model_bi.groupBy(F.substring("bg", 1, 1).alias("c1"))
        .agg(F.sum("bc").alias("cc"))
    )
    model = F.broadcast(
        model_bi.withColumn("c1", F.substring("bg", 1, 1)).join(model_ctx, "c1")
    )
    scored = (
        doc_bi.join(model.select("bg", "bc", "cc"), "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("c") * F.log(F.col("bc") / F.col("cc").cast("double"))
                )
                / F.sum("c").cast("double"),
                6,
            ).alias("avg_logprob"),
        )
    )
    return scored


ORACLE_LM_QUALITY = """
WITH bi AS (
  SELECT doc_id, substr(text, CAST(i AS INTEGER), 2) AS bg
  FROM documents, UNNEST(RANGE(1, LENGTH(text))) AS t(i)
  WHERE LENGTH(text) >= 2
), doc_bi AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bi GROUP BY 1, 2
), model_bi AS (
  SELECT bg, SUM(c) AS bc FROM doc_bi GROUP BY bg
), model_ctx AS (
  SELECT substr(bg, 1, 1) AS c1, SUM(bc) AS cc FROM model_bi GROUP BY 1
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       ROUND(SUM(c * LN(bc / CAST(cc AS DOUBLE))) / CAST(SUM(c) AS DOUBLE), 6)
         AS avg_logprob
FROM doc_bi
JOIN model_bi USING (bg)
JOIN model_ctx ON model_ctx.c1 = substr(bg, 1, 1)
GROUP BY doc_id
"""


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{4}\b"
_IP_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the compliance pass every training corpus runs
    before release: count and replace emails, phone numbers, and IPv4
    addresses with typed placeholder tokens. The corpus text is clean
    by construction, so both engines first append the SAME
    deterministic PII suffixes (emails on doc_id%5, phones on %7, IPs
    on %11 — the synthesis is part of the oracle-checked expression,
    exactly like the weburl URL synthesis), then scrub.

    Scale shape: pure per-row regexp expressions (Java-regex/RE2
    common subset), whole-stage codegen, no shuffle, no UDF; the
    emitted md5 certifies the scrubbed text without carrying it."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    txt = F.concat(
        F.col("text"),
        F.when(
            did % 5 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"),
                     F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            did % 7 == 0,
            F.concat(F.lit(" call 555-"),
                     F.lpad((did % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
        F.when(
            did % 11 == 0,
            F.concat(F.lit(" from 10.0."), (did % 256).cast("string"),
                     F.lit("."), ((did * 3) % 256).cast("string")),
        ).otherwise(F.lit("")),
    )
    base = d.select("doc_id", txt.alias("t"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return base.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(_IP_RE), F.lit(0)))
        .cast("int")
        .alias("n_ips"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        (F.length(scrubbed) - F.length("t")).cast("long").alias("len_delta"),
    )


_PII_TEXT_SQL = """text
    || CASE WHEN doc_id % 5 = 0
       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
       ELSE '' END
    || CASE WHEN doc_id % 7 = 0
       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       ELSE '' END
    || CASE WHEN doc_id % 11 = 0
       THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.'
            || CAST((doc_id * 3) % 256 AS VARCHAR)
       ELSE '' END"""

ORACLE_PII = f"""
WITH base AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents
), scrub AS (
  SELECT doc_id, t,
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
             '{_PHONE_RE}', '<PHONE>', 'g'),
           '{_IP_RE}', '<IP>', 'g') AS s
  FROM base
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{_IP_RE}')) AS INT) AS n_ips,
       md5(s) AS scrubbed_md5,
       CAST(LENGTH(s) - LENGTH(t) AS BIGINT) AS len_delta
FROM scrub
"""


_PACK_SEQ_LEN = 512  # tokens per packed training sequence
_PACK_CHUNK = 1000  # doc_id-range chunk for the two-level prefix sum


# 32-token chunks at stride 24 (8-token overlap): sized so the
# 10-100-token synthetic documents exercise 1-4 chunks INCLUDING the
# overlap and short-tail paths (production values like 128/96 would
# make every test doc single-chunk and leave the windowing untested)
_CHUNK_LEN = 32
_CHUNK_STRIDE = 24


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the retrieval/embedding-prep
    layout: each document yields L-token chunks at stride S
    (L-S-token overlap), one output row per chunk with its token span.
    K = 1 + ceil(max(n_tokens - L, 0) / S) chunks, so every token
    is covered and a short document still yields one (short) chunk.

    Scale shape: a pure per-row explode over a computed sequence — no
    shuffle, no UDF; output row count is ~n_tokens/96 per document,
    the same fan-out an embedding stage would feed."""
    d = _docs(spark, sf_dir)
    txt = F.trim(F.col("text"))
    n_tok = (
        F.when(F.length(txt) == 0, 0)
        .otherwise(F.size(F.split(txt, " +")))
        .cast("long")
    )
    base = d.select("doc_id", n_tok.alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    n_chunks = 1 + F.floor(
        (
            F.greatest(F.col("n_tokens") - _CHUNK_LEN, F.lit(0))
            + (_CHUNK_STRIDE - 1)
        )
        / _CHUNK_STRIDE
    ).cast("long")
    return (
        base.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * _CHUNK_STRIDE).alias("tok_start"),
            F.least(
                F.col("chunk_idx") * _CHUNK_STRIDE + _CHUNK_LEN,
                F.col("n_tokens"),
            ).alias("tok_end"),
        )
        .withColumn("n_tok_chunk", F.col("tok_end") - F.col("tok_start"))
    )


ORACLE_CHUNKS = f"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), ' +')) END
              AS BIGINT) AS n_tokens
  FROM documents
), k AS (
  SELECT doc_id, n_tokens,
         1 + (GREATEST(n_tokens - {_CHUNK_LEN}, 0) + {_CHUNK_STRIDE - 1})
             // {_CHUNK_STRIDE} AS n_chunks
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {_CHUNK_STRIDE} AS BIGINT) AS tok_start,
       CAST(LEAST(i * {_CHUNK_STRIDE} + {_CHUNK_LEN}, n_tokens) AS BIGINT)
         AS tok_end,
       CAST(LEAST(i * {_CHUNK_STRIDE} + {_CHUNK_LEN}, n_tokens)
            - i * {_CHUNK_STRIDE} AS BIGINT) AS n_tok_chunk
FROM k, UNNEST(range(n_chunks)) AS r(i)
"""


def q_pack_sequences(
    spark: SparkSession, sf_dir: str, chunk: int = _PACK_CHUNK
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): documents are concatenated in doc_id order into one token
    stream cut into fixed 512-token sequences; each document reports
    its global token offset, the first/last sequence it lands in, and
    how many sequences it touches.

    Scale shape — NO corpus-sized window: a single unpartitioned
    ``sum over (order by doc_id)`` would funnel the corpus through one
    task. Three-level distributed prefix sum instead:
    1. exact cumsum inside doc_id-range chunks of ``chunk`` docs
       (window PARTITIONED by chunk — fully parallel);
    2. chunk totals (n_docs/chunk rows) cumsum inside SUPERCHUNKS of
       ``chunk`` chunks (again a partitioned window);
    3. superchunk totals (n_docs/chunk² rows) carry the only
       unpartitioned window — at chunk=1000 that is 10 rows for a
       10¹⁰-doc corpus and 10⁴ rows at 10¹³ docs, a bounded
       single-task input at any realistic corpus size.
    The DuckDB oracle computes the plain global cumsum — identical
    results, different plan. ``chunk`` is parameterized so tests can
    exercise all three levels on the 500-doc corpus."""
    d = _docs(spark, sf_dir)
    txt = F.trim(F.col("text"))
    n_tok = (
        F.when(F.length(txt) == 0, 0)
        .otherwise(F.size(F.split(txt, " +")))
        .cast("long")
    )
    base = d.select(
        "doc_id", n_tok.alias("n_tokens"), (F.col("doc_id") / chunk)
        .cast("long")
        .alias("chunk"),
    )
    from pyspark.sql import Window

    in_chunk = Window.partitionBy("chunk").orderBy("doc_id")
    with_local = base.withColumn(
        "local_end", F.sum("n_tokens").over(in_chunk)
    )
    chunk_totals = base.groupBy("chunk").agg(
        F.sum("n_tokens").alias("chunk_tok")
    )
    # level 2: cumsum of chunk totals within superchunks (partitioned)
    in_super = Window.partitionBy("super").orderBy("chunk")
    chunk_local = chunk_totals.withColumn(
        "super", (F.col("chunk") / chunk).cast("long")
    ).withColumn("local_chunk_end", F.sum("chunk_tok").over(in_super))
    # level 3: the ONLY unpartitioned window, over superchunk totals
    # (n_docs/chunk² rows — see docstring bound)
    super_offsets = (
        chunk_local.groupBy("super")
        .agg(F.sum("chunk_tok").alias("super_tok"))
        .withColumn(
            "super_off",
            F.coalesce(
                F.sum("super_tok").over(
                    Window.orderBy("super").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("super", "super_off")
    )
    chunk_offsets = (
        chunk_local.join(F.broadcast(super_offsets), "super")
        .select(
            "chunk",
            (
                F.col("super_off")
                + F.col("local_chunk_end")
                - F.col("chunk_tok")
            ).alias("chunk_off"),
        )
    )
    # no broadcast hint here: chunk_offsets has n_docs/chunk rows (10⁷
    # at 10¹⁰ docs) — too big to force-broadcast; AQE picks broadcast
    # when it actually fits (it does at test scale)
    return (
        with_local.join(chunk_offsets, "chunk")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("chunk_off") + F.col("local_end") - F.col("n_tokens"))
            .cast("long")
            .alias("tok_offset"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "tok_offset",
            (F.col("tok_offset") / _PACK_SEQ_LEN).cast("long").alias("first_seq"),
            F.when(F.col("n_tokens") == 0, (F.col("tok_offset") / _PACK_SEQ_LEN).cast("long"))
            .otherwise(
                ((F.col("tok_offset") + F.col("n_tokens") - 1) / _PACK_SEQ_LEN)
                .cast("long")
            )
            .alias("last_seq"),
        )
        .withColumn(
            "n_seqs",
            F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.col("last_seq") - F.col("first_seq") + 1
            ),
        )
    )


ORACLE_PACK = f"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(TRIM(text), ' +')) END
              AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_offset
  FROM base
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(tok_offset // {_PACK_SEQ_LEN} AS BIGINT) AS first_seq,
       CAST(CASE WHEN n_tokens = 0 THEN tok_offset // {_PACK_SEQ_LEN}
            ELSE (tok_offset + n_tokens - 1) // {_PACK_SEQ_LEN} END
            AS BIGINT) AS last_seq,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (CASE WHEN n_tokens = 0 THEN tok_offset // {_PACK_SEQ_LEN}
                  ELSE (tok_offset + n_tokens - 1) // {_PACK_SEQ_LEN} END)
                 - tok_offset // {_PACK_SEQ_LEN} + 1 END
            AS BIGINT) AS n_seqs
FROM cum
"""


def q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al., MassiveText) composite document
    filter in ONE pass: word count, mean word length, alphabetic-word
    fraction, distinct-stopword count, duplicate-word mass, and
    top-bigram mass, folded into a keep flag plus the FIRST failing
    rule as a human-readable reason — the standard pretraining-corpus
    gate, emitted per document so downstream sampling can stratify by
    drop reason.

    Scale shape: every signal except the top bigram is a per-row array
    expression (no explode, no shuffle); the bigram mass needs one
    (doc_id, gram) count — the same distinct-gram shuffle
    q_repetition_stats carries, with map-side combine. Thresholds are
    Gopher's where the synthetic corpus exercises both outcomes and
    adapted (documented inline) where the 31-word vocabulary would
    make a rule constant."""
    d = _docs(spark, sf_dir)
    txt = F.trim(F.col("text"))
    w = F.split(txt, " +")
    n_words = F.when(F.length(txt) == 0, 0).otherwise(F.size(w)).cast("long")
    n_chars_ns = F.length(F.regexp_replace(txt, " +", ""))
    frac_alpha = F.when(
        n_words > 0,
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    ).otherwise(0.0)
    n_stop_d = F.size(
        F.array_distinct(F.filter(w, lambda x: F.lower(x).isin(_STOPWORDS)))
    ).cast("long")
    dup_frac = F.when(
        n_words > 0,
        1.0 - F.size(F.array_distinct(w)).cast("double") / n_words,
    ).otherwise(0.0)
    feats = d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, n_chars_ns.cast("double") / n_words).otherwise(
                0.0
            ),
            6,
        ).alias("mean_word_len"),
        F.round(frac_alpha, 6).alias("frac_alpha_words"),
        n_stop_d.alias("n_stop_distinct"),
        F.round(dup_frac, 6).alias("dup_word_frac"),
    )
    base = d.where(F.length(txt) > 0).select("doc_id", w.alias("w"))
    bi = (
        base.where(F.size("w") >= 2)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("w") - 2)).alias("i"),
            "w",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("w", F.col("i") + 1),
                F.element_at("w", F.col("i") + 2),
            ).alias("g"),
        )
    )
    bi_stats = (
        bi.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("nb"),
            F.max("c").cast("bigint").alias("topc"),
        )
    )
    out = feats.join(bi_stats, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "frac_alpha_words",
        "n_stop_distinct",
        "dup_word_frac",
        F.round(
            F.coalesce(
                F.col("topc").cast("double") / F.col("nb"), F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_frac"),
    )
    # rules reference the ROUNDED columns so both engines compare the
    # same 6-decimal values; 20-word floor instead of Gopher's 50 and
    # dup ≤ 0.85 instead of 0.2-class thresholds keep both outcomes
    # represented in the 10-100-word / 31-word-vocab synthetic corpus
    r_words = (F.col("n_words") >= 20) & (F.col("n_words") <= 100000)
    r_mlen = (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
    r_alpha = F.col("frac_alpha_words") >= 0.8
    r_stop = F.col("n_stop_distinct") >= 2
    r_dup = F.col("dup_word_frac") <= 0.85
    r_bi = F.col("top_bigram_frac") <= 0.18
    return out.select(
        "*",
        (r_words & r_mlen & r_alpha & r_stop & r_dup & r_bi)
        .cast("int")
        .alias("keep"),
        F.when(~r_words, "n_words")
        .when(~r_mlen, "mean_word_len")
        .when(~r_alpha, "alpha_words")
        .when(~r_stop, "stopwords")
        .when(~r_dup, "dup_words")
        .when(~r_bi, "top_bigram")
        .otherwise("ok")
        .alias("reason"),
    )


ORACLE_GOPHER = f"""
WITH base AS (
  SELECT doc_id, TRIM(text) AS t,
         regexp_split_to_array(TRIM(text), ' +') AS w
  FROM documents
), feats AS (
  SELECT doc_id,
         CAST(CASE WHEN LENGTH(t) = 0 THEN 0 ELSE len(w) END AS BIGINT)
           AS n_words,
         LENGTH(REGEXP_REPLACE(t, ' +', '', 'g')) AS n_chars_ns,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_w,
         CAST(len(list_distinct(list_filter(w, x -> LOWER(x) IN {_SW_SQL})))
              AS BIGINT) AS n_stop_distinct,
         len(list_distinct(w)) AS n_distinct
  FROM base
), bi AS (
  SELECT doc_id,
         w[i + 1] || ' ' || w[i + 2] AS g
  FROM base, UNNEST(range(len(w) - 1)) AS r(i)
  WHERE LENGTH(t) > 0 AND len(w) >= 2
), bic AS (
  SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2
), bistats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS nb, CAST(MAX(c) AS BIGINT) AS topc
  FROM bic GROUP BY 1
), rounded AS (
  SELECT f.doc_id, f.n_words,
         ROUND(CASE WHEN f.n_words > 0
               THEN f.n_chars_ns / CAST(f.n_words AS DOUBLE) ELSE 0.0 END, 6)
           AS mean_word_len,
         ROUND(CASE WHEN f.n_words > 0
               THEN f.n_alpha_w / CAST(f.n_words AS DOUBLE) ELSE 0.0 END, 6)
           AS frac_alpha_words,
         f.n_stop_distinct,
         ROUND(CASE WHEN f.n_words > 0
               THEN 1.0 - f.n_distinct / CAST(f.n_words AS DOUBLE)
               ELSE 0.0 END, 6) AS dup_word_frac,
         ROUND(COALESCE(b.topc / CAST(b.nb AS DOUBLE), 0.0), 6)
           AS top_bigram_frac
  FROM feats f LEFT JOIN bistats b USING (doc_id)
)
SELECT doc_id, n_words, mean_word_len, frac_alpha_words, n_stop_distinct,
       dup_word_frac, top_bigram_frac,
       CAST(n_words BETWEEN 20 AND 100000
            AND mean_word_len BETWEEN 3.0 AND 10.0
            AND frac_alpha_words >= 0.8
            AND n_stop_distinct >= 2
            AND dup_word_frac <= 0.85
            AND top_bigram_frac <= 0.18 AS INT) AS keep,
       CASE WHEN NOT (n_words BETWEEN 20 AND 100000) THEN 'n_words'
            WHEN NOT (mean_word_len BETWEEN 3.0 AND 10.0) THEN 'mean_word_len'
            WHEN frac_alpha_words < 0.8 THEN 'alpha_words'
            WHEN n_stop_distinct < 2 THEN 'stopwords'
            WHEN dup_word_frac > 0.85 THEN 'dup_words'
            WHEN top_bigram_frac > 0.18 THEN 'top_bigram'
            ELSE 'ok' END AS reason
FROM rounded
"""


QUERIES = {
    "gopher_filter": (q_gopher_filter, ORACLE_GOPHER),
    "pii_scrub": (q_pii_scrub, ORACLE_PII),
    "pack_sequences": (q_pack_sequences, ORACLE_PACK),
    "chunk_documents": (q_chunk_documents, ORACLE_CHUNKS),
    "text_quality": (q_text_quality, ORACLE_QUALITY),
    "lm_quality": (q_lm_quality, ORACLE_LM_QUALITY),
    "repetition_stats": (q_repetition_stats, ORACLE_REPETITION),
    "char_entropy": (q_char_entropy, ORACLE_ENTROPY),
    "lang_id": (q_lang_id, ORACLE_LANG),
    "token_count_bpe": (q_token_count_bpe, ORACLE_BPE),
    "fingerprint": (q_fingerprint, ORACLE_FP),
    "fingerprint_winnow": (q_fingerprint_winnow, ORACLE_WINNOW),
    "top_bigrams": (q_top_bigrams, ORACLE_TOP_BIGRAMS),
}
