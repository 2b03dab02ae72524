"""Text-analysis operators over the documents table.

All pure Catalyst expressions (no UDFs): language-ID by marker-word
counts, quality scoring from length/punct/stopword ratios, token counting
(whitespace + BPE-ish regex), document fingerprinting (normalized md5 +
64-bit prefix). Each has an exact DuckDB-SQL twin (see __spark_entry__).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker stopwords per language (tiny public wordlists; the heuristic, not
# a model — deterministic and SQL-expressible)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "de", "et", "un", "les"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# every character the punctuation counter does NOT count: ASCII
# letters/digits plus Java regex \s = [ \t\n\x0B\f\r]. Counting via
# translate(col, _ALNUM_WS, '') is character-exact with
# regexp_replace(col, '[^A-Za-z0-9\\s]', '') length arithmetic (any
# char outside this set — unicode included — counts as punctuation in
# both forms) and measured 4.5× faster: translate is a plain char map,
# the regex engine costs ~1 µs/char on this shape (r06).
_ALNUM_WS = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\x0b\x0c\r"
)


def words(col: Column) -> Column:
    """Whitespace tokenization; empty-safe."""
    return F.filter(F.split(F.trim(col), "\\s+"), lambda t: t != "")


def word_count(col: Column) -> Column:
    return F.size(words(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, single punctuation."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE))


def stopword_ratio(col: Column) -> Column:
    ws = words(F.lower(col))
    hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    return F.when(F.size(ws) > 0, hits / F.size(ws)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    return F.when(
        n > 0,
        F.length(F.translate(col, _ALNUM_WS, "")) / n,
    ).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable stopword density (standard pretrain-filter features)."""
    n_words = word_count(col)
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(col) * 5.0)
    sw = stopword_ratio(col)
    sw_score = F.when(sw > 0.6, F.lit(0.5)).otherwise(F.lit(1.0))
    return F.round(len_score * 0.5 + punct_pen * 0.3 + sw_score * 0.2, 6)


def lang_id(col: Column) -> Column:
    """Argmax of per-language marker hits; 'und' when no marker occurs.
    Ties break by language code order (deterministic)."""
    low = words(F.lower(col))
    def marker_filter(ms: list):
        return lambda w: w.isin(*ms)

    scores = [
        (lang, F.size(F.filter(low, marker_filter(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = None
    best_score = None
    for lang, score in scores:
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def normalized(col: Column) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), "\\s+", " ")


def fingerprint_md5(col: Column) -> Column:
    return F.md5(normalized(col))


def fingerprint64(col: Column) -> Column:
    """64-bit fingerprint: first 16 hex digits of the normalized md5
    (SQL-portable; DuckDB lacks xxhash64)."""
    return F.conv(F.substring(fingerprint_md5(col), 1, 15), 16, 10).cast("long")


def analyze(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """All text-analysis columns in one pass, STAGED: the tokenized word
    arrays and every per-language marker count are computed once in
    their own projections, and the final projection combines cheap
    integer attributes. The single-select form (each column calling
    words()/lang_id() on the raw text) re-ran the split per conditional
    reference — lang_id's nested argmax CaseWhen duplicates its
    accumulated subtree into both branches per language, so the
    tokenization executed ~2^langs times per row under the
    conditional-context CSE defeat. Output columns and values are
    identical (same math over the same intermediates)."""
    c = F.col(text_col)
    langs = sorted(LANG_MARKERS.items())

    def marker_filter(ms: list):
        return lambda w: w.isin(*ms)

    # stage 1: tokenize once (the word array is referenced 6× below —
    # non-cheap + multiply-referenced, so CollapseProject keeps the stage)
    stage1 = df.select(
        F.col(id_col),
        c.alias("__t"),
        words(c).alias("__w"),
        words(F.lower(c)).alias("__lw"),
    )
    # stage 2: every count/length exactly once, as flat columns
    stage2 = stage1.select(
        F.col(id_col),
        F.size("__w").alias("__nw"),
        F.size("__lw").alias("__nlw"),
        F.size(F.filter("__lw", lambda w: w.isin(*STOPWORDS))).alias("__sw_hits"),
        *[
            F.size(F.filter("__lw", marker_filter(ms))).alias(f"__s_{lang}")
            for lang, ms in langs
        ],
        F.length("__t").alias("__len"),
        (F.length("__t") - F.length(F.translate("__t", _ALNUM_WS, ""))).alias("__alnum"),
        F.regexp_count("__t", F.lit(BPE_TOKEN_RE)).alias("__bpe"),
        fingerprint_md5(F.col("__t")).alias("__fp"),
    )
    # stage 3: combine cheap integer attributes (CaseWhen duplication of
    # attribute references is harmless)
    sw_ratio = F.when(
        F.col("__nlw") > 0, F.col("__sw_hits") / F.col("__nlw")
    ).otherwise(F.lit(0.0))
    punct = F.when(
        F.col("__len") > 0, (F.col("__len") - F.col("__alnum")) / F.col("__len")
    ).otherwise(F.lit(0.0))
    len_score = F.least(F.col("__nw") / F.lit(50.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 5.0)
    sw_score = F.when(sw_ratio > 0.6, F.lit(0.5)).otherwise(F.lit(1.0))
    quality = F.round(len_score * 0.5 + punct_pen * 0.3 + sw_score * 0.2, 6)
    best = F.lit(langs[0][0])
    best_score = F.col(f"__s_{langs[0][0]}")
    for lang, _ms in langs[1:]:
        s = F.col(f"__s_{lang}")
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    lang_pred = F.when(best_score > 0, best).otherwise(F.lit("und"))
    return stage2.select(
        F.col(id_col),
        F.col("__nw").alias("n_words"),
        F.col("__bpe").alias("n_bpe_tokens"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        quality.alias("quality"),
        lang_pred.alias("lang_pred"),
        F.col("__fp").alias("fp_md5"),
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document repetition/quality signals (the Gopher-rule family,
    adapted word-wise because this corpus is single-line): distinct-token
    ratio and the mass of the most-frequent word {2,3}-gram. High
    top-gram mass or low distinct ratio flags boilerplate/spam docs in a
    pretrain filter. Output: (doc_id, n_words, distinct_frac,
    top_bigram_frac, top_trigram_frac), fractions rounded 6.

    Scale shape: ONE explode feeds all three gram lengths (unigrams ride
    along tagged n=1, so distinct-count needs no count-distinct expand),
    then two fixed-width hash aggregates — (doc, n, gram) counts with
    map-side combine, then per-(doc, n) max/sum — and a conditional-max
    pivot per doc. Only the top COUNT is needed (not the gram itself),
    so there is no argmax/SortAggregate anywhere. Docs with no tokens
    are preserved by a left join from the slim (doc_id, n_words) base
    (sort-merge at scale; both sides pre-reduced to one row per doc)."""
    c = F.col(text_col)
    # stage 1: tokenize once; ws is referenced by three gram builders
    stage1 = df.select(F.col(id_col), words(F.lower(c)).alias("__ws"))
    n = F.size("__ws")
    uni = F.transform("__ws", lambda w: F.struct(F.lit(1).alias("n"), w.alias("g")))
    bi_a = F.slice("__ws", 1, F.greatest(n - 1, F.lit(0)))
    bi_b = F.slice("__ws", 2, F.greatest(n - 1, F.lit(0)))
    bi = F.zip_with(
        bi_a, bi_b,
        lambda a, b: F.struct(F.lit(2).alias("n"), F.concat_ws(" ", a, b).alias("g")),
    )
    tri_a = F.slice("__ws", 1, F.greatest(n - 2, F.lit(0)))
    tri_b = F.slice("__ws", 2, F.greatest(n - 2, F.lit(0)))
    tri_c = F.slice("__ws", 3, F.greatest(n - 2, F.lit(0)))
    tri = F.zip_with(
        F.zip_with(tri_a, tri_b, lambda a, b: F.concat_ws(" ", a, b)),
        tri_c,
        lambda ab, cc: F.struct(F.lit(3).alias("n"), F.concat_ws(" ", ab, cc).alias("g")),
    )
    base = stage1.select(F.col(id_col), n.alias("n_words")).alias("base")
    grams = stage1.select(
        F.col(id_col), F.explode(F.concat(uni, bi, tri)).alias("gr")
    ).select(F.col(id_col), F.col("gr.n").alias("gn"), F.col("gr.g").alias("g"))
    counts = grams.groupBy(id_col, "gn", "g").agg(F.count(F.lit(1)).alias("c"))
    per_n = counts.groupBy(id_col, "gn").agg(
        F.max("c").alias("topc"), F.count(F.lit(1)).alias("ndist")
    )
    pivoted = per_n.groupBy(id_col).agg(
        F.max(F.when(F.col("gn") == 1, F.col("ndist"))).alias("n_distinct"),
        F.max(F.when(F.col("gn") == 2, F.col("topc"))).alias("top_bi"),
        F.max(F.when(F.col("gn") == 3, F.col("topc"))).alias("top_tri"),
    )
    out = base.join(pivoted, id_col, "left")
    nw = F.col("n_words")
    return out.select(
        F.col(id_col),
        nw,
        F.round(
            F.when(nw > 0, F.col("n_distinct") / nw).otherwise(F.lit(0.0)), 6
        ).alias("distinct_frac"),
        F.round(
            F.when(nw >= 2, F.col("top_bi") * 2.0 / nw).otherwise(F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.when(nw >= 3, F.col("top_tri") * 3.0 / nw).otherwise(F.lit(0.0)), 6
        ).alias("top_trigram_frac"),
    )


def token_frequencies(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary table: per lowercase whitespace-token term
    frequency (`tf`) and document frequency (`df_docs`) — the
    vocabulary/IDF input of a tokenizer-training or quality-filter
    stage. Output: (token, tf, df_docs), filtered to tf >= min_count.

    Scale shape: explode → one hash shuffle on token with map-side
    combine absorbing hot tokens (stopwords are exactly the skewed keys
    partial aggregation flattens); df_docs via a (token, doc_id)
    pre-distinct so the distinct count is two fixed-width hash
    aggregates, never a count-distinct expand over the token stream.
    Exact DuckDB twin in __spark_entry__ (token_frequency)."""
    toks = df.select(
        F.col(id_col),
        F.explode(words(F.lower(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        toks.distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_docs"))
    )
    out = tf.join(dfreq, "token").select("token", "tf", "df_docs")
    return out.filter(F.col("tf") >= min_count) if min_count > 1 else out


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, sklearn-style) — the keyword/topic
    signal a corpus-curation pipeline derives next after the vocabulary
    table. Output: (doc_id, rank, token, tf, score) with rank 1..k;
    ties broken on rounded score then token, so ordering is
    deterministic and engine-portable. Token-less docs emit no rows.

    Scale shape: ONE explode feeds a (doc, token) hash aggregate; the
    document-frequency side is re-aggregated from that same (already
    vocabulary-sized) result — the raw token stream is never read twice
    and there is no count-distinct expand. N rides in as a broadcast
    1-row cross join (no driver action). The IDF join is vocab-sized —
    broadcast by default, switchable off for billion-token vocabularies
    (then a shuffled hash join on the slim (token, df) side). The only
    per-doc sort is the final top-k window over each doc's distinct
    tokens."""
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col),
        F.explode(words(F.lower(F.col(text_col)))).alias("token"),
    )
    tfd = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tfd.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    if broadcast_vocab:
        dfq = F.broadcast(dfq)
    n_docs = F.broadcast(df.groupBy().agg(F.count(F.lit(1)).alias("__n")))
    scored = (
        tfd.join(dfq, "token")
        .crossJoin(n_docs)
        .select(
            F.col(id_col),
            F.col("token"),
            F.col("tf"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1.0) / (F.col("df_docs") + 1.0))
                    + 1.0
                ),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "token", "tf", "score")
    )


def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    broadcast_model: bool = True,
    persist_intermediate: bool = True,
) -> DataFrame:
    """Per-document bigram-LM fluency score — the KenLM-style
    perplexity-proxy quality filter (CCNet/Gopher pipelines score docs
    with an n-gram LM and drop the tails), self-trained on the corpus
    itself in the same job. Output: (doc_id, n_bigrams,
    avg_logprob, ppl_proxy) — avg_logprob is the mean
    Stupid-Backoff-style log score ln(max(P_bigram, alpha * P_unigram))
    over the doc's bigrams; ppl_proxy = exp(-avg_logprob). Docs with
    < 2 tokens emit n_bigrams=0 and NULL scores.

    Scale shape: the "training" pass is the same one-explode hash
    aggregation as token_frequencies (bigram + unigram count tables are
    vocabulary-sized, broadcast to the scoring join by default — at
    billion-type vocabularies flip broadcast_model=False for shuffled
    hash joins on slim (gram, count) rows). The scoring pass re-reads
    the corpus once: explode doc bigrams, two model joins, one per-doc
    aggregate. No sorts, no windows, no UDFs — plain Catalyst
    end-to-end, with an exact DuckDB twin (`lm_score`)."""
    toks = df.select(
        F.col(id_col),
        F.explode(words(F.lower(F.col(text_col)))).alias("w"),
    )
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("uc"))
    total = uni.groupBy().agg(F.sum("uc").cast("double").alias("__tot"))

    ws = words(F.lower(F.col(text_col)))
    big_arr = F.zip_with(
        ws,
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bigrams = df.select(
        F.col(id_col), F.explode(big_arr).alias("bg")
    ).select(F.col(id_col), F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    # r06: the bigram stream feeds BOTH the model-count aggregate and
    # the scoring join — uncached, the tokenize + zip_with + explode
    # pipeline ran twice per query (registry persist, slim rows)
    from .cache import register_persist

    doc_bigrams = register_persist(doc_bigrams, persist_intermediate)
    big = doc_bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))

    if broadcast_model:
        uni, big = F.broadcast(uni), F.broadcast(big)
    # P_bigram = bc / uc(w1); P_unigram(w2) = uc(w2) / total
    scored = (
        doc_bigrams.join(big, ["w1", "w2"])
        .join(uni.select(F.col("w").alias("w1"), F.col("uc").alias("uc1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("uc").alias("uc2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.log(
                F.greatest(
                    F.col("bc") / F.col("uc1"),
                    F.lit(float(alpha)) * F.col("uc2") / F.col("__tot"),
                )
            ).alias("lp"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("lp").alias("__avg"),
    )
    base = df.select(F.col(id_col))
    out = base.join(per_doc, id_col, "left")
    return out.select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
        F.round(F.col("__avg"), 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("__avg")), 6).alias("ppl_proxy"),
    )


# the Gopher quality-filter rule set needs a *specific* stopword list
# (Rae et al. 2021 §A1.1: "the, be, to, of, and, that, have, with")
REQUIRED_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
    max_top_bigram_frac: float = 0.18,
    max_top_trigram_frac: float = 0.16,
    with_repetition: bool = True,
) -> DataFrame:
    """Gopher-style composite quality filter (Rae et al. 2021 §A1.1,
    public rule set): per-document keep/drop with the FAILED rule names,
    so a pipeline can both filter and audit why documents fell out.

    Rules (each threshold a kwarg):
      word_count      n_words ∈ [min_words, max_words]
      mean_word_len   mean characters per word ∈ [min, max]
      symbol_ratio    ('#' + '...') occurrences / n_words ≤ max
      alpha_words     frac of words containing a letter ≥ min
      stopwords       ≥ N distinct of the 8 Gopher required stopwords
      bigram_rep / trigram_rep (with_repetition=True)
                      top-{2,3}-gram mass ≤ max (via repetition_signals)

    Output: (id, n_words, mean_word_len, alpha_word_frac, keep,
    reasons) — reasons is the comma-joined failed-rule list in fixed
    order (empty string = keep). Scale shape: the document-level rules
    are ONE codegen projection over the token array (no shuffle); the
    two repetition rules reuse repetition_signals' two hash aggregates
    and join back on the id — cut `with_repetition` to stay
    shuffle-free. Thresholds compare the same float arithmetic in the
    DuckDB twin (integer-exact numerators/denominators, IEEE division),
    so keep/reasons are engine-exact."""
    c = F.col(text_col)
    ws = words(F.lower(c))
    nw = F.coalesce(F.size(ws), F.lit(0))
    nw = F.greatest(nw, F.lit(0))
    sum_len = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    mean_wl = F.when(nw > 0, sum_len / nw).otherwise(F.lit(0.0))
    n_symbols = F.coalesce(
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit("\\.\\.\\.")),
        F.lit(0),
    )
    sym_ratio = F.when(nw > 0, n_symbols / nw).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]")))
    alpha_frac = F.when(nw > 0, n_alpha / nw).otherwise(F.lit(0.0))
    n_req_stop = F.size(
        F.array_distinct(F.filter(ws, lambda w: w.isin(*REQUIRED_STOPWORDS)))
    )
    n_req_stop = F.coalesce(n_req_stop, F.lit(0))

    stage1 = df.select(
        F.col(id_col),
        nw.alias("n_words"),
        mean_wl.alias("__mwl"),
        sym_ratio.alias("__sym"),
        alpha_frac.alias("__alpha"),
        n_req_stop.alias("__nstop"),
    )
    fails = [
        (
            "word_count",
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words),
        ),
        (
            "mean_word_len",
            (F.col("__mwl") < min_mean_word_len) | (F.col("__mwl") > max_mean_word_len),
        ),
        ("symbol_ratio", F.col("__sym") > max_symbol_word_ratio),
        ("alpha_words", F.col("__alpha") < min_alpha_word_frac),
        ("stopwords", F.col("__nstop") < min_required_stopwords),
    ]
    if with_repetition:
        rep = repetition_signals(df, text_col, id_col).select(
            F.col(id_col), "top_bigram_frac", "top_trigram_frac"
        )
        stage1 = stage1.join(rep, id_col)
        fails += [
            ("bigram_rep", F.col("top_bigram_frac") > max_top_bigram_frac),
            ("trigram_rep", F.col("top_trigram_frac") > max_top_trigram_frac),
        ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in fails]
    )
    return stage1.select(
        F.col(id_col),
        F.col("n_words"),
        F.round(F.col("__mwl"), 6).alias("mean_word_len"),
        F.round(F.col("__alpha"), 6).alias("alpha_word_frac"),
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )
