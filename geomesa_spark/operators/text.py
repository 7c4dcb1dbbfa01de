"""Text-analysis operators: quality scoring, token counting, fingerprinting,
n-gram language-ID.

Pure Catalyst expressions throughout (whole-stage codegen); ratio outputs are
floor-scaled integers (ppm / milli) instead of round() so the DuckDB oracle
matches bit-for-bit regardless of rounding mode.

Reference parity: GeoMesa's converter transforms (convert2/transforms/
StringFunctionFactory.scala: strLen/regexReplace/..., IdFunctionFactory
.scala: md5/murmur3_32) are the string-function surface these build on; the
n-gram language scorer follows the classic Cavnar-Trenkle n-gram-profile
method re-expressed as one groupBy + broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geomesa_spark.functions import portable as pt

STOPWORDS = ("the", "a", "of", "and", "to")


def _feature_cols(text_col: str) -> dict:
    """All per-doc text-feature Columns, keyed by output name — the single
    source of truth for text_quality / token_counts / fingerprint AND the
    one-scan text_features composition (repeated subexpressions collapse
    under codegen common-subexpression elimination; ratios floor-scaled to
    integers so the DuckDB oracle matches bit-for-bit)."""
    d = pt.SPARK
    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = pt.tokens(text_col, d)
    n_tok = F.expr(f"size({toks})")
    n_alpha = F.expr(f"length(replace(replace({text_col}, ' ', ''), ',', ''))")
    n_stop = F.expr(f"size(filter({toks}, t -> array_contains(array({sw}), t)))")
    n_punct = (F.length(text_col)
               - F.expr(f"length(replace({text_col}, ',', ''))"))
    stop_ppm = F.floor(n_stop * 1e6 / n_tok)
    punct_ppm = F.floor(n_punct * 1e6 / F.length(text_col))
    return {
        "n_tok": n_tok,
        "mean_tok_len_milli": F.floor(n_alpha * 1000.0 / n_tok).cast("long"),
        "stop_ppm": stop_ppm.cast("long"),
        "punct_ppm": punct_ppm.cast("long"),
        # composite: reward stopword presence, penalize punctuation,
        # saturate length at 100 tokens — floor before cast (DuckDB
        # CAST(double AS bigint) rounds; Spark truncates)
        "quality_ppm": F.floor(F.least(n_tok, F.lit(100)) * 10000.0 / 100.0
                               + stop_ppm / 2.0
                               - punct_ppm / 4.0).cast("long"),
        "ws_tokens": F.expr(f"size({toks})"),
        "bpe_tokens": F.expr(f"regexp_count({text_col}, '[a-z]{{1,4}}')"),
        "fp": F.expr(pt.char_fold(text_col, pt.SPARK)),
    }


_QUALITY_KEYS = ("n_tok", "mean_tok_len_milli", "stop_ppm", "punct_ppm",
                 "quality_ppm")


def text_quality(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-doc quality metrics: token count, mean token length (milli),
    stopword ratio (ppm), punctuation ratio (ppm), composite score (ppm).

    Heuristics follow standard training-data quality filters (length,
    stopword density, punctuation density).
    """
    cols = _feature_cols(text_col)
    return df.select(id_col, *(cols[k].alias(k) for k in _QUALITY_KEYS))


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword count (<=4-char greedy chunks)."""
    cols = _feature_cols(text_col)
    return df.select(id_col, cols["ws_tokens"].alias("ws_tokens"),
                     cols["bpe_tokens"].alias("bpe_tokens"))


def fingerprint(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash of the full text -> bigint (content fingerprint)."""
    return df.select(id_col, _feature_cols(text_col)["fp"].alias("fp"))


def text_features(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Quality + token counts + fingerprint in ONE corpus scan (a single
    Project — no joins, no re-scan; the former three-way doc_id join
    planned three scans plus two shuffles for row-wise math)."""
    cols = _feature_cols(text_col)
    order = _QUALITY_KEYS + ("ws_tokens", "bpe_tokens", "fp")
    return df.select(id_col, *(cols[k].alias(k) for k in order))


def _bigram_rows(docs: DataFrame, id_col: str, text_col: str,
                 lang_col: str) -> DataFrame:
    """(id, lang, bg) rows: char-bigram hashes via explode + lead.

    bigram hash = ascii(c1)*256 + ascii(c2): cheap, portable, collision-free.
    Exploding chars BEFORE hashing keeps the work O(len) per doc — the array
    form (`transform(sequence(...), i -> substring(text, i, 1)...)`) is
    O(len^2) because each substring call rescans the string.
    """
    bigs = (f"zip_with(slice(split({text_col}, ''), 1, length({text_col}) - 1), "
            f"slice(split({text_col}, ''), 2, length({text_col}) - 1), "
            f"(a, b) -> ascii(a) * 256 + ascii(b))")
    return (docs
            .select(id_col, lang_col, F.explode(F.expr(bigs)).alias("bg")))


def langid(docs: DataFrame, id_col: str = "doc_id",
           text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """N-gram-profile language ID (Cavnar-Trenkle style, integer-scored).

    Profiles are learned from the corpus itself: weight(bigram, lang) =
    floor(1e6 * count(bigram, lang) / total(lang)).  Each doc is scored by
    the multiset sum of weights, predicted lang = argmax (tie-break: lang
    asc).  Profiles are tiny (langs x bigrams) -> broadcast join; the scoring
    pass is one explode + groupBy.
    """
    # pre-aggregate the exploded bigram stream to compact per-doc counts
    # FIRST (no persist of a bigger-than-corpus exploded table).  The
    # corpus is tokenized twice — once for the profile lineage, once for
    # scoring — with each pass column-pruned to what it needs; Catalyst's
    # exchange reuse cannot share them (pruning makes the exchanges
    # differ), and two cheap pruned passes beat pinning a corpus-sized
    # table in executor memory.  At deployment scale the profile is a
    # write-time artifact anyway (it changes with the corpus, not the
    # query).
    bgc = (_bigram_rows(docs, id_col, text_col, lang_col)
           .groupBy(id_col, lang_col, "bg").agg(F.count("*").alias("c")))
    # per-lang totals via a window over the (lang, bg) aggregation — the
    # profile is ONE lineage (no separate totals scan)
    lang_w = Window.partitionBy(lang_col)
    profile = (bgc.groupBy(lang_col, "bg").agg(F.sum("c").alias("lc"))
               .withColumn("tot", F.sum("lc").over(lang_w))
               .select(F.col(lang_col).alias("cand_lang"), "bg",
                       F.floor(F.col("lc") * 1e6 / F.col("tot"))
                       .cast("long").alias("w")))
    # score = sum over the doc's bigram MULTISET of profile weights = sum(c*w)
    scores = (bgc.join(F.broadcast(profile), "bg")
              .groupBy(id_col, "cand_lang")
              .agg(F.sum(F.col("c") * F.col("w")).alias("score")))
    win = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("cand_lang"))
    return (scores.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select(id_col, F.col("cand_lang").alias("pred_lang"), "score"))
