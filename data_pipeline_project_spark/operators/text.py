"""Text-analysis operators for the training-data pipeline surface
(BASELINE.json north star; no counterpart in the reference).

Everything is built from Spark higher-order functions over token
arrays — per-row JVM expressions, zero shuffles, zero Python UDFs —
so cost is linear in tokens and the operators compose with any
downstream groupBy/join at 100 TB.

Cross-engine determinism (the oracle contract): tokenization is
``lower → regexp split [^a-z0-9]+ → drop empties``; the shared integer
token hash is the first 15 hex digits of md5 as a bigint — verified to
produce identical values in Spark (``conv(substr(md5(x),1,15),16,10)``)
and DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Rolling-hash / minhash modulus: keeps every intermediate product
# inside int64 under ANSI mode (h < 1e9, multiplier 31 or a_i < 2^30).
HASH_MOD = 1_000_000_007
FINGERPRINT_MOD = 10**15

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# Tiny per-language marker lexicons for the n-gram/marker heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "is", "to", "a"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "fr": ("le", "la", "et", "les", "des", "un"),
}


def tokens(col: Column) -> Column:
    """lower → regexp split → drop empties (identical to the DuckDB
    oracle's string_split_regex + list_filter)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


# GPT-2-style pretokenizer classes, restricted to syntax that means the
# same thing in Java regex (Spark) and RE2 (DuckDB): letter runs, digit
# runs, punctuation runs (each with optional leading space), whitespace
# runs. Real BPE would further merge within these pieces; counting the
# pieces is the standard fast token-budget estimate.
BPE_SPLIT_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pretokenization via regexp_extract_all (JVM-side)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_SPLIT_RE), 0)


def ngrams(toks: Column, n: int) -> Column:
    """Positional (non-distinct) word n-grams over a token array —
    unlike ``dedup.shingles`` this keeps every occurrence, which is
    what repetition statistics need (a doc that repeats one trigram 50
    times must count 50, not 1). Guarded so documents shorter than
    ``n`` tokens yield an empty array rather than a reversed
    ``sequence`` range."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_hash(col: Column) -> Column:
    """Deterministic cross-engine bigint hash of a token (md5 prefix)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def stopword_ratio(toks: Column) -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: mean token length band,
    stopword presence, alphanumeric density. Deliberately simple and
    SQL-expressible — the point is the columnar pattern (C4-style
    quality filters run exactly like this at scale)."""
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.when(
        n > 0, F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)) / n
    ).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z0-9]", ""))
    alpha_ratio = F.when(F.length(text) > 0, alpha / F.length(text)).otherwise(F.lit(0.0))
    len_component = F.when((mean_len >= 3) & (mean_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_component = F.when(stopword_ratio(toks) > 0, F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round((len_component + stop_component + alpha_ratio) / 3, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-hit count per language over the distinct token set."""
    toks = F.array_distinct(tokens(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in sorted(LANG_MARKERS.items())
    }


def detected_lang(text: Column) -> Column:
    """Marker-lexicon language ID: argmax of marker hits; ties go to
    the lexicographically-first language (a CASE chain ordered by name,
    each arm testing >= the max of the rest); no hits → 'unknown'.
    The DuckDB oracle mirrors the identical CASE chain."""
    scores = lang_scores(text)
    langs = sorted(scores)
    expr = F.lit("unknown")
    for lang in reversed(langs):
        rest = [scores[o] for o in langs if o > lang]
        cond = (scores[lang] > 0)
        if rest:
            cond = cond & (scores[lang] >= F.greatest(*rest) if len(rest) > 1 else scores[lang] >= rest[0])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over the token-hash sequence
    (order-sensitive document fingerprint): fold of
    ``acc*31 + (h % HASH_MOD) (mod FINGERPRINT_MOD)``."""
    hashes = F.transform(tokens(text), lambda t: token_hash(t) % HASH_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD,
    )


# ---- Arrow kernel form -----------------------------------------------------

TEXT_STATS_FIELDS = (
    "struct<n_tokens:int,n_distinct_tokens:int,quality:double,"
    "detected_lang:string,doc_fingerprint:long>"
)


def _text_stats_kernel(texts):
    """All five per-document stats in one Python pass (token md5s
    batched per Arrow batch via functions/md5_batch). Every arithmetic
    step replicates the SQL oracle's op order exactly: mean/ratio
    double divisions, the (len + stop + alpha)/3 left-fold, the
    (acc*31 + h) % mod integer recurrence, and half-away-from-zero
    rounding at 1e-6."""
    import math
    import re

    import pandas as pd

    pat = re.compile(TOKEN_SPLIT_RE)
    strip = re.compile("[^a-z0-9]")
    stops = set(STOPWORDS)
    langs = sorted(LANG_MARKERS)
    markers = {lang: set(LANG_MARKERS[lang]) for lang in langs}

    rows = {k: [] for k in ("n_tokens", "n_distinct_tokens", "quality",
                            "detected_lang", "doc_fingerprint")}
    # Batch-hash the BATCH VOCABULARY once (r14, guide §4.2 — no
    # per-token md5 calls inside the doc loop); the fingerprint fold
    # below is pure integer arithmetic over these lookups.
    from data_pipeline_project_spark.functions.md5_batch import (
        md5_prefix60_strings,
    )

    tok_lists = []
    for t in texts:
        low = t.lower() if t else ""
        tok_lists.append([x for x in pat.split(low) if x])
    vocab = list(dict.fromkeys(x for toks in tok_lists for x in toks))
    hmod = dict(
        zip(vocab, (md5_prefix60_strings(vocab) % HASH_MOD).tolist())
    )
    for t, toks in zip(texts, tok_lists):
        low = t.lower() if t else ""
        dtoks = list(dict.fromkeys(toks))
        n = len(toks)

        mean_len = (sum(len(x) for x in toks) / n) if n else 0.0
        len_comp = 1.0 if (n > 0 and 3 <= mean_len <= 10) else 0.5
        stop_comp = 1.0 if any(x in stops for x in toks) else 0.5
        alpha_ratio = (len(strip.sub("", low)) / len(t)) if t else 0.0
        q = (len_comp + stop_comp + alpha_ratio) / 3
        quality = math.floor(q * 1e6 + 0.5) / 1e6  # q >= 0: half-up

        dset = set(dtoks)
        scores = {lang: len(dset & markers[lang]) for lang in langs}
        detected = "unknown"
        for i, lang in enumerate(langs):
            rest = [scores[o] for o in langs[i + 1 :]]
            if scores[lang] > 0 and (not rest or scores[lang] >= max(rest)):
                detected = lang
                break

        fp = 0
        for x in toks:
            fp = (fp * 31 + hmod[x]) % FINGERPRINT_MOD

        rows["n_tokens"].append(n)
        rows["n_distinct_tokens"].append(len(dtoks))
        rows["quality"].append(quality)
        rows["detected_lang"].append(detected)
        rows["doc_fingerprint"].append(fp)
    return pd.DataFrame(rows)


def text_stats_struct(col: Column) -> Column:
    """Kernel form of (token_count, distinct_token_count, quality_score,
    detected_lang, fingerprint) — one Arrow batch pass instead of five
    interpreted expression trees (the fingerprint alone is ~50 md5
    expression evals per row)."""
    from data_pipeline_project_spark.operators.similarity import _udf

    return _udf("text_stats", _text_stats_kernel, TEXT_STATS_FIELDS)(col)


# PII/URL scrubbing (C4-style cleanup). Patterns stay inside the
# regex subset Java regex and RE2 (DuckDB) interpret identically: no
# lookaround, no backreferences, explicit character classes.
SCRUB_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+", "<EMAIL>"),
    ("url", r"https?://[^ \t\n]+", "<URL>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def scrub_pii(col: Column) -> Column:
    """Replace emails, URLs, and international-format phone numbers
    with typed placeholder tokens — the pre-training privacy scrub
    every public-corpus pipeline runs before tokenization. Chained JVM
    ``regexp_replace`` (order: email first, so user@host never
    half-matches the URL rule), zero Python, streams through the scan."""
    out = col
    for _, pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_flags(col: Column) -> Column:
    """Struct of booleans (had_email, had_url, had_phone) — the audit
    columns kept beside the scrubbed text so downstream filtering can
    drop or downweight PII-bearing documents."""
    return F.struct(
        *[
            col.rlike(pat).alias(f"had_{name}")
            for name, pat, _ in SCRUB_PATTERNS
        ]
    )


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization via an Arrow kernel (Python
    ``unicodedata`` implements the same Unicode standard DuckDB's
    ``nfc_normalize`` does, so the outputs hash-match cross-engine).
    The corpus-prep step that makes byte-level dedup see 'café'
    (precomposed) and 'café' (combining accent) as the same document.
    JVM Spark has no NFC builtin, so this is the legitimate
    pandas-UDF case: per-string library call, Arrow-batched."""
    from data_pipeline_project_spark.operators.similarity import _udf

    def kernel(texts):
        import unicodedata

        import pandas as pd

        return pd.Series(
            [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in texts
            ]
        )

    return _udf("nfc_normalize", kernel, "string")(col)


def encoding_stats(col: Column) -> Column:
    """Struct of mojibake/encoding-health signals, all JVM-side:
    ``n_replacement`` (U+FFFD count — the scar UTF-8 decoding leaves on
    bytes it couldn't parse), ``n_control`` (C0 control chars except
    tab/newline/CR — binary-in-text contamination), ``ascii_ratio``
    (rounded to 6). The triage columns a corpus-prep pipeline filters
    on before spending tokenizer cycles."""
    n = F.length(col)
    n_repl = n - F.length(F.replace(col, F.lit("�"), F.lit("")))
    n_ctrl = n - F.length(
        F.regexp_replace(col, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    )
    ascii_ratio = F.when(n > 0,
        F.round(
            F.length(F.regexp_replace(col, "[^\\x00-\\x7F]", "")).cast("double")
            / n,
            6,
        ),
    ).otherwise(F.lit(1.0))
    return F.struct(
        n_repl.cast("bigint").alias("n_replacement"),
        n_ctrl.cast("bigint").alias("n_control"),
        ascii_ratio.alias("ascii_ratio"),
    )


def compression_signals(col: Column, level: int = 6) -> Column:
    """Struct of zlib compressibility signals per document: ``n_bytes``
    (UTF-8 length), ``n_compressed`` (DEFLATE at ``level``),
    ``compression_ratio`` (compressed/raw, rounded to 6; empty doc →
    1.0). The Gopher/RefinedWeb-style repetitiveness signal: boilerplate
    and template spam compress far below natural prose, while random or
    binary junk barely compresses at all — one scalar separates both
    failure modes from quality text.

    Not SQL-expressible (no DEFLATE in either engine's SQL surface), so
    this is the legitimate Arrow-kernel case: per-row CPU-bound library
    call, batched via pandas_udf, no shuffle — cost is linear in corpus
    bytes and rides the scan, exactly like the decode kernels in
    operators/multimodal.py. zlib output for a given (input, level) is
    deterministic across platforms (RFC 1950 stream, fixed strategy),
    so the signal is stable across executors and reruns."""
    from data_pipeline_project_spark.operators.similarity import _udf

    def kernel(texts):
        import math
        import zlib

        import pandas as pd

        n_bytes, n_comp, ratio = [], [], []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if not raw:
                n_bytes.append(0)
                n_comp.append(0)
                ratio.append(1.0)
                continue
            c = len(zlib.compress(raw, level))
            n_bytes.append(len(raw))
            n_comp.append(c)
            ratio.append(math.floor(c / len(raw) * 1e6 + 0.5) / 1e6)
        return pd.DataFrame(
            {"n_bytes": n_bytes, "n_compressed": n_comp, "compression_ratio": ratio}
        )

    return _udf(
        f"compression_signals_l{level}",
        kernel,
        "struct<n_bytes:bigint,n_compressed:bigint,compression_ratio:double>",
    )(col)


def compressibility_flags(
    col: Column, lo: float = 0.2, hi: float = 0.8
) -> Column:
    """Filter verdict on top of :func:`compression_signals`:
    ``too_repetitive`` (ratio < lo — template/boilerplate spam),
    ``incompressible`` (ratio > hi — random-character contamination),
    ``keep`` (neither). Thresholds are corpus-tuned in practice; these
    defaults bracket natural-language prose (~0.3–0.6 at zlib-6).
    Note the ceiling: uniform-random PRINTABLE text tops out near
    ~0.85 (Huffman packs ~6.6 bits into each 8-bit char), so ``hi``
    above that can never fire on string payloads."""
    sig = compression_signals(col)
    r = sig["compression_ratio"]
    return F.struct(
        (r < lo).alias("too_repetitive"),
        (r > hi).alias("incompressible"),
        ((r >= lo) & (r <= hi)).alias("keep"),
        sig["compression_ratio"].alias("compression_ratio"),
    )


def hashed_doc_vectors(
    docs,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
):
    """Feature-hashing document vectors: term counts hashed into a
    ``dim``-dimensional dense array with a deterministic md5 bucket AND
    sign (the signed hashing trick — collisions cancel in expectation
    instead of stacking), L2-normalized. The bridge from the text tier
    to the embedding tier: a corpus with NO model-produced embeddings
    can still run every vector operator (cosine_topk, semantic_dedup,
    IVF/PQ indexes) on these — the classic cheap-retrieval baseline,
    and deterministic across engines/cluster sizes unlike a trained
    embedding.

    A document with zero tokens has no vector and is absent from the
    result (join back to the corpus to decide its fate explicitly).

    Plan: one (doc, term, count) aggregate (the tf-idf shuffle), then
    per-doc bucket sums and a dense-array assembly via map_from_entries
    + lookup — all JVM expressions, no UDF; the vector never exceeds
    ``dim`` doubles per doc."""
    from pyspark.sql import functions as F

    tok = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    dt = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("k"))
    h = token_hash(F.col("term"))
    signed = dt.select(
        id_col,
        (h % dim).alias("bucket"),
        # second, independent bit of the same digest decides the sign
        F.when((h % (2 * dim)) >= dim, F.col("k")).otherwise(-F.col("k")).alias("sv"),
    )
    per_bucket = signed.groupBy(id_col, "bucket").agg(F.sum("sv").alias("v"))
    assembled = (
        per_bucket.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("bucket"), F.col("v")))
            ).alias("m")
        )
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at("m", i.cast("bigint")), F.lit(0)
                ).cast("double"),
            ).alias("_raw"),
        )
    )
    norm = F.sqrt(
        F.aggregate("_raw", F.lit(0.0), lambda a, x: a + x * x)
    )
    return assembled.select(
        id_col,
        F.transform(
            "_raw", lambda x: (x / F.when(norm > 0, norm).otherwise(F.lit(1.0))).cast("float")
        ).alias(out_col),
    )
