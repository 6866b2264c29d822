"""Scalar functions / expressions (SURVEY.md §2.5, R17-R25 + text helpers).

Everything here is a Column-in, Column-out expression built from JVM-side
``pyspark.sql.functions`` — zero Python UDFs, so every call stays inside
whole-stage codegen and is pushdown/pruning-friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "regex_extract",
    "cast_int_hive",
    "parse_money",
    "case_ladder",
    "tokenize",
    "token_count",
    "bpe_ish_token_count",
    "normalize_text",
    "punct_ratio",
    "digit_ratio",
    "upper_ratio",
    "stopword_ratio",
    "ascii_ratio",
    "repetition_ratio",
    "quality_score",
    "doc_fingerprint",
    "bag_fingerprint",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "key_sample_pred",
    "row_sample_pred",
    "redact_pii",
    "pii_counts",
    "PII_PATTERNS",
    "normalize_url",
    "strip_html",
    "url_domain",
    "salted_row_key",
]


def regex_extract(col: Column | str, pattern: str, group: int = 1) -> Column:
    """Pig REGEX_EXTRACT parity: NULL on non-match (README.md:127,140).

    Spark's ``regexp_extract`` returns '' on non-match; Pig returns NULL and
    the reference's data-quality pipeline filters on ``match is null``
    (README.md:128). Wrap with nullif to preserve those semantics — the known
    trap called out in SURVEY.md §7.
    """
    return F.nullif(F.regexp_extract(col, pattern, group), F.lit(""))


def cast_int_hive(col: Column | str) -> Column:
    """Hive ``cast(string as int)``: NULL on failure (README.md:239,256).

    TRIM first because the reference CSV carries padded numerics like
    ' 13 ' (README.md:170, FIXTURES.md F1). Spark's ANSI-off string->int
    cast is NOT Hive parity on its own: it routes through a decimal parse,
    so ``'.'`` -> 0 and ``'1.5'`` -> 1, where Hive's LazyInteger returns
    NULL for any non-pure-integer string (hypothesis found the ``'.'``
    case). Gate the cast on a strict ``[+-]?digits`` match — anchored
    ``\\A..\\z``, not ``^..$``, because Java's ``$`` matches before a
    trailing newline so ``'123\\n'`` would slip through (space-only
    ``trim`` does not strip it; Hive NULLs it). Out-of-range pure
    integers still overflow to NULL under the ANSI-off cast, which Hive
    also NULLs. Stays a codegen-able expression — no UDF.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c)
    return F.when(s.rlike(r"\A[+-]?[0-9]+\z"), s.cast("int"))


def parse_money(col: Column | str) -> Column:
    """Engine extension R24: '$50.03' / '$1,234.56' → decimal(18,2).

    The reference stores money as $-prefixed strings and never parses them
    (README.md:52-56,170-171); NULL on malformed input (ANSI off).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.trim(c), r"[$,]", "").cast("decimal(18,2)")


def case_ladder(
    col: Column, boundaries: list[tuple[Column, str]], otherwise: str
) -> Column:
    """CASE WHEN ladder (R17, README.md:238-251): first boundary with
    ``col <= boundary`` wins, ELSE ``otherwise``."""
    expr = None
    for bound, label in boundaries:
        cond = col <= bound
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "case_ladder needs at least one arm"
    return expr.otherwise(otherwise)


# ---------------------------------------------------------------------------
# Text analysis primitives (X4) — all JVM-side expressions.
# ---------------------------------------------------------------------------

def tokenize(col: Column | str, sep: str = " ") -> Column:
    """Python ``str.split(' ')`` parity (R22, README.md:297,385): literal
    single-separator split, empty tokens kept (limit=-1)."""
    import re

    return F.split(col, re.escape(sep), -1)


def token_count(col: Column | str, sep: str = " ") -> Column:
    return F.size(tokenize(col, sep))


#: GPT-2-style pretokenizer shape: contractions, letter runs (with optional
#: leading space), digit runs, punctuation runs, residual whitespace.
BPE_ISH_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate LLM token count: matches of a GPT-2-ish pretokenizer
    regex (the standard cheap estimator for training-data budgeting when
    the real tokenizer isn't on the cluster). JVM-side regexp_count; the
    \\p{L}/\\p{N} classes behave identically in Java regex and RE2."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact dedup (X1): lowercase, collapse whitespace,
    trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    punct = n - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def digit_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    digits = n - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return F.when(n > 0, digits / n).otherwise(F.lit(0.0))


def upper_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    uppers = n - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return F.when(n > 0, uppers / n).otherwise(F.lit(0.0))


_DEFAULT_STOPWORDS = (
    "the a an and or of to in is are was were for on with as at by it this that",
)


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords — a standard text
    quality signal for LLM-data filtering (expression-only, no UDF)."""
    words = stopwords if stopwords is not None else _DEFAULT_STOPWORDS[0].split()
    toks = F.split(F.lower(col), r"\s+", -1)
    n = F.size(toks)
    sw = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(n > 0, sw / n).otherwise(F.lit(0.0))


def ascii_ratio(col: Column | str) -> Column:
    """Fraction of characters in the 7-bit ASCII range — the standard
    charset quality signal for LLM-data filtering."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    ascii_n = F.length(F.regexp_replace(c, r"[^\x00-\x7F]", ""))
    return F.when(n > 0, ascii_n / n).otherwise(F.lit(1.0))


def repetition_ratio(col: Column | str) -> Column:
    """1 − distinct/total whitespace tokens: near 0 = diverse text, near 1 =
    boilerplate/repeated content (cheap boilerplate detector)."""
    toks = F.split(F.lower(col), r"\s+", -1)
    n = F.size(toks)
    distinct = F.size(F.array_distinct(toks))
    return F.when(n > 0, 1.0 - distinct / n).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] heuristic quality score for documents: rewards
    mid-length texts with low punctuation/digit noise and a natural stopword
    share. Deterministic, expression-only."""
    c = F.col(col) if isinstance(col, str) else col
    length_term = F.least(F.length(c) / F.lit(500.0), F.lit(1.0))
    noise_term = F.lit(1.0) - F.least(
        punct_ratio(c) + digit_ratio(c), F.lit(1.0)
    )
    sw_term = F.least(stopword_ratio(c) * F.lit(4.0), F.lit(1.0))
    return (length_term + noise_term + sw_term) / F.lit(3.0)


def doc_fingerprint(col: Column | str) -> Column:
    """64-bit deterministic document fingerprint: xxhash64 of the normalized
    text. Stable across partitionings and sessions."""
    return F.xxhash64(normalize_text(col))


def bag_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted distinct
    token bag. Robust to token reordering (unlike doc_fingerprint) and
    portable across engines (md5, not engine hash) so it is oracle-exact."""
    toks = F.array_sort(F.array_distinct(F.split(normalize_text(col), " ", -1)))
    return F.md5(F.concat_ws(" ", toks))


# ---------------------------------------------------------------------------
# Vector primitives (X2) — expression-built, no UDF; inputs array<float|double>.
# ---------------------------------------------------------------------------

def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# ---------------------------------------------------------------------------
# Portable deterministic sampling predicate (R28)
# ---------------------------------------------------------------------------

def key_sample_pred(col: Column | str, fraction_hex2: str = "32") -> Column:
    """All-or-none by-key sampling predicate (fixes the reference's broken
    DataFu SampleByKey example, README.md:173-179): keep every row whose
    key's md5 prefix ≤ ``fraction_hex2``. md5 is identical across engines,
    so this is *exactly* reproducible in any SQL oracle (unlike hash()).
    '32' keeps 0x00..0x32 → 51/256 ≈ 19.9%."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, 2) <= F.lit(fraction_hex2)


def row_sample_pred(
    key_cols: list[Column | str], fraction: float, precision: int = 4
) -> Column:
    """Portable per-ROW Bernoulli sampling predicate (R26/R27/R30 reference
    semantics, README.md:159,229): md5 over the concatenated row key, keep
    rows whose first ``precision`` hex chars fall below
    ``fraction * 16^precision``.

    Unlike ``df.sample(seed=...)`` (whose RNG stream depends on partition
    layout), this is bit-identical on any engine and any partitioning —
    hence DuckDB-oracle hash-matchable. Fraction granularity is
    ``16^-precision`` (1/65536 at the default). Key columns must uniquely
    identify a row for true Bernoulli behavior; duplicates sample
    all-or-none (which is R28's by-key semantics). ``fraction >= 1`` keeps
    every row (the hex threshold caps at 16^precision, above any md5
    prefix); ``fraction <= 0`` keeps none."""
    if fraction >= 1.0:
        return F.lit(True)
    threshold = format(
        max(0, int(fraction * 16**precision)), f"0{precision}x"
    )
    key = F.concat_ws(
        "|",
        *[
            (F.col(c) if isinstance(c, str) else c).cast("string")
            for c in key_cols
        ],
    )
    return F.substring(F.md5(key), 1, precision) < F.lit(threshold)


#: PII patterns (Java regex, applied in this order — specific before generic
#: so e.g. an IPv4 octet run is not half-eaten by the phone pattern).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "credit_card": (r"\b\d{4}[ \-]\d{4}[ \-]\d{4}[ \-]\d{4}\b", "<CC>"),
    "phone": (
        r"(?<![\w.])(?:\+?\d{1,2}[ .\-]?)?(?:\(\d{3}\)|\d{3})[ .\-]\d{3}[ .\-]\d{4}\b",
        "<PHONE>",
    ),
}


def redact_pii(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Mask PII spans with typed placeholder tokens — the standard scrub
    step before text enters a training set. Pure chained ``regexp_replace``
    (JVM, codegen'd): zero Python in the hot path, linear per row.

    ``kinds`` subsets/orders :data:`PII_PATTERNS` (default: all, in the
    dict's specific-before-generic order). Heuristic by design — regex PII
    detection trades recall for throughput; a model-backed pass would ride
    the same seam as ``ner_entities``.
    """
    out = F.col(col) if isinstance(col, str) else col
    for kind in list(PII_PATTERNS) if kinds is None else kinds:
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str, kinds: list[str] | None = None) -> Column:
    """Per-row PII hit counts as a struct (one ``regexp_count`` per kind) —
    the audit/report companion to :func:`redact_pii`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        *[
            F.regexp_count(c, F.lit(PII_PATTERNS[k][0])).alias(k)
            for k in (list(PII_PATTERNS) if kinds is None else kinds)
        ]
    )


def normalize_url(col: Column | str) -> Column:
    """Canonical URL form for crawl-side dedup — the FIRST dedup a web
    pipeline runs (URL identity is free; content hashing costs a fetch).
    Expression-only (regex + array ops, fully codegen-able; NULL in →
    NULL out):

    * scheme dropped (http/https/ftp treated as one identity),
    * host lowercased and leading ``www.`` dropped (hosts are
      case-insensitive; paths keep their case — they are not),
    * fragment (``#...``) dropped (client-side only),
    * trailing slashes trimmed,
    * tracking params dropped (``utm_*``, ``gclid``, ``fbclid``, ``ref``),
    * remaining query params sorted (param order is not identity).
    """
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    # scheme ("https://") OR protocol-relative ("//host/...") prefix —
    # scraped href lists mix both spellings of the same page
    c = F.regexp_replace(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*:)?//", "")
    host = F.lower(F.regexp_extract(c, r"^([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(c, r"^[^/?#]+", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&", -1),
        lambda p: (p != "")
        & ~p.rlike(r"^(utm_[^=]*|gclid|fbclid|ref)(=|$)"),
    )
    q = F.array_join(F.array_sort(params), "&")
    return F.when(
        q != "", F.concat(host, path, F.lit("?"), q)
    ).otherwise(F.concat(host, path))


def strip_html(col: Column | str) -> Column:
    """HTML → visible text, expression-only (chained regexp_replace, all
    codegen): drops ``<script>``/``<style>`` blocks and comments wholesale,
    strips remaining tags, decodes the common entities, collapses
    whitespace. The crawl-side extraction step before any text operator
    runs.

    Fidelity seam, documented like the NER/codec stubs: this is the
    regex approximation — no DOM, no boilerplate heuristics (nav/footer
    text survives; pair with :func:`~datamunging_spark.operators.dedup.
    paragraph_dedup`, which removes exactly that cross-page boilerplate).
    A production extractor (readability/trafilatura-class) slots in as a
    pandas_udf over the same column when the library is available."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    # block-level closers/separators become newlines so paragraphs survive
    c = F.regexp_replace(
        c, r"(?i)</(p|div|br|li|h[1-6]|tr|table|blockquote)\s*>|<br\s*/?>", "\n"
    )
    c = F.regexp_replace(c, r"(?s)<[^>]+>", " ")
    for ent, rep in (
        ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
    ):
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    return F.trim(F.regexp_replace(c, r"\n{2,}", "\n"))


def url_domain(col: Column | str, registered: bool = True) -> Column:
    """Host / registered-domain extraction from a URL — the grouping key
    for per-domain corpus caps (``cap_per_group``) and domain-mix reports.
    ``registered=True`` keeps the last two labels of the host
    (example.co + uk-style public-suffix awareness needs a suffix list;
    documented approximation: two labels, which is right for .com/.org/
    .net-class suffixes and merges rather than splits for ccSLDs —
    the safe direction for a contribution CAP). ``registered=False``
    returns the full lowercased host with any ``www.`` stripped."""
    c = F.trim(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*:)?//", "")
    host = F.lower(F.regexp_extract(c, r"^([^/?#:]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    if not registered:
        return host
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    # dotless hosts (localhost, intranet names) have no two-label form;
    # falling back to the host itself keeps them as DISTINCT cap groups
    # instead of one merged '' bucket
    return F.when(two == "", host).otherwise(two)


def salted_row_key(id_cols: list[Column | str], salt: str = "0") -> Column:
    """Salted md5 row key — the shared primitive behind the deterministic
    permutation family (``training_shuffle`` order, ``cap_per_group`` rank):
    md5("salt|id1|id2|..."). One definition so epoch-salt semantics can
    never diverge between the shuffle and the cap. ``id_cols`` must
    uniquely identify a row for the induced order to be a permutation."""
    return F.md5(
        F.concat_ws(
            "|",
            F.lit(salt),
            *[
                (F.col(c) if isinstance(c, str) else c).cast("string")
                for c in id_cols
            ],
        )
    )
