"""Text features (SURVEY.md §2.7 R33-R37, R42 + X4 text-analysis suite).

The reference's Text Features chapters (TF-IDF README.md:274-310, NER
README.md:312-359, Word2Vec README.md:361-393) re-expressed on DataFrames:
ml.feature transformers for TF/IDF, expression-only heuristics for
language-ID/quality/fingerprinting, and a pandas_udf slot for model-backed
NER (the heavy-model path the reference pays per-row via py4j; we batch via
Arrow).
"""

# NB: no `from __future__ import annotations` here — pandas_udf resolves real
# type hints, and stringized annotations break its signature inference.

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from datamunging_spark.functions import (
    doc_fingerprint,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokenize,
)


def tokenized(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    """R22/R42: whitespace tokenization with Python str.split parity."""
    return df.withColumn(out, tokenize(text_col))


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 20,
    out: str = "tfidf",
) -> DataFrame:
    """TF-IDF pipeline (R33/R34, README.md:293-302): HashingTF(2^20) → IDF.

    2^20 feature cap is the reference's memory-bounding choice
    (README.md:298,306) — kept. ``cache()`` before the IDF fit mirrors
    README.md:299 (IDF is a 2-pass fit)."""
    from pyspark.ml.feature import IDF, HashingTF

    toks = tokenized(df, text_col, "_tokens")
    tf = HashingTF(
        inputCol="_tokens", outputCol="_tf", numFeatures=num_features
    ).transform(toks)
    tf.cache()
    idf_model = IDF(inputCol="_tf", outputCol=out).fit(tf)
    return idf_model.transform(tf).drop("_tokens", "_tf")


def tfidf_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact per-(doc, term) TF-IDF (R33/R34 semantics, README.md:293-302)
    as pure relational algebra — the oracle-checkable, 100 TB shape.

    tf = in-doc term count; idf = ln((N+1)/(df+1)) (the smoothed ml.feature
    IDF formula). Plan: explode → two hash aggregates (doc-term, then term)
    → equi-join on term + broadcast of the single-row corpus count. Unlike
    HashingTF there are no collisions, and every stage is codegen'd with
    map-side partial aggregation.
    """
    terms = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    return (
        tf.join(docfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (
                F.col("tf")
                * F.log((F.col("_n") + 1).cast("double") / (F.col("df") + 1))
            ).alias("tfidf"),
        )
    )


def ner_entities(
    df: DataFrame, text_col: str = "text", out: str = "entities"
) -> DataFrame:
    """Per-row entity extraction (R37, README.md:339-352).

    The reference uses an NLTK tokenize→pos_tag→ne_chunk UDF per line. The
    UDF below tries NLTK once per Python worker (import-gated — the library
    is not in this container) and otherwise uses a deterministic heuristic
    (capitalized-token runs → entity). Either way the Spark-side shape is
    the production plumbing: Arrow-batched pandas_udf returning
    array<string>, model state loaded once per executor, never per row."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(StringType()))
    def _extract(texts: pd.Series) -> pd.Series:
        import re

        try:  # real model path (reference parity when nltk is installed)
            import nltk

            def run(t: str) -> list[str]:
                if t is None:
                    return []
                # binary=True is REQUIRED for 'NE' labels — the reference
                # runs ne_chunk(pos, binary=True) (README.md:344); without
                # it subtree labels are PERSON/GPE/... and the 'NE' filter
                # would silently return [] for every row (r8 parity fix,
                # caught by writing the importorskip golden test)
                tree = nltk.ne_chunk(
                    nltk.pos_tag(nltk.word_tokenize(t)), binary=True
                )
                return [
                    " ".join(w for w, _ in st.leaves())
                    for st in tree.subtrees()
                    if st.label() == "NE"
                ]

            # Probe once; fall back if models/data are missing.
            run("Smoke Test")
        except Exception:

            def run(t: str) -> list[str]:
                if t is None:
                    return []
                # Deterministic stand-in for nltk.ne_chunk: maximal runs
                # of capitalized words.
                return re.findall(r"(?:[A-Z][a-z]+)(?:\s+[A-Z][a-z]+)*", t)

        return texts.map(run)

    return df.withColumn(out, _extract(F.col(text_col)))


# ---------------------------------------------------------------------------
# X4: language-ID, quality scoring, token counting, fingerprinting
# ---------------------------------------------------------------------------

#: Tiny per-language marker lexicons for the n-gram/stopword heuristic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "with"),
    "fr": ("le", "la", "les", "de", "et", "est", "un", "une", "dans"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "es": ("el", "la", "los", "de", "y", "es", "un", "una", "en"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不", "人"),
}


def lang_score(col: Column | str, lang: str) -> Column:
    """Count of ``lang`` marker tokens in the text (expression-only)."""
    markers = _LANG_MARKERS[lang]
    toks = F.split(F.lower(col), r"\s+", -1)
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def detect_language(col: Column | str, langs: tuple[str, ...] = ("en", "fr", "de", "es", "zh")) -> Column:
    """Heuristic language-ID: argmax over marker-token counts, 'und' when no
    marker hits. Deterministic; ties broken by ``langs`` order via a
    strictly-greater comparison chain."""
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = lang_score(col, lang)
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


class LangModelParams(NamedTuple):
    """The fitted multinomial-LR head as plain driver-side arrays (the
    ``ivf_build`` centers convention — r17 replaced the MLlib
    PipelineModel): ``coef`` is an (n_labels, num_features) float64
    matrix, ``intercept`` an (n_labels,) vector; ``gram`` and
    ``num_features`` pin the char-n-gram hashed feature space the
    coefficients were fitted in (feature index of a gram g is
    ``pmod(hash(g), num_features)`` — Spark's Murmur3 ``hash()``, an
    expression, so scoring needs no ML transformer). Persist the two
    arrays + labels + (gram, num_features) as parquet/npz and
    reconstruct with ``LangClassifier(LangModelParams(...), labels)``
    — no ``model.write()`` tier any more."""

    coef: object
    intercept: object
    gram: int
    num_features: int


class LangClassifier(NamedTuple):
    """A fitted model-based language identifier: the
    :class:`LangModelParams` head (driver-fit multinomial LR over
    hashed char-n-gram counts — scoring is pure JVM expressions with
    the coefficient matrix riding a one-row broadcast local table)
    plus the index → language-code mapping the fit derived."""

    model: object
    labels: tuple


def _softmax_fit_np(
    flat_idx,
    row_ptr,
    y,
    n_classes: int,
    num_features: int,
    reg_param: float,
    max_iter: int,
    tol: float = 1e-6,
):
    """Driver-side multinomial logistic regression on hashed sparse
    count rows — the :func:`~datamunging_spark.operators.similarity.
    _kmeans_fit_np` discipline applied to the language-ID head (r16
    verdict item 4: the MLlib fit scheduled ~23 L-BFGS jobs to iterate
    over a ``max_fit_rows``-capped sample that fits in one process).

    Standard L-BFGS (Nocedal & Wright two-loop recursion, history
    m=10) with Armijo backtracking, minimizing the MLlib-shaped
    objective ``(1/n)·Σ cross-entropy + reg_param·½‖W‖²`` (intercepts
    unregularized; no feature standardization — hashed counts share a
    scale by construction). **Convergence contract**: stops when the
    gradient infinity-norm falls below ``tol·max(1, |f|)`` or after
    ``max_iter`` iterations; deterministic (zero init, no RNG).

    Input is the sample's hashed gram indices in flat CSR form:
    ``flat_idx`` (total_nnz int32 feature indices, duplicates = count
    weight), ``row_ptr`` (n+1 offsets), ``y`` (n int labels). Memory is
    O(nnz + n_classes·num_features). Returns ``(coef (C, F),
    intercept (C,), n_iters)``."""
    import numpy as np

    n = len(row_ptr) - 1
    C, Fdim = n_classes, num_features
    row_len = np.diff(row_ptr)
    Y = np.zeros((n, C))
    Y[np.arange(n), y] = 1.0

    def fg(x):
        W = x[: C * Fdim].reshape(C, Fdim)
        b = x[C * Fdim:]
        # logits via segment sums over the flat gram stream
        logits = np.empty((n, C))
        for c in range(C):
            vals = W[c, flat_idx]
            seg = np.add.reduceat(vals, row_ptr[:-1]) if len(vals) else (
                np.zeros(n)
            )
            seg[row_len == 0] = 0.0
            logits[:, c] = seg + b[c]
        logits -= logits.max(axis=1, keepdims=True)
        ex = np.exp(logits)
        P = ex / ex.sum(axis=1, keepdims=True)
        ll = -np.log(
            np.maximum(P[np.arange(n), y], 1e-300)
        ).sum() / n
        f = ll + 0.5 * reg_param * float((W * W).sum())
        A = (P - Y) / n
        gW = np.empty_like(W)
        for c in range(C):
            gW[c] = np.bincount(
                flat_idx, weights=np.repeat(A[:, c], row_len),
                minlength=Fdim,
            )
        gW += reg_param * W
        gb = A.sum(axis=0)
        return f, np.concatenate([gW.ravel(), gb])

    x = np.zeros(C * Fdim + C)
    f, g = fg(x)
    s_hist: list = []
    y_hist: list = []
    iters = 0
    for iters in range(1, max_iter + 1):
        if np.abs(g).max() <= tol * max(1.0, abs(f)):
            break
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, yv, rho in reversed(s_hist):
            a = rho * s.dot(q)
            alphas.append(a)
            q -= a * yv
        if s_hist:
            s, yv, rho = s_hist[-1]
            q *= s.dot(yv) / yv.dot(yv)
        for (s, yv, rho), a in zip(s_hist, reversed(alphas)):
            q += (a - rho * yv.dot(q)) * s
        d = -q
        if d.dot(g) >= 0:  # safeguard: fall back to steepest descent
            d = -g
        # Armijo backtracking
        step = 1.0
        for _ in range(30):
            xn = x + step * d
            fn, gn = fg(xn)
            if fn <= f + 1e-4 * step * d.dot(g):
                break
            step *= 0.5
        else:
            break  # no progress possible at machine precision
        sv, yv = xn - x, gn - g
        sy = sv.dot(yv)
        if sy > 1e-10:
            s_hist.append((sv, yv, 1.0 / sy))
            if len(s_hist) > 10:
                s_hist.pop(0)
        x, f, g = xn, fn, gn
    W = x[: C * Fdim].reshape(C, Fdim)
    return W, x[C * Fdim:], iters


def _lid_grams_col(text_col: str, gram: int):
    """The char-``gram``-gram array expression shared by fit and score
    (one home, so the hashed feature space cannot diverge between
    them): all length-``gram`` substrings of the lowercased text; a
    doc shorter than ``gram`` chars yields its whole (possibly empty)
    text as one gram — the pre-r17 SQLTransformer's exact output."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (gram - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(gram)),
    )


def lang_classifier_fit(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    gram: int = 3,
    num_features: int = 1 << 15,
    reg_param: float = 0.01,
    max_iter: int = 50,
    max_fit_rows: int = 100_000,
    seed: int = 42,
) -> LangClassifier:
    """Fit a self-contained fastText-style language identifier:
    character ``gram``-grams (the published fastText langid feature
    space — character n-grams catch orthography, diacritics, and script
    where the marker-token heuristic :func:`detect_language` needs
    function words verbatim) → hashed counts → multinomial logistic
    regression. The upgrade tier over the heuristic for corpora where
    marker tokens are sparse (short/telegraphic text, informal
    spelling); the real fastText model remains the external seam
    (tests/test_model_seams.py golden).

    The n-gram/hash feature extraction stays JVM-side expressions
    (``transform(sequence(...), substr)`` over the lowercased text →
    ``pmod(hash(gram), num_features)`` — Spark's Murmur3 ``hash()``;
    no tokenizer UDF, no ML transformer), and the multinomial head is
    fitted DRIVER-side (:func:`_softmax_fit_np` — hand-rolled L-BFGS
    with an explicit convergence contract). r17 (guide §1.2): the
    previous MLlib ``LogisticRegression`` scheduled ~23 driver jobs
    (one tree-aggregated gradient pass per L-BFGS step) to iterate
    over a sample that is ALREADY capped at ``max_fit_rows`` — the
    exact shape the r16 ``ivf_build`` fit shed; the collected sample's
    hashed gram indices fit in one process by construction. Labels are
    indexed DRIVER-side from the distinct ``lang_col`` values (bounded
    by the language count). Rows with NULL/unseen ``lang_col`` are
    excluded from the fit.

    Scale shape: label discovery scans the full input (one distinct on
    the language column — bounded output); the fit collects ONE
    bounded sample (hashed int indices only — not text) and iterates
    in-process, O(sample nnz · n_langs) per L-BFGS step; scoring is
    one codegen'd map pass with the num_features × n_langs coefficient
    table broadcast once (see :func:`lang_classifier_score`).

    Behavior note (r17): the fitted decision boundary is a different
    optimizer's optimum than MLlib's (no feature standardization,
    different hash family for bucketing), so per-document predictions
    near the boundary can differ from pre-r17 fits; the accuracy
    contracts (tests/test_text_ml.py) and the holdout-accuracy bench
    query invariants are unchanged. Models persisted via the old
    ``PipelineModel.write()`` tier must be refitted (the
    :class:`LangModelParams` arrays persist as plain data now)."""
    import numpy as np

    labels = tuple(
        r[0]
        for r in labeled.select(lang_col)
        .filter(F.col(lang_col).isNotNull())
        .distinct()
        .sort(lang_col)
        .collect()
    )
    if not labels:
        raise ValueError(f"no non-null {lang_col!r} labels to fit on")
    lab_arr = F.array(*[F.lit(lb) for lb in labels])
    train = labeled.withColumn(
        "_lid_label",
        (F.array_position(lab_arr, F.col(lang_col)) - 1).cast("int"),
    ).filter(F.col("_lid_label") >= 0)
    n_train = train.count()
    if n_train > max_fit_rows:
        train = train.sample(
            withReplacement=False,
            fraction=min(1.0, max_fit_rows / n_train),
            seed=seed,
        )
    # ONE bounded collect of (hashed gram indices, label) — ints, not
    # text; the same sample(fraction, seed) discipline as ivf_build
    rows = train.select(
        F.transform(
            _lid_grams_col(text_col, gram),
            lambda g: F.pmod(F.hash(g), F.lit(num_features)),
        ).alias("_lid_idx"),
        "_lid_label",
    ).collect()
    if not rows:
        raise ValueError("lang_classifier_fit: empty fit sample")
    row_ptr = np.zeros(len(rows) + 1, dtype=np.int64)
    row_ptr[1:] = np.cumsum([len(r["_lid_idx"]) for r in rows])
    flat_idx = np.fromiter(
        (i for r in rows for i in r["_lid_idx"]),
        dtype=np.int32,
        count=int(row_ptr[-1]),
    )
    y = np.fromiter(
        (r["_lid_label"] for r in rows), dtype=np.int64, count=len(rows)
    )
    coef, intercept, _ = _softmax_fit_np(
        flat_idx, row_ptr, y, len(labels), num_features, reg_param,
        max_iter,
    )
    return LangClassifier(
        LangModelParams(coef, intercept, gram, num_features), labels
    )


def lang_classifier_score(
    clf: LangClassifier,
    df: DataFrame,
    text_col: str = "text",
    out: str = "lang_pred",
) -> DataFrame:
    """Score a corpus with a fitted :class:`LangClassifier`: adds
    ``out`` = the predicted language code (the fit's ``lang_col`` value
    space). One JVM map pass, no shuffle at any corpus scale: the
    (num_features × n_labels) TRANSPOSED coefficient matrix rides a
    ONE-ROW broadcast :func:`~datamunging_spark.sources.io.local_table`
    (LocalTableScan — no plan-literal bloat, no Python at action time)
    and the logits come from a SINGLE ``aggregate`` fold over the gram
    positions — ``logits[c] = b[c] + Σ_grams w[idx(gram)][c]`` with one
    inner-array lookup per gram (``zip_with`` accumulator). Higher-
    order functions are interpreted (CodegenFallback), so one fold
    beats per-class aggregates by ~n_labels× (measured 4.4 → ~1 CPU s
    on the bench holdout). Ties argmax to the FIRST maximal label
    (np.argmax parity). ``df`` must carry ``text_col`` under the same
    name used at fit time (the quality_classifier contract)."""
    import pyspark.sql.types as T

    from datamunging_spark.sources.io import local_table

    params: LangModelParams = clf.model
    spark = df.sparkSession
    gram = params.gram
    wt = params.coef.T  # (num_features, n_labels)
    wrow = local_table(
        spark,
        [(
            [list(map(float, row)) for row in wt],
            [float(v) for v in params.intercept],
        )],
        T.StructType([
            T.StructField(
                "_lid_w",
                T.ArrayType(T.ArrayType(T.DoubleType())),
            ),
            T.StructField("_lid_b", T.ArrayType(T.DoubleType())),
        ]),
    )
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    # the fold inlines _lid_grams_col's substr/hash gram definition so
    # no intermediate gram/idx arrays materialize per row
    logits = F.aggregate(
        F.sequence(
            F.lit(1), F.greatest(F.length(t) - (gram - 1), F.lit(1))
        ),
        F.col("_lid_b"),
        lambda acc, i: F.zip_with(
            acc,
            F.element_at(
                "_lid_w",
                F.pmod(
                    F.hash(t.substr(i, F.lit(gram))),
                    F.lit(params.num_features),
                ) + 1,
            ),
            lambda a, b: a + b,
        ),
    )
    scored = df.crossJoin(F.broadcast(wrow)).withColumn(
        "_lid_logits", logits
    )
    # first-max-wins argmax (np.argmax parity): array_position returns
    # the FIRST index holding the max
    lab_arr = F.array(*[F.lit(lb) for lb in clf.labels])
    return (
        scored.withColumn(
            out,
            F.element_at(
                lab_arr,
                F.array_position(
                    "_lid_logits", F.array_max("_lid_logits")
                ).cast("int"),
            ),
        )
        .drop("_lid_w", "_lid_b", "_lid_logits")
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text-analysis profile: token count, stopword/punct ratios,
    quality score, 64-bit fingerprint, detected language. All codegen'd
    expressions — scales as a pure map over the corpus scan."""
    c = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(text_col),
            "stopword_frac": stopword_ratio(text_col),
            "punct_frac": punct_ratio(text_col),
            "quality": quality_score(text_col),
            "fingerprint": doc_fingerprint(text_col),
            "lang_detected": detect_language(text_col),
        }
    )


def c4_clean_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_line_words: int = 5,
    require_terminal_punct: bool = True,
    drop_javascript: bool = True,
) -> DataFrame:
    """The LINE-level half of the C4 cleaning recipe (Raffel et al.
    2020, "Exploring the Limits of Transfer Learning" §2.2 — the other
    de-facto standard web filter set next to the Gopher rules): keep
    only lines that end in a terminal punctuation mark (``. ! ? "``),
    contain at least ``min_line_words`` words, and don't contain the
    word "javascript" (the cookie/JS-warning boilerplate marker);
    surviving lines are rejoined with newlines into ``out_col``
    (default: in place).

    Expression-only — split on newlines, one ``filter`` lambda, one
    ``array_join``; a pure codegen map over the scan, no UDF, no
    shuffle. Run BEFORE :func:`c4_page_flags` (the paper's order:
    lines are cleaned first, then page-level rules see the cleaned
    text). The recipe's third leg — three-sentence-span dedup across
    the corpus — is :mod:`~datamunging_spark.operators.spandedup`.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))

    def keep(line):
        # line.strip() parity: rtrim strips only 0x20 spaces, so a line
        # ending ". \t" or ".\r" would fail the terminal-punct test the
        # C4 reference (which strips ALL whitespace) passes (r11 ADVICE)
        trimmed = F.regexp_replace(line, r"\s+$", "")
        cond = F.lit(True)
        if require_terminal_punct:
            cond = cond & trimmed.rlike(r'[.!?"]$')
        if min_line_words > 0:
            cond = cond & (
                F.size(
                    F.filter(
                        F.split(trimmed, r"\s+", -1), lambda w: w != ""
                    )
                )
                >= F.lit(int(min_line_words))
            )
        if drop_javascript:
            cond = cond & ~F.lower(line).rlike(r"\bjavascript\b")
        return cond

    cleaned = F.array_join(
        F.filter(F.split(c, "\n", -1), keep), "\n"
    )
    return df.withColumn(out_col or text_col, cleaned)


def c4_page_flags(
    df: DataFrame,
    text_col: str = "text",
    min_sentences: int = 3,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """The PAGE-level half of the C4 recipe (Raffel et al. 2020 §2.2):
    one boolean per published rule plus ``c4_pass`` (AND) — flags, not
    a filter, so kill counts are auditable per rule before committing
    (the :func:`gopher_quality_flags` convention):

    - ``min_sentences_ok`` — at least ``min_sentences`` sentences,
      counted as runs of terminal punctuation (``[.!?"]`` — the same
      terminal set the line rule keeps) followed by whitespace or end
      of text: decimal points ("1.2.3") don't count, an ellipsis
      counts once, a line kept for its quote terminator counts;
    - ``no_lorem_ipsum`` — placeholder text marker absent;
    - ``no_curly_brace`` — no ``{`` (the paper's code-page marker);
    - ``no_blocklist_hit`` — no word from ``blocklist`` present
      (case-insensitive whole-word match). The paper uses the public
      "List of Dirty, Naughty, Obscene..." list; it isn't vendored
      here — pass your deployment's list, default empty = rule
      vacuously true.

    Expression-only, no UDF, no shuffle. Run on
    :func:`c4_clean_lines` output for the paper's semantics."""
    import re as _re

    c = F.coalesce(F.col(text_col), F.lit(""))
    lo = F.lower(c)
    n_sent = F.regexp_count(c, F.lit(r'[.!?"]+(\s|$)'))
    if blocklist:
        # ONE alternation scan, not one rlike per word — only the
        # aggregate flag is exposed, so per-word passes buy nothing
        alt = "|".join(_re.escape(w.lower()) for w in blocklist)
        no_block = ~lo.rlike(r"\b(?:" + alt + r")\b")
    else:
        no_block = F.lit(True)
    out = df.withColumns(
        {
            "min_sentences_ok": n_sent >= F.lit(int(min_sentences)),
            "no_lorem_ipsum": ~lo.contains("lorem ipsum"),
            "no_curly_brace": ~c.contains("{"),
            "no_blocklist_hit": no_block,
        }
    )
    return out.withColumn(
        "c4_pass",
        F.col("min_sentences_ok")
        & F.col("no_lorem_ipsum")
        & F.col("no_curly_brace")
        & F.col("no_blocklist_hit"),
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Per-document quality gates in the style of the published Gopher
    rules (Rae et al. 2021, "Scaling Language Models" §A1.1 — the de-facto
    standard web-corpus filter set): word-count bounds, mean-word-length
    bounds, symbol-to-word ratio (#/ellipsis spam), fraction of words
    containing an alphabetic character, and a minimum number of distinct
    common-stopword hits (gibberish/keyword-stuffing detector).

    Adds one boolean column per rule plus ``quality_pass`` (AND of all).
    Flags rather than a filter so a pipeline can audit per-rule kill
    counts before committing to thresholds — filter on ``quality_pass``
    when done. Expression-only: one codegen map over the scan, no UDF,
    no shuffle; defaults are the published constants, every threshold a
    parameter.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(c, r"\s+", -1), lambda w: w != "")
    n_words = F.size(words)
    mean_len = F.when(
        n_words > 0,
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / n_words,
    ).otherwise(F.lit(0.0))
    # occurrences, not characters: '...' must weigh the same as '…'
    # (the published rule counts symbol UNITS; char counting triple-
    # weights the ASCII spelling)
    n_symbols = F.regexp_count(c, F.lit(r"#|\.\.\.|…"))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(
                *[
                    F.lit(s)
                    for s in ("the", "be", "to", "of", "and", "that", "have", "with")
                ]
            ),
        )
    )
    out = df.withColumns(
        {
            "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
            "mean_word_len_ok": (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len),
            "symbol_ratio_ok": F.when(
                n_words > 0, n_symbols / n_words <= max_symbol_word_ratio
            ).otherwise(F.lit(False)),
            "alpha_word_ok": alpha_frac >= min_alpha_word_frac,
            "stopword_ok": stop_hits >= min_stopword_hits,
        }
    )
    return out.withColumn(
        "quality_pass",
        F.col("word_count_ok")
        & F.col("mean_word_len_ok")
        & F.col("symbol_ratio_ok")
        & F.col("alpha_word_ok")
        & F.col("stopword_ok"),
    )


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Classic corpus word count: explode tokens → groupBy word. The
    map-side partial aggregation absorbs the heavy hitters before the
    shuffle."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10_000,
    sketch_k: int | None = None,
) -> DataFrame:
    """Top-``vocab_size`` corpus vocabulary by frequency: (word, cnt,
    rank), rank 1-based in (cnt desc, word asc) order — the deterministic
    tiebreak makes the vocabulary reproducible across engines and runs
    (the usual prerequisite for a frozen tokenizer/feature vocabulary).

    Scale shape: :func:`word_count`'s explode→hash-agg (map-side partials
    absorb heavy hitters), then ``orderBy.limit`` — which plans as
    TakeOrderedAndProject (per-partition top-k heaps merged on one
    reducer), NEVER a global sort. The rank window runs over the already-
    truncated ``vocab_size`` rows, so its single-partition sort is
    bounded by the vocabulary, not the corpus.

    The hash aggregate still exchanges a partial row per distinct word —
    at web-corpus scale (billions of types) that shuffle/memory is the
    bottleneck. ``sketch_k`` switches to
    :func:`~datamunging_spark.operators.sketch.top_k_exact_via_sketch`:
    Misra-Gries candidates at bounded state, exact recount of candidates
    only, same (cnt desc, word asc) ranking, plus a ``certified_exact``
    column — True proves the vocabulary equals this function's default
    output (pinned by test); if it comes back False, raise ``sketch_k``.
    Pick ``sketch_k`` ≳ a few × vocab_size / (expected share of the
    vocab_size-th word); the certificate tells you whether it sufficed.
    """
    if sketch_k is not None:
        from datamunging_spark.operators.sketch import top_k_exact_via_sketch

        toks = df.select(F.explode(tokenize(text_col)).alias("word")).filter(
            F.col("word") != ""
        )
        top = top_k_exact_via_sketch(
            toks, "word", top_n=vocab_size, k=sketch_k
        ).select(
            F.col("value").alias("word"),
            F.col("count").alias("cnt"),
            "certified_exact",
        )
        w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
        return top.withColumn("rank", F.row_number().over(w))
    top = (
        word_count(df, text_col)
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(vocab_size)
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return top.withColumn("rank", F.row_number().over(w))


def vocab_coverage(
    df: DataFrame, vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row token-coverage report of ``vocab`` (a :func:`build_vocab`
    result or any frame with a ``word`` column) over a corpus:
    total/covered token occurrences, OOV rate, and type-level coverage —
    the go/no-go number for freezing a tokenizer vocabulary ("99.2% of
    token occurrences in-vocab, 14% of types").

    Scale shape: explode → broadcast LEFT join against the vocabulary
    (bounded by ``vocab_size``, so always broadcastable) → one global
    aggregate. No shuffle beyond the final single-row reduction.
    """
    toks = df.select(F.explode(tokenize(text_col)).alias("word")).filter(
        F.col("word") != ""
    )
    v = F.broadcast(vocab.select("word", F.lit(True).alias("_in")))
    j = toks.join(v, "word", "left")
    return j.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum(F.when(F.col("_in"), 1).otherwise(0)).alias("in_vocab_tokens"),
        F.round(
            1.0
            - F.sum(F.when(F.col("_in"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
        F.countDistinct("word").alias("total_types"),
        F.countDistinct(F.when(F.col("_in"), F.col("word"))).alias(
            "in_vocab_types"
        ),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    standard prep for context-window training and retrieval indexing.
    Returns (id_col, chunk_id, chunk_text, n_tokens); chunk_id is the
    0-based window index, windows start every ``max_tokens - overlap``
    tokens (R22 whitespace tokens, so chunk_text round-trips by
    concatenation).

    Pure per-row expressions, zero shuffles: tokenize ONCE per doc (the
    token array is carried into the explode — not re-split per chunk,
    per SCALE.md's no-CSE discipline), posexplode the window starts, and
    slice. Short docs yield exactly one chunk; empty docs one empty chunk.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("overlap must satisfy 0 <= overlap < max_tokens")
    step = max_tokens - overlap
    toks = df.select(
        F.col(id_col),
        # tokenize() = the module's R22 whitespace contract; NULL text
        # behaves like empty text (one ['']-token chunk, never NULL counts)
        tokenize(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).withColumn(
        "_starts",
        # upper bound n - overlap - 1: once a window reaches the end of the
        # doc, no further start is generated — the would-be tail chunk is a
        # strict subset of the previous window (duplicate training data)
        F.sequence(
            F.lit(0),
            F.greatest(F.size("_toks") - overlap - F.lit(1), F.lit(0)),
            F.lit(step),
        ),
    )
    exploded = toks.select(
        id_col,
        "_toks",
        F.posexplode("_starts").alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens)
    return exploded.select(
        id_col,
        "chunk_id",
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).alias("n_tokens"),
    )


def unigram_lm_fit(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Fit a unigram language model over the corpus: one (token, cnt,
    logprob) row per distinct normalized token, logprob = ln(cnt / total).

    This is the cheap stand-in for the CCNet/KenLM perplexity filter
    (Wenzek et al. 2020, "CCNet: Extracting high quality monolingual
    datasets from web crawl data" — their quality signal is an LM score
    over Wikipedia-trained KenLM; a unigram model keeps the same *shape*
    of signal fully relational and engine-portable). Tokens are the
    whitespace words of :func:`~datamunging_spark.functions.normalize_text`
    form, so the fit composes with the dedup family's normalization.

    ``group_col`` fits ONE MODEL PER GROUP (CCNet's per-language
    structure): probabilities are conditioned on the group, the output
    carries the group column, and :func:`lm_quality_score` joins on
    (group, token) — a doc is scored against ITS OWN language's model,
    so cross-language token collisions stop polluting scores.

    Plan: explode → one hash aggregate (map-side combinable, uniform
    token key) + a broadcast per-group total — the TF-IDF docfreq shape.
    The result is vocabulary-sized (≪ corpus), the natural broadcast side
    of the scoring join. ``logprob`` is rounded to 7 decimals so scores
    survive engine-to-engine float differences in downstream decimal sums.
    """
    from datamunging_spark.functions import normalize_text

    gb = [group_col] if group_col else []
    toks = df.select(
        *gb,
        F.explode(
            F.filter(
                F.split(normalize_text(text_col), " ", -1),
                lambda w: w != "",
            )
        ).alias("token"),
    )
    cnts = toks.groupBy(*gb, "token").agg(F.count(F.lit(1)).alias("cnt"))
    if gb:
        # per-group totals via a window, NOT an equi-join: window
        # partitions treat a NULL group value as a real group (an
        # unidentified-language slice is common after language-ID), while
        # a join on the group key would silently drop it from the model
        from pyspark.sql import Window

        joined = cnts.withColumn(
            "_total", F.sum("cnt").over(Window.partitionBy(*gb))
        )
    else:
        total = cnts.agg(F.sum("cnt").alias("_total"))
        joined = cnts.crossJoin(F.broadcast(total))
    return joined.select(
        *gb,
        "token",
        "cnt",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("_total")), 7
        ).alias("logprob"),
    )


def lm_quality_score(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logprob: float = -20.0,
    broadcast_lm: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """Score each document's mean per-token unigram log-probability under a
    :func:`unigram_lm_fit` model — the distributed form of the perplexity
    quality gate: gibberish / boilerplate / wrong-language docs score far
    below the corpus mode, natural prose near it. Filter on a band (both
    tails: too-improbable is noise, too-probable is stopword spam), per
    the published CCNet head/middle/tail split.

    Output: (id, n_tokens, n_oov, lm_score) for every doc with ≥1 token;
    ``lm_score`` = mean token logprob, OOV tokens scored ``oov_logprob``.

    Plan: explode → LEFT join the vocabulary-sized model (broadcast by
    default — at 100 TB the model is MBs; set ``broadcast_lm=False`` to
    let AQE decide for huge vocabularies) → one hash aggregate back to doc
    grain. The per-token logprobs sum as ``decimal(28,7)`` — exact, so
    the aggregate is reduction-order-independent and oracle-reproducible
    (the same discipline as pricing_summary's decimal sums).
    """
    from datamunging_spark.functions import normalize_text

    gb = [group_col] if group_col else []
    extra = set(lm.columns) - {"token", "cnt", "logprob", *gb}
    if extra:
        # a per-group model joined on token alone would match one row PER
        # GROUP containing the token — silently inflating n_tokens and
        # summing several groups' logprobs; fail fast instead
        raise ValueError(
            f"model carries group columns {sorted(extra)} not named in "
            "group_col — pass the same group_col the model was fit with"
        )
    toks = df.select(
        F.col(id_col),
        *gb,
        F.explode(
            F.filter(
                F.split(normalize_text(text_col), " ", -1),
                lambda w: w != "",
            )
        ).alias("token"),
    )
    model = lm.select(
        *[F.col(g).alias(f"_mg_{g}") for g in gb],
        F.col("token").alias("_mtok"),
        F.col("logprob").cast("decimal(28,7)").alias("_lp"),
    )
    if broadcast_lm:
        model = F.broadcast(model)
    oov = F.lit(oov_logprob).cast("decimal(28,7)")
    # per-group model: a doc's tokens only match ITS group's vocabulary;
    # group keys compare NULL-SAFELY so the unidentified-language slice
    # scores against its own model instead of going all-OOV
    cond = F.col("token") == F.col("_mtok")
    for g in gb:
        cond = cond & F.col(g).eqNullSafe(F.col(f"_mg_{g}"))
    scored = toks.join(model, on=cond, how="left").drop(
        "_mtok", *[f"_mg_{g}" for g in gb]
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_lp").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("_lp"), oov)).alias("_sum_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(
                F.col("_sum_lp").cast("double") / F.col("n_tokens"), 6
            ).alias("lm_score"),
        )
    )


def lm_quality_bands(
    df: DataFrame,
    score_col: str = "lm_score",
    group_cols: list[str] | None = None,
    head: float = 0.1,
    tail: float = 0.3,
    band_col: str = "lm_band",
) -> DataFrame:
    """Assign each scored document to the CCNet ``head``/``middle``/
    ``tail`` quality band (Wenzek et al. 2020 §4.4: sort by LM score, cut
    the distribution into thirds-by-quantile; head = most-probable prose,
    tail = noise/boilerplate candidates). ``head`` / ``tail`` are the
    band FRACTIONS; cuts are exact interpolated percentiles of
    ``score_col``, computed per ``group_cols`` partition (CCNet cuts per
    language; per-source works the same way) or globally when no groups
    are given.

    Plan: one grouped percentile aggregate over a slim (group, score)
    projection — band-cardinality rows — broadcast-joined back, then a
    codegen CASE. The percentile is the exact form (same definition as
    DuckDB ``quantile_cont`` → oracle-reproducible); swap to
    ``percentile_approx`` upstream if single groups outgrow executor
    memory (same trade documented at grouped_percentiles).
    """
    gb = list(group_cols or [])
    cuts = (df.groupBy(*gb) if gb else df.groupBy()).agg(
        F.percentile(score_col, F.lit(1.0 - head)).alias("_q_head"),
        F.percentile(score_col, F.lit(tail)).alias("_q_tail"),
    )
    joined = (
        df.join(F.broadcast(cuts), on=gb)
        if gb
        else df.crossJoin(F.broadcast(cuts))
    )
    return (
        joined.withColumn(
            band_col,
            F.when(F.col(score_col) >= F.col("_q_head"), F.lit("head"))
            .when(F.col(score_col) <= F.col("_q_tail"), F.lit("tail"))
            .otherwise(F.lit("middle")),
        )
        .drop("_q_head", "_q_tail")
    )


def gopher_repetition_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
    max_top3gram_char_frac: float = 0.18,
    max_top4gram_char_frac: float = 0.16,
) -> DataFrame:
    """The REPETITION half of the published Gopher rule set (Rae et al.
    2021 §A1.1, Table A1 constants): per-document duplicate-line fraction,
    duplicate-line CHARACTER fraction, and the character fraction of the
    most frequent {2,3,4}-gram — the signals that catch listicle spam,
    keyword stuffing, and template boilerplate that the word-level gates
    (:func:`gopher_quality_flags`) pass.

    Metric definitions (pinned so the SQL oracle can re-derive them):

    * lines = ``sep``-split pieces whose :func:`normalize_text` form is
      non-empty; ``dup_line_frac`` = 1 − distinct/total;
      ``dup_line_char_frac`` = Σ(cnt−1)·len / Σ cnt·len over normalized
      line lengths (occurrences beyond the first).
    * grams over the normalized word sequence; ``topNgram_char_frac`` =
      max over grams of cnt·len(gram) ÷ len(normalized word text) —
      max-of-products, so ties need no ordering rule.

    Scale shape: gram CONSTRUCTION is a linear per-row ``transform``
    (HOFs are fine touched-once — SCALE.md discipline), but all COUNTING
    is relational: explode → (doc, gram) hash aggregate → per-doc max →
    join back, the same never-quadratic shape as minhash shingling. A
    per-row HOF counting loop would be O(grams²) per doc and is exactly
    what this operator avoids.

    Adds the five metric columns, one boolean per rule, and
    ``repetition_pass`` (AND). Compose with ``gopher_quality_flags`` for
    the full published filter.
    """
    from datamunging_spark.functions import normalize_text, tokenize

    c = F.coalesce(F.col(text_col), F.lit(""))

    # --- duplicate-line metrics: explode once, one hash agg per doc ----
    norm_line = normalize_text(F.col("_line"))
    line_stats = (
        df.select(F.col(id_col), F.explode(tokenize(c, sep)).alias("_line"))
        .select(id_col, norm_line.alias("_nl"))
        .filter(F.col("_nl") != "")
        .groupBy(id_col, "_nl")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.sum("_cnt").alias("_n_lines"),
            F.count(F.lit(1)).alias("_n_distinct"),
            F.sum((F.col("_cnt") - 1) * F.length("_nl")).alias("_dup_chars"),
            F.sum(F.col("_cnt") * F.length("_nl")).alias("_tot_chars"),
        )
        .select(
            id_col,
            (1 - F.col("_n_distinct") / F.col("_n_lines")).alias(
                "dup_line_frac"
            ),
            F.when(
                F.col("_tot_chars") > 0,
                F.col("_dup_chars") / F.col("_tot_chars"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_line_char_frac"),
        )
    )

    # --- top-n-gram char fractions: linear construction, relational count
    words = F.filter(F.split(normalize_text(c), " ", -1), lambda w: w != "")
    # NB sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs
    # shorter than n words need the explicit empty-array branch
    gram_arr = lambda n: F.when(  # noqa: E731
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    with_words = df.select(
        F.col(id_col),
        F.length(F.array_join(words, " ")).alias("_wchars"),
        *[gram_arr(n).alias(f"_g{n}") for n in (2, 3, 4)],
    )
    exploded = None
    for n in (2, 3, 4):
        part = with_words.select(
            id_col, F.lit(n).alias("_n"), F.explode(f"_g{n}").alias("_gram")
        )
        exploded = part if exploded is None else exploded.unionByName(part)
    top = (
        exploded.groupBy(id_col, "_n", "_gram")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col, "_n")
        .agg(F.max(F.col("_cnt") * F.length("_gram")).alias("_top_chars"))
        .groupBy(id_col)
        .pivot("_n", [2, 3, 4])
        .agg(F.first("_top_chars"))
    )
    gram_stats = (
        with_words.select(id_col, "_wchars")
        .join(top, on=id_col, how="left")
        .select(
            id_col,
            *[
                F.when(
                    F.col("_wchars") > 0,
                    F.coalesce(F.col(str(n)), F.lit(0)) / F.col("_wchars"),
                )
                .otherwise(F.lit(0.0))
                .alias(f"top{n}gram_char_frac")
                for n in (2, 3, 4)
            ],
        )
    )

    out = (
        df.join(line_stats, on=id_col, how="left")
        .join(gram_stats, on=id_col, how="left")
        .fillna(
            {
                "dup_line_frac": 0.0,
                "dup_line_char_frac": 0.0,
                "top2gram_char_frac": 0.0,
                "top3gram_char_frac": 0.0,
                "top4gram_char_frac": 0.0,
            }
        )
    )
    flags = {
        "dup_line_ok": F.col("dup_line_frac") <= max_dup_line_frac,
        "dup_line_char_ok": F.col("dup_line_char_frac")
        <= max_dup_line_char_frac,
        "top2gram_ok": F.col("top2gram_char_frac") <= max_top2gram_char_frac,
        "top3gram_ok": F.col("top3gram_char_frac") <= max_top3gram_char_frac,
        "top4gram_ok": F.col("top4gram_char_frac") <= max_top4gram_char_frac,
    }
    out = out.withColumns(flags)
    pass_col = None
    for name in flags:
        pass_col = (
            F.col(name) if pass_col is None else (pass_col & F.col(name))
        )
    return out.withColumn("repetition_pass", pass_col)


def hashed_embeddings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    out: str = "embedding",
) -> DataFrame:
    """Feature-hashed bag-of-words document embeddings (the hashing trick,
    Weinberger et al. 2009 / Spark's HashingTF, densified): token → md5
    bucket in [0, ``dim``), per-doc bucket counts, L2-normalized dense
    ``array<double>``.

    This is the model-free embedding generator that closes the text →
    vector loop inside the engine: its output feeds the whole vector
    family (:func:`~datamunging_spark.operators.dedup.semantic_dedup`,
    ANN search, prototypicality scoring) with no external encoder, and a
    real model swaps in behind the same ``(id, array<float>)`` contract
    via ``mapInPandas``. Cosine on these vectors approximates token-bag
    overlap — the cheap tier of semantic dedup; md5 bucketing (not an
    engine hash) keeps the vectors engine-portable.

    Plan: explode → one (doc, bucket) hash aggregate → per-doc map →
    dense array via a sequence transform; L2 normalization is one
    touched-once per-row fold (SCALE.md HOF discipline). Docs with no
    tokens get the zero vector.
    """
    from datamunging_spark.functions import normalize_text

    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(normalize_text(text_col), " ", -1),
                lambda w: w != "",
            )
        ).alias("_tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("_tok"), 1, 4), 16, 10).cast("long")
        % dim
    ).cast("int")
    maps = (
        toks.groupBy(id_col, bucket.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("_b"), F.col("_cnt")))
            ).alias("_m")
        )
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    nrm = F.sqrt(
        F.aggregate(dense, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    vec = F.when(
        nrm > 0, F.transform(dense, lambda v: F.round(v / nrm, 6))
    ).otherwise(F.transform(dense, lambda v: v))
    return df.select(F.col(id_col)).join(
        maps, on=id_col, how="left"
    ).select(
        id_col,
        F.when(F.col("_m").isNull(), F.array_repeat(F.lit(0.0), dim))
        .otherwise(vec)
        .alias(out),
    )


def bigram_lm_fit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Conditional bigram model over normalized word sequences: one
    (w1, w2, cnt, cond_logprob) row per observed bigram, with
    ``cond_logprob = ln(c(w1,w2) / c_pre(w1))`` where ``c_pre(w1)`` is
    w1's non-final occurrence count (= Σ_w2 c(w1,w2)) — a proper
    conditional distribution per context word. The upgrade tier over
    :func:`unigram_lm_fit` for the perplexity-proxy quality gate;
    combine both via :func:`lm_quality_score_interpolated`.

    Plan: linear per-row pair construction (touched-once HOF), explode →
    (w1, w2) hash aggregate → context-count aggregate → one join. The
    model is bigram-vocabulary-sized; broadcast side of the scoring join.
    """
    from datamunging_spark.functions import normalize_text

    # materialize the token array as a BOUND COLUMN before the transform:
    # embedding the split/normalize expression in the lambda re-evaluates
    # it per element with no CSE — the O(n²)-per-doc trap SCALE.md's
    # interpreted-expression discipline documents (measured 4x tokens →
    # 24x wall before this projection)
    tokd = df.select(
        F.filter(
            F.split(normalize_text(text_col), " ", -1), lambda w: w != ""
        ).alias("_toks")
    )
    words = F.col("_toks")
    pairs = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.struct(
                F.element_at(words, i.cast("int")).alias("w1"),
                F.element_at(words, (i + 1).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    exploded = tokd.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2")
    )
    cnts = exploded.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = cnts.groupBy("w1").agg(F.sum("cnt").alias("_ctx"))
    return cnts.join(F.broadcast(ctx), on="w1").select(
        "w1",
        "w2",
        "cnt",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("_ctx")), 7
        ).alias("cond_logprob"),
    )


def lm_quality_score_interpolated(
    df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    lam: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logprob: float = -20.0,
) -> DataFrame:
    """Jelinek-Mercer interpolated LM score: per token,
    ``p = λ·p(w|prev) + (1−λ)·p(w)`` — unseen bigrams back off smoothly
    to the unigram tier instead of flooring, and each doc's FIRST token
    (no context) scores on the unigram alone. OOV tokens (absent from
    the unigram vocabulary) take ``oov_logprob``. Output matches
    :func:`lm_quality_score`: (id, n_tokens, n_oov, lm_score), decimal
    sums → reduction-order-independent.

    Plan: one explode carrying (prev, word) per token, two broadcast
    joins (unigram + bigram models), one hash aggregate back to doc
    grain. Probabilities are recovered from the stored logprobs
    (exp(ln p) — ~1e-7 relative error from the model's rounding,
    irrelevant at quality-gate granularity).
    """
    from datamunging_spark.functions import normalize_text

    if not 0.0 <= lam < 1.0:
        # lam == 1.0 would zero out the unigram tier: an in-vocabulary
        # token with an unseen bigram scores ln(0) → the OOV floor with
        # n_oov=0 — the opposite of the documented smooth backoff
        raise ValueError(f"lam must be in [0, 1), got {lam}")
    # bound token-array column (not an inline expression in the lambda):
    # same O(n²) CSE trap as bigram_lm_fit, same fix
    tokd = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalize_text(text_col), " ", -1), lambda w: w != ""
        ).alias("_toks"),
    )
    words = F.col("_toks")
    # sequence(1, 0) is DESCENDING in Spark — empty docs need the
    # explicit empty branch or element_at(…, 1) aborts the job
    tok_structs = F.when(
        F.size(words) >= 1,
        F.transform(
            F.sequence(F.lit(1), F.size(words)),
            lambda i: F.struct(
                F.when(i > 1, F.element_at(words, (i - 1).cast("int")))
                .otherwise(F.lit(None))
                .alias("prev"),
                F.element_at(words, i.cast("int")).alias("w"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))
    toks = tokd.select(
        F.col(id_col), F.explode(tok_structs).alias("_t")
    ).select(id_col, F.col("_t.prev").alias("prev"), F.col("_t.w").alias("w"))
    u = F.broadcast(
        uni.select(F.col("token").alias("w"), F.col("logprob").alias("_ul"))
    )
    b = F.broadcast(
        bi.select(
            F.col("w1").alias("prev"),
            F.col("w2").alias("w"),
            F.col("cond_logprob").alias("_bl"),
        )
    )
    j = toks.join(u, on="w", how="left").join(b, on=["prev", "w"], how="left")
    p_uni = F.exp(F.col("_ul"))
    p_bi = F.coalesce(F.exp(F.col("_bl")), F.lit(0.0))
    p = F.when(
        F.col("_ul").isNull(), F.lit(None)
    ).otherwise(
        F.when(F.col("prev").isNull(), p_uni).otherwise(
            F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
        )
    )
    lp = F.round(F.log(p), 7).cast("decimal(28,7)")
    oov = F.lit(oov_logprob).cast("decimal(28,7)")
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("_ul").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(F.coalesce(lp, oov)).alias("_s"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_oov",
            F.round(F.col("_s").cast("double") / F.col("n_tokens"), 6).alias(
                "lm_score"
            ),
        )
    )


def document_quality_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    lm: DataFrame | None = None,
    head: float = 0.1,
    tail: float = 0.3,
) -> DataFrame:
    """Every per-document quality signal the engine computes, in ONE wide
    frame — the audit surface a curation run inspects BEFORE committing to
    thresholds (the per-rule kill-count philosophy of
    :func:`gopher_quality_flags`, extended to the whole signal family):

    * text profile (token count, stopword/punct ratios, heuristic score,
      fingerprint, detected language) — pure map,
    * Gopher word flags + repetition flags (+ both pass verdicts),
    * unigram-LM score and CCNet head/middle/tail band (fit on the corpus
      itself unless a prebuilt ``lm`` is passed — the incremental shape:
      persist the model once, score every new batch against it).

    ``group_col`` threads through the LM fit/score AND the band cuts
    (per-language models + per-language bands, the CCNet structure).

    Plan: one codegen map pass (profile + word flags), the repetition
    explode→agg→join, and the LM explode→broadcast-join→agg — each
    documented on its own operator; this wrapper only joins their
    per-doc outputs back on the id. Filter on any combination of the
    flag/band columns when thresholds are chosen.
    """
    gb = [group_col] if group_col else []
    base = gopher_repetition_flags(
        gopher_quality_flags(text_profile(df, text_col), text_col),
        text_col,
        id_col,
    )
    if lm is None:
        lm = unigram_lm_fit(df, text_col, group_col=group_col)
    scored = lm_quality_score(
        df.select(id_col, *gb, text_col), lm, text_col, id_col,
        group_col=group_col,
    )
    # lm_quality_score returns doc grain WITHOUT the group column —
    # re-attach it for the per-group band cuts
    bands_input = (
        scored.join(df.select(id_col, *gb), on=id_col, how="left")
        if gb
        else scored
    )
    banded = lm_quality_bands(
        bands_input,
        group_cols=gb or None,
        head=head,
        tail=tail,
    ).select(id_col, "n_oov", "lm_score", "lm_band")
    return base.join(banded, on=id_col, how="left")


#: Sentence boundary: split AFTER ./!/? followed by whitespace. Deliberately
#: simple (no abbreviation list) — the same heuristic C4-style pipelines use
#: for line/sentence accounting; swap the regex for a better segmenter
#: without touching the packing fold.
SENTENCE_SPLIT_REGEX = r"(?<=[.!?])\s+"


def sentence_chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 512,
) -> DataFrame:
    """Sentence-aware chunking: split each document at sentence boundaries
    and greedily pack CONSECUTIVE sentences into chunks of at most
    ``max_tokens`` whitespace tokens — the retrieval/training prep that
    never cuts mid-sentence, complementing :func:`chunk_documents`' exact
    token windows. A single sentence longer than ``max_tokens`` becomes
    its own oversized chunk (contract: chunk boundaries ⊂ sentence
    boundaries, so no text is ever dropped or split inside a sentence).

    Returns (id_col, chunk_id, chunk_text, n_tokens, n_sentences);
    chunk_id is 0-based in document order; whitespace at sentence joins is
    normalized to one space. Empty/NULL docs yield one empty chunk (the
    chunk_documents convention).

    Scale shape: ZERO shuffles — the greedy pack is a JVM higher-order
    ``aggregate`` (fold) over the per-doc sentence array computing each
    sentence's chunk index, and chunk texts materialize via
    ``transform(sequence(0, last_idx), i → array_join(filter(...)))``.
    That final gather is O(n_chunks · n_sentences) per document — fine for
    documents (both are small), wrong for book-length megadocs: pre-split
    those with chunk_documents' linear token windows first.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    sents = F.filter(
        F.split(text, SENTENCE_SPLIT_REGEX), lambda s: F.length(s) > 0
    )
    counts = F.transform(sents, lambda s: token_count(s))
    zero = F.struct(
        F.lit(0).alias("run"),
        F.lit(0).alias("idx"),
        F.array().cast("array<int>").alias("ids"),
    )

    def fold(acc, c):
        # start a new chunk only when the running chunk is non-empty AND
        # adding this sentence would overflow — an oversized sentence in a
        # fresh chunk stays (oversized chunk, never a mid-sentence split)
        new = (acc["run"] + c > F.lit(max_tokens)) & (acc["run"] > 0)
        idx = F.when(new, acc["idx"] + 1).otherwise(acc["idx"])
        run = F.when(new, c).otherwise(acc["run"] + c)
        return F.struct(
            run.alias("run"),
            idx.alias("idx"),
            F.concat(acc["ids"], F.array(idx.cast("int"))).alias("ids"),
        )

    base = df.select(
        F.col(id_col), sents.alias("_sents"),
        F.aggregate(counts, zero, fold).getField("ids").alias("_ids"),
    )
    zipped = F.arrays_zip(F.col("_sents"), F.col("_ids"))
    chunks = F.transform(
        F.sequence(F.lit(0), F.coalesce(F.element_at("_ids", -1), F.lit(0))),
        lambda i: F.struct(
            F.array_join(
                F.transform(
                    F.filter(zipped, lambda z: z["_ids"] == i),
                    lambda z: z["_sents"],
                ),
                " ",
            ).alias("txt"),
            F.size(F.filter(zipped, lambda z: z["_ids"] == i)).alias(
                "n_sent"
            ),
        ),
    )
    out = base.select(
        id_col, F.posexplode(chunks).alias("chunk_id", "_c")
    )
    return out.select(
        id_col,
        "chunk_id",
        F.col("_c.txt").alias("chunk_text"),
        token_count(F.col("_c.txt")).alias("n_tokens"),
        F.col("_c.n_sent").alias("n_sentences"),
    )


#: Compact built-in valence lexicon (AFINN-style integer scores in
#: [-5, 5]; the well-known public scoring convention). Deliberately small
#: — callers with a real lexicon pass their own dict; the built-in exists
#: so the operator works out of the box and stays deterministic.
DEFAULT_SENTIMENT_LEXICON = {
    "good": 3, "great": 3, "excellent": 4, "amazing": 4, "awesome": 4,
    "love": 3, "loved": 3, "like": 2, "best": 3, "happy": 3, "wonderful": 4,
    "fantastic": 4, "perfect": 5, "nice": 2, "better": 2, "win": 2,
    "wins": 2, "winning": 2, "recommend": 2, "recommended": 2, "enjoy": 2,
    "enjoyed": 2, "helpful": 2, "impressive": 3, "positive": 2, "success": 2,
    "bad": -3, "terrible": -4, "awful": -4, "horrible": -4, "hate": -3,
    "hated": -3, "worst": -4, "sad": -2, "poor": -2, "disappointing": -3,
    "disappointed": -3, "negative": -2, "fail": -2, "fails": -2,
    "failed": -2, "failure": -2, "broken": -2, "bug": -2, "bugs": -2,
    "wrong": -2, "worse": -2, "useless": -3, "waste": -2, "problem": -2,
}


def sentiment_score(
    df: DataFrame,
    text_col: str = "text",
    lexicon: dict[str, int] | None = None,
    out: str = "sentiment",
) -> DataFrame:
    """Lexicon-based sentiment scoring (the AFINN/EDBT'16-Twitter-on-Spark
    recipe, PAPERS.md): mean valence of the document's lexicon-matched
    tokens, NULL when nothing matches (so "no signal" never reads as
    "neutral"). Adds ``out`` (double) plus ``{out}_hits`` (matched token
    count).

    Scale shape: ZERO shuffle, zero UDF — the lexicon rides as a
    ``create_map`` literal in the plan (the broadcast-join analog for a
    closed word list; fine to a few thousand entries, beyond which a real
    broadcast join on an exploded token table is the shape), and scoring
    is one lower→tokenize→transform→filter→aggregate fold per row, all
    whole-stage codegen.
    """
    lex = DEFAULT_SENTIMENT_LEXICON if lexicon is None else lexicon
    m = F.create_map(
        *[F.lit(x) for kv in sorted(lex.items()) for x in kv]
    )
    # Whitespace-split THEN strip non-alphanumeric edges before lookup:
    # real prose borders lexicon words with punctuation constantly
    # ("Perfect!", "great,") and an exact-token lookup would
    # systematically undercount. Interior punctuation (don't) is kept —
    # matching the AFINN recipe's word-boundary behavior.
    toks = F.transform(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", -1),
        lambda t: F.regexp_replace(t, r"^[^a-z0-9]+|[^a-z0-9]+$", ""),
    )
    scores = F.filter(
        F.transform(toks, lambda t: m.getItem(t)),
        lambda s: s.isNotNull(),
    )
    n = F.size(scores)
    total = F.aggregate(
        scores, F.lit(0), lambda acc, s: acc + s
    )
    return df.withColumns(
        {
            out: F.when(
                n > 0, total.cast("double") / n.cast("double")
            ),
            f"{out}_hits": n.cast("int"),
        }
    )
