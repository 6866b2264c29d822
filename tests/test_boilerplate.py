"""Report-then-strip boilerplate removal (spandedup.boilerplate_templates
/ strip_boilerplate) — the path SCALE.md's hostile-template analysis
prescribes for universal templates that the ``max_fp_df`` valve rightly
hides from pairwise span dedup. The headline test replants the SCALE.md
round-8 hostile corpus (600 docs each carrying one 130-char universal
template; 30 pairs sharing a genuine 192-char pairwise span) and
requires the FULL 600/600 template removal that valved span dedup could
only manage 107/599 of — at mining cost bounded by max_hot_fps ×
sample_docs, never the 600·599/2 pair table."""

from pyspark.sql import functions as F

from datamunging_spark.operators.spandedup import (
    boilerplate_templates,
    strip_boilerplate,
)

TEMPLATE = (
    "this universal template footer appears verbatim in every single "
    "document of the hostile corpus and a naive detector drowns in it."
)


def _synth_docs(spark, n, chars, seed_tag):
    reps = max(1, chars // 32)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(reps - 1)),
                lambda i: F.md5(
                    F.concat_ws("-", F.lit(seed_tag), F.col("id"), i)
                ),
            ),
        ).alias("text"),
    )


def _hostile_corpus(spark, n=600):
    """The SCALE.md round-8 hostile corpus, verbatim semantics: every
    doc = unique filler + TEMPLATE + unique filler; docs (i, i+n/2) for
    i < 30 additionally share a genuine pairwise 192-char span."""
    pair_tag = F.col("doc_id") % (n // 2)
    return (
        _synth_docs(spark, n, 600, "host")
        .withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 300),
                F.lit(TEMPLATE),
                F.substring("text", 301, 300),
            ),
        )
        .withColumn(
            "text",
            F.when(
                pair_tag < 30,
                F.concat(
                    "text",
                    F.repeat(
                        F.md5(
                            F.concat(F.lit("p"), pair_tag.cast("string"))
                        ),
                        6,
                    ),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint()
    )


def test_hostile_template_mined_and_fully_stripped(spark):
    docs = _hostile_corpus(spark)
    rep = boilerplate_templates(docs, min_df=0.5, min_span=50, gram=16)
    rows = rep.collect()
    # exactly the universal template — the 30 genuine pairwise spans
    # have df=2, far below the 50% threshold, and must NOT be reported
    assert [r["template"] for r in rows] == [TEMPLATE]
    assert rows[0]["n_docs"] == 600
    assert rows[0]["length"] == len(TEMPLATE)
    assert abs(rows[0]["doc_frac"] - 1.0) < 1e-9

    stripped = strip_boilerplate(docs, rep)
    # 600/600 — strictly stronger than span dedup's keep="first" 599,
    # and vs the valved detector's 107/599 at max_fp_df=64
    assert (
        stripped.filter(F.col("text").contains(TEMPLATE)).count() == 0
    )
    # doc-unique filler is untouched: stripped text == filler verbatim
    # for every non-pair doc
    expected = _synth_docs(spark, 600, 600, "host").select(
        "doc_id", F.substring("text", 1, 600).alias("_exp")
    )
    mism = (
        stripped.filter(F.col("doc_id") % 300 >= 30)
        .join(expected, "doc_id")
        .filter(F.col("text") != F.col("_exp"))
        .count()
    )
    assert mism == 0
    # pairwise spans survive the strip (df=2 is not boilerplate)
    pair0 = spark.sql(
        "SELECT repeat(md5('p0'), 6) AS s"
    ).collect()[0]["s"]
    assert (
        stripped.filter(F.col("text").contains(pair0)).count() == 2
    )


def test_strip_mines_when_no_templates_given(spark):
    docs = _hostile_corpus(spark, n=100)
    result, report = strip_boilerplate(
        docs, templates=None, min_df=0.5, min_span=50
    )
    assert [r["template"] for r in report.collect()] == [TEMPLATE]
    assert result.filter(F.col("text").contains(TEMPLATE)).count() == 0
    assert result.count() == 100


def test_repeated_occurrences_all_removed(spark):
    # one doc carries the template TWICE — literal replace removes all
    # occurrences, which pairwise span dedup's keep="first" would not
    docs = _hostile_corpus(spark, n=100).withColumn(
        "text",
        F.when(
            F.col("doc_id") == 7,
            F.concat("text", F.lit("xyz"), F.lit(TEMPLATE)),
        ).otherwise(F.col("text")),
    )
    stripped = strip_boilerplate(docs, [TEMPLATE])
    assert stripped.filter(F.col("text").contains(TEMPLATE)).count() == 0
    assert (
        stripped.filter(F.col("doc_id") == 7)
        .filter(F.col("text").endswith("xyz"))
        .count()
        == 1
    )


def test_near_dup_pair_cannot_fake_a_template(spark):
    # 3 of 40 docs are outright copies of each other (plus the shared
    # template): a sampled pair drawn from the copies shares EVERYTHING,
    # so its candidate is the whole doc — support verification must
    # reject it and still recover the true template exactly.
    base = _hostile_corpus(spark, n=40)
    clone = base.filter(F.col("doc_id") == 0).select(F.col("text"))
    docs = base.withColumn(
        "text",
        F.when(
            F.col("doc_id").isin(1, 2),
            F.lit(clone.collect()[0]["text"]),
        ).otherwise(F.col("text")),
    )
    rep = boilerplate_templates(docs, min_df=0.5, min_span=50)
    assert [r["template"] for r in rep.collect()] == [TEMPLATE]


def test_grouped_mining_finds_per_source_template(spark):
    # a template universal WITHIN one source but only 25% of the corpus:
    # global mining at min_df=0.5 misses it; grouped mining finds it in
    # exactly that source
    src_tpl = (
        "subscribe to the example newsletter for daily updates and "
        "never miss another story from our editorial desk again!"
    )
    docs = (
        _synth_docs(spark, 200, 400, "grp")
        .withColumn(
            "source",
            F.when(F.col("doc_id") < 50, F.lit("siteA")).otherwise(
                F.lit("siteB")
            ),
        )
        .withColumn(
            "text",
            F.when(
                F.col("source") == "siteA",
                F.concat("text", F.lit(src_tpl)),
            ).otherwise(F.col("text")),
        )
    )
    global_rep = boilerplate_templates(docs, min_df=0.5, min_span=50)
    assert global_rep.count() == 0
    grouped = boilerplate_templates(
        docs, group_col="source", min_df=0.5, min_span=50
    ).collect()
    assert [(r["source"], r["template"], r["n_docs"]) for r in grouped] == [
        ("siteA", src_tpl, 50)
    ]
    stripped = strip_boilerplate(docs, [r["template"] for r in grouped])
    assert stripped.filter(F.col("text").contains(src_tpl)).count() == 0


def test_two_templates_longest_first(spark):
    # a long template CONTAINING a shorter independent one: nested-
    # candidate dedup keeps the long one; the short one is also planted
    # independently in other docs so it must survive on its own support
    short = "short boilerplate unit that also appears on its own here."
    long_t = "PREFIX >> " + short + " << SUFFIX padding to be longer."
    docs = _synth_docs(spark, 120, 300, "two").withColumn(
        "text",
        F.when(
            F.col("doc_id") < 60, F.concat("text", F.lit(long_t))
        ).otherwise(F.concat("text", F.lit(short))),
    )
    rep = boilerplate_templates(docs, min_df=0.4, min_span=40)
    got = {r["template"] for r in rep.collect()}
    assert long_t in got
    assert short in got
    stripped = strip_boilerplate(docs, rep)
    assert stripped.filter(
        F.col("text").contains(short)
        | F.col("text").contains(long_t)
    ).count() == 0


def test_clean_corpus_empty_report_and_noop_strip(spark):
    docs = _synth_docs(spark, 50, 300, "clean")
    rep = boilerplate_templates(docs, min_df=0.3)
    assert rep.count() == 0
    assert rep.columns == ["template", "length", "n_docs", "doc_frac"]
    stripped = strip_boilerplate(docs, rep)
    assert (
        stripped.join(
            docs.select("doc_id", F.col("text").alias("_o")), "doc_id"
        )
        .filter(F.col("text") != F.col("_o"))
        .count()
        == 0
    )


def test_empty_input(spark):
    empty = _synth_docs(spark, 50, 300, "e").filter(F.lit(False))
    assert boilerplate_templates(empty, min_df=5).count() == 0
    assert strip_boilerplate(empty, ["anything here that is long"]).count() == 0


def test_absolute_min_df_and_template_cap(spark):
    docs = _hostile_corpus(spark, n=60)
    # absolute threshold: template df=60 >= 10
    rep = boilerplate_templates(docs, min_df=10, max_templates=1)
    assert [r["template"] for r in rep.collect()] == [TEMPLATE]


def test_strip_template_list_cap_raises(spark):
    # explicit strip_mode='replace' keeps the hard cap (each char is
    # rescanned once per template in that mode)
    docs = _synth_docs(spark, 5, 100, "cap")
    try:
        strip_boilerplate(
            docs, [f"template number {i} padded out" for i in range(20)],
            max_strip_templates=10, strip_mode="replace",
        )
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "max_strip_templates" in str(e)


def test_strip_auto_switches_to_automaton_above_cap(spark):
    # strip_mode='auto' (default) no longer raises above the replace cap:
    # it switches to the Aho-Corasick pass. Blocklist-scale set (>1024
    # templates, most absent from the corpus) with a handful planted.
    tpls = [f"blocklist boilerplate template number {i:05d} padded long"
            for i in range(1100)]
    docs = spark.createDataFrame(
        [
            (0, f"alpha {tpls[7]} bravo"),
            (1, f"{tpls[500]}charlie{tpls[1099]}"),
            (2, "delta untouched echo"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"]
           for r in strip_boilerplate(docs, tpls).collect()}
    assert out[0] == "alpha  bravo"
    assert out[1] == "charlie"
    assert out[2] == "delta untouched echo"
    assert out[3] is None


def test_automaton_strip_equals_replace_chain_on_hostile_corpus(spark):
    # mode equality on the SCALE.md hostile corpus: the mined template
    # set stripped via the codegen replace chain and via the automaton
    # pass must produce byte-identical corpora.
    docs = _hostile_corpus(spark)
    rep = boilerplate_templates(docs, min_df=0.5, min_span=50, gram=16)
    tpls = [r["template"] for r in rep.collect()]
    chain = strip_boilerplate(docs, tpls, strip_mode="replace")
    autom = strip_boilerplate(docs, tpls, strip_mode="automaton")
    diff = (
        chain.select("doc_id", F.col("text").alias("_a"))
        .join(autom.select("doc_id", F.col("text").alias("_b")), "doc_id")
        .filter(~F.col("_a").eqNullSafe(F.col("_b")))
        .count()
    )
    assert diff == 0
    assert autom.filter(F.col("text").contains(TEMPLATE)).count() == 0


def test_automaton_strip_overlap_and_nesting_semantics():
    # driver-side unit tests of the single-pass resolver against the
    # sequential str.replace chain (the semantics F.replace implements)
    from datamunging_spark.operators.spandedup import _strip_once
    from datamunging_spark.operators.trainset import _ac_build

    def chain_ref(text, tpls):
        for t in sorted(tpls, key=lambda s: (-len(s), s)):
            text = text.replace(t, "")
        return text

    cases = [
        # nested: longer template wins over its substring
        ("xx<<FOOTER>>yy", ["<<FOOTER>>", "FOOTER"]),
        # overlapping same-length: chain order (lex) decides
        ("abab", ["ab", "ba"]),
        ("bab", ["ab", "ba"]),
        # within-template overlap phases: leftmost non-overlapping
        ("aaaa", ["aa"]),
        ("aaa", ["aa"]),
        # repeated + adjacent occurrences
        ("T1T1T1 mid T1", ["T1"]),
        # template at string edges
        ("EDGEmiddleEDGE", ["EDGE"]),
        ("", ["EDGE"]),
    ]
    for text, tpls in cases:
        chain = sorted(dict.fromkeys(tpls), key=lambda s: (-len(s), s))
        auto = _ac_build(chain)
        lens = tuple(len(t) for t in chain)
        got = _strip_once(text, auto, lens, range(len(lens)))
        assert got == chain_ref(text, tpls), (text, tpls, got)


def test_replace_fold_branch_equals_nested_chain(spark):
    # >_chain_batch templates in replace mode exercises the F.aggregate
    # fold (constant plan depth); must equal the nested chain's output.
    tpls = [f"fold template number {i:03d} padded out long enough" for i in range(9)]
    docs = spark.createDataFrame(
        [(0, f"aa{tpls[3]}bb{tpls[8]}cc"), (1, "untouched"), (2, None)],
        "doc_id long, text string",
    )
    nested = strip_boilerplate(docs, tpls, strip_mode="replace")
    fold = strip_boilerplate(docs, tpls, strip_mode="replace",
                             _chain_batch=4)
    a = {r["doc_id"]: r["text"] for r in nested.collect()}
    b = {r["doc_id"]: r["text"] for r in fold.collect()}
    assert a == b
    assert a[0] == "aabbcc"
    assert a[2] is None


def test_strip_rejects_unknown_mode(spark):
    docs = _synth_docs(spark, 2, 50, "mode")
    try:
        strip_boilerplate(docs, ["zzz long enough template zzz"],
                          strip_mode="bogus")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "strip_mode" in str(e)


def test_automaton_broadcast_cached_and_released(spark):
    # r10 ADVICE: repeated automaton strips with an unchanged blocklist
    # must reuse ONE content-keyed broadcast; strip_release retires it.
    from datamunging_spark.operators import spandedup

    tpls = ["cached template alpha long enough to matter",
            "cached template beta long enough to matter"]
    docs = spark.createDataFrame(
        [(0, f"xx{tpls[0]}yy")], "doc_id long, text string"
    )
    spandedup._AC_BC_CACHE.clear()
    strip_boilerplate(docs, tpls, strip_mode="automaton").collect()
    assert len(spandedup._AC_BC_CACHE) == 1
    strip_boilerplate(docs, list(reversed(tpls)),
                      strip_mode="automaton").collect()
    # same chain after dedupe+sort -> same key, still one entry
    assert len(spandedup._AC_BC_CACHE) == 1
    from datamunging_spark.operators.spandedup import strip_release

    assert strip_release(tpls) is True
    assert len(spandedup._AC_BC_CACHE) == 0
    assert strip_release(tpls) is False  # already released
    # r11 ADVICE: entries keyed by a DEAD applicationId (app restart)
    # can never match again — any later broadcast or release call
    # sweeps them out instead of pinning them for the process lifetime

    class _DeadBC:
        released = False

        def unpersist(self):
            self.released = True

    dead = _DeadBC()
    spandedup._AC_BC_CACHE[("app-gone", "deadbeef")] = dead
    strip_boilerplate(docs, tpls, strip_mode="automaton").collect()
    assert ("app-gone", "deadbeef") not in spandedup._AC_BC_CACHE
    assert dead.released
    assert len(spandedup._AC_BC_CACHE) == 1  # the live entry remains
    dead2 = _DeadBC()
    spandedup._AC_BC_CACHE[("app-gone-2", "deadbeef")] = dead2
    assert strip_release(tpls) is True  # release sweeps dead apps too
    assert dead2.released
    assert len(spandedup._AC_BC_CACHE) == 0


def test_ac_build_closure_on_shared_suffixes():
    # set-based fail-closure merge (r10 ADVICE perf fix) must still
    # produce the full closure: patterns sharing suffixes emit at the
    # longer pattern's end state; out tuples are sorted for determinism.
    from datamunging_spark.operators.trainset import _ac_build

    pats = ["abcde", "bcde", "cde", "de", "e"]
    goto, fail, out = _ac_build(pats)
    s = 0
    for ch in "abcde":
        while s and ch not in goto[s]:
            s = fail[s]
        s = goto[s].get(ch, 0)
    # end state of "abcde" must report every suffix pattern, sorted
    assert out[s] == (0, 1, 2, 3, 4)
    assert all(o == tuple(sorted(o)) for o in out)
