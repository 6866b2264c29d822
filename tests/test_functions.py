"""Scalar-function semantics (SURVEY.md §2.5) — the NULL-parity traps."""

from pyspark.sql import functions as F

from datamunging_spark.functions import (
    cast_int_hive,
    cosine_similarity,
    normalize_text,
    parse_money,
    regex_extract,
    tokenize,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_regex_extract_null_on_non_match(spark):
    """Pig REGEX_EXTRACT returns NULL (not '') on non-match (README.md:140)."""
    df = spark.createDataFrame(
        [("99213",), ("Q0091",), ("bad",), ("",), (None,)], ["code"]
    )
    out = df.select(
        regex_extract("code", r"(^[A-Z0-9]\d{3}[A-Z0-9]$)", 1).alias("m")
    ).collect()
    assert [r["m"] for r in out] == ["99213", "Q0091", None, None, None]


def test_cast_int_hive_null_on_bad(spark):
    # '.' and '1.5' pin Hive parity: Spark's bare ANSI-off cast routes
    # through decimal ('.'->0, '1.5'->1); Hive NULLs both.
    # '123\n' pins the \A..\z anchors: Java's $ matches before a final
    # newline, so a ^..$ gate would cast it while Hive NULLs it.
    df = spark.createDataFrame(
        [(" 13 ",), ("x",), ("",), ("42",), (".",), ("1.5",), ("+7",),
         ("-8",), ("99999999999",), ("123\n",)],
        ["s"],
    )
    out = [r["v"] for r in df.select(cast_int_hive("s").alias("v")).collect()]
    assert out == [13, None, None, 42, None, None, 7, -8, None, None]


def test_parse_money(spark):
    df = spark.createDataFrame([("$50.03",), ("$1,234.56",), ("junk",)], ["s"])
    out = [r["v"] for r in df.select(parse_money("s").alias("v")).collect()]
    assert str(out[0]) == "50.03" and str(out[1]) == "1234.56" and out[2] is None


def test_tokenize_keeps_empty_tokens(spark):
    """Python str.split(' ') parity: 'a  b' → ['a', '', 'b'] (R22)."""
    df = spark.createDataFrame([("a  b ",)], ["s"])
    out = df.select(tokenize("s").alias("t")).first()["t"]
    assert out == "a  b ".split(" ") == ["a", "", "b", ""]


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello \t WORLD  ",)], ["s"])
    assert _one(spark, normalize_text(F.lit("  Hello \t WORLD  "))) == "hello world"


def test_cosine_similarity(spark):
    v = _one(
        spark,
        cosine_similarity(
            F.array(F.lit(1.0), F.lit(0.0)), F.array(F.lit(0.5), F.lit(0.5))
        ),
    )
    assert abs(v - 0.7071067811865475) < 1e-12


def test_redact_pii_all_kinds(spark):
    from datamunging_spark.functions import pii_counts, redact_pii

    text = (
        "mail alice.smith+x@example.co.uk or call (415) 555-0137, "
        "server 192.168.10.1, ssn 123-45-6789, card 4111-1111-1111-1111, "
        "year 2024 stays and so does plain 1234"
    )
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    out = df.select(
        redact_pii("text").alias("red"), pii_counts("text").alias("n")
    ).collect()[0]
    assert "<EMAIL>" in out["red"] and "alice" not in out["red"]
    assert "<PHONE>" in out["red"] and "555-0137" not in out["red"]
    assert "<IP>" in out["red"] and "192.168" not in out["red"]
    assert "<SSN>" in out["red"] and "123-45-6789" not in out["red"]
    assert "<CC>" in out["red"] and "4111" not in out["red"]
    # non-PII digits survive
    assert "2024" in out["red"] and "plain 1234" in out["red"]
    n = out["n"].asDict()
    assert n == {"email": 1, "ip": 1, "ssn": 1, "credit_card": 1, "phone": 1}


def test_redact_pii_subset_and_clean_text(spark):
    from datamunging_spark.functions import redact_pii

    df = spark.createDataFrame(
        [(1, "reach a@b.io at 10.0.0.1"), (2, "no pii here at all")],
        ["id", "text"],
    )
    rows = {
        r["id"]: r["red"]
        for r in df.select("id", redact_pii("text", ["email"]).alias("red")).collect()
    }
    assert rows[1] == "reach <EMAIL> at 10.0.0.1"  # ip kind not requested
    assert rows[2] == "no pii here at all"


def test_redact_pii_explicit_empty_kinds_is_noop(spark):
    from datamunging_spark.functions import redact_pii

    df = spark.createDataFrame([(1, "mail a@b.io")], ["id", "text"])
    assert df.select(redact_pii("text", []).alias("r")).collect()[0]["r"] == (
        "mail a@b.io"
    )


def test_normalize_url_canonicalization(spark):
    """Crawl URL canonicalization: scheme/www/fragment/trailing-slash/
    tracking-param/param-order variants collapse to one identity; distinct
    paths (case included) stay distinct; NULL propagates."""
    from datamunging_spark.functions import normalize_url

    rows = [
        ("a1", "https://www.Example.com/Path/?b=2&a=1&utm_source=x#frag"),
        ("a2", "http://example.com/Path?a=1&b=2"),
        ("a3", "EXAMPLE.com/Path/?b=2&utm_campaign=y&a=1"),
        ("b1", "https://example.com/path"),          # path case differs
        ("c1", "https://example.com/Path?a=2&b=2"),  # param value differs
        ("n1", None),
    ]
    df = spark.createDataFrame(rows, ["k", "url"]).select(
        "k", normalize_url("url").alias("norm")
    )
    got = {r["k"]: r["norm"] for r in df.collect()}
    assert got["a1"] == got["a2"] == got["a3"] == "example.com/Path?a=1&b=2"
    assert got["b1"] == "example.com/path" != got["a1"]
    assert got["c1"] == "example.com/Path?a=2&b=2" != got["a1"]
    assert got["n1"] is None


def test_url_dedup_min_id_survivor(spark):
    from datamunging_spark.operators.dedup import url_dedup

    rows = [
        (3, "https://www.site.com/a?x=1&utm_source=t"),
        (1, "http://site.com/a/?x=1"),
        (2, "site.com/a?x=1#top"),
        (9, "https://site.com/b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
    assert kept == [1, 9]


def test_url_domain_extraction(spark):
    from datamunging_spark.functions import url_domain

    rows = [
        ("a", "https://www.blog.Example.com/post/1?x=2"),
        ("b", "http://example.com:8080/other"),
        ("c", "cdn.assets.example.org/file.js"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, ["k", "url"])
    reg = {r["k"]: r["d"] for r in df.select("k", url_domain("url").alias("d")).collect()}
    assert reg == {"a": "example.com", "b": "example.com", "c": "example.org", "d": None}
    full = {
        r["k"]: r["d"]
        for r in df.select("k", url_domain("url", registered=False).alias("d")).collect()
    }
    assert full["a"] == "blog.example.com" and full["c"] == "cdn.assets.example.org"


def test_domain_cap_composition(spark):
    """url_domain feeds cap_per_group: at most N docs per registered
    domain, deterministic under the salt."""
    from datamunging_spark.functions import url_domain
    from datamunging_spark.operators.sampling import cap_per_group

    rows = [(i, f"https://hub.example.com/p{i}") for i in range(10)] + [
        (100, "https://other.org/x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"]).withColumn(
        "domain", url_domain("url")
    )
    capped = cap_per_group(df, ["domain"], n=3, id_cols=["doc_id"])
    by_dom = {
        r["domain"]: r["cnt"]
        for r in capped.groupBy("domain").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_dom == {"example.com": 3, "other.org": 1}


def test_strip_html_extraction(spark):
    """HTML extraction: script/style/comments vanish wholesale, block tags
    become paragraph breaks, entities decode, whitespace collapses; plain
    text and NULL pass through."""
    from datamunging_spark.functions import strip_html

    html = (
        "<html><head><style>body{color:red}</style>"
        "<script>var x = '<p>not text</p>';</script></head>"
        "<body><!-- hidden --><h1>Title&nbsp;One</h1>"
        "<p>First &amp; second &lt;para&gt;.</p>"
        "<div>Item   list:</div><ul><li>a</li><li>b</li></ul></body></html>"
    )
    rows = [(1, html), (2, "plain text stays"), (3, None)]
    got = {
        r["doc_id"]: r["t"]
        for r in spark.createDataFrame(rows, ["doc_id", "text"])
        .select("doc_id", strip_html("text").alias("t"))
        .collect()
    }
    assert "var x" not in got[1] and "color:red" not in got[1]
    assert "hidden" not in got[1]
    assert "Title One" in got[1]
    assert 'First & second <para>.' in got[1]
    assert "Title One\n" in got[1]  # block closer became a line break
    assert got[1].count("  ") == 0
    assert got[2] == "plain text stays"
    assert got[3] is None
