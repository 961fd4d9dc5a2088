"""Round-5b curation operators: passage-level global dedup (C4-style
repeated-span removal) and corpus-trained bigram LM fluency scoring.
Hand-computed micro-corpora value checks; DuckDB value parity at
driver-testdata scale lives in tools/check_oracles.py."""

from __future__ import annotations

from ocr_translation_spark.functions.lm import bigram_lm_score
from ocr_translation_spark.functions.passage import passage_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- passage


def test_passage_dedup_removes_repeated_passage(spark):
    # "the quick brown fox" appears in docs 1 and 2 -> boiler at
    # min_count=2; doc 3 shares no repeated 4-gram.
    docs = _docs(
        spark,
        [
            (1, "intro the quick brown fox outro one"),
            (2, "the quick brown fox closing words here"),
            (3, "completely unrelated text with other tokens"),
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in passage_dedup(docs, k=4, min_count=2).collect()
    }
    assert got[1]["cleaned_text"] == "intro outro one"
    assert got[1]["n_words"] == 7 and got[1]["n_removed"] == 4
    assert got[2]["cleaned_text"] == "closing words here"
    assert got[3]["n_removed"] == 0
    assert got[3]["cleaned_text"] == "completely unrelated text with other tokens"


def test_passage_dedup_overlapping_grams_union_coverage(spark):
    # "a b c" and "b c d" both repeated: coverage is the UNION of the
    # two spans, so "a b c d" vanishes entirely from both docs.
    docs = _docs(
        spark,
        [(1, "a b c d x"), (2, "a b c d y"), (3, "p q r s t")],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in passage_dedup(docs, k=3, min_count=2).collect()
    }
    assert got[1]["cleaned_text"] == "x" and got[1]["n_removed"] == 4
    assert got[2]["cleaned_text"] == "y"


def test_passage_dedup_within_doc_repetition_counts(spark):
    # the SAME doc repeating a passage twice reaches min_count=2 alone
    docs = _docs(
        spark,
        [(1, "a b c z z z a b c"), (2, "u v w x y q r")],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in passage_dedup(docs, k=3, min_count=2).collect()
    }
    assert got[1]["cleaned_text"] == "z z z"  # 'z z z' occurs once
    assert got[2]["n_removed"] == 0


def test_passage_dedup_blank_and_short_docs(spark):
    docs = _docs(spark, [(1, "   "), (2, "a b"), (3, "a b")])
    got = {
        r["doc_id"]: r.asDict()
        for r in passage_dedup(docs, k=3, min_count=2).collect()
    }
    # blank -> 0 tokens; 2-token docs emit no 3-grams -> untouched
    assert got[1] == {
        "doc_id": 1, "n_words": 0, "n_removed": 0, "cleaned_text": ""
    }
    assert got[2]["cleaned_text"] == "a b" and got[2]["n_removed"] == 0


def test_passage_dedup_plan_no_cartesian(spark):
    docs = _docs(spark, [(i, f"w{i} x{i} y{i} z{i}") for i in range(20)])
    plan = passage_dedup(docs, k=3, min_count=2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ lm


def test_bigram_lm_score_hand_computed(spark):
    # corpus: "a b", "a b", "a c".  V = 3 (a, b, c).
    # bigram counts: (a b)->2, (a c)->1; prefix c(a)=3.
    # P(b|a) = (2+1)/(3+3) = 1/2 -> 500000 micro
    # P(c|a) = (1+1)/(3+3) = 1/3 -> 333333 micro (floor)
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    got = {
        r["doc_id"]: r.asDict() for r in bigram_lm_score(docs).collect()
    }
    assert got[1] == {
        "doc_id": 1, "n_bigrams": 1, "sum_p_micro": 500000,
        "mean_p_micro": 500000,
    }
    assert got[3]["sum_p_micro"] == 333333


def test_bigram_lm_score_ranks_fluent_above_shuffled(spark):
    # docs repeating the corpus-dominant transition score above a doc
    # of one-off transitions — the CCNet filtering direction.
    rows = [(i, "a b a b a b a b") for i in range(5)]
    rows.append((99, "b b a a b a q a"))
    got = {
        r["doc_id"]: r["mean_p_micro"]
        for r in bigram_lm_score(_docs(spark, rows)).collect()
    }
    assert got[0] > got[99]


def test_bigram_lm_score_short_docs_zero(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "a b")])
    got = {
        r["doc_id"]: r.asDict() for r in bigram_lm_score(docs).collect()
    }
    for d in (1, 2):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["sum_p_micro"] == 0
        assert got[d]["mean_p_micro"] == 0
    assert got[3]["n_bigrams"] == 1


# ----------------------------------------------------------------- pii


def test_scrub_pii_classes_and_order(spark):
    from ocr_translation_spark.functions.pii import scrub_pii

    docs = _docs(
        spark,
        [
            (1, "mail joe.doe+x@exa-mple.co.uk and jane@b.org now"),
            (2, "call 555-123-4567 or 555.987.6543 from 192.168.0.1"),
            (3, "clean text with no identifiers at all"),
            (4, ""),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in scrub_pii(docs).collect()}
    assert got[1]["n_email"] == 2 and got[1]["n_phone"] == 0
    assert got[1]["scrubbed_text"] == "mail <PII> and <PII> now"
    assert got[2]["n_phone"] == 2 and got[2]["n_ipv4"] == 1
    assert got[2]["scrubbed_text"] == "call <PII> or <PII> from <PII>"
    assert got[3] == {
        "doc_id": 3, "text": "clean text with no identifiers at all",
        "n_email": 0, "n_phone": 0, "n_ipv4": 0,
        "scrubbed_text": "clean text with no identifiers at all",
    }
    assert got[4]["scrubbed_text"] == ""


def test_scrub_pii_email_claims_digits_before_phone(spark):
    # the digit run inside an email local part must be scrubbed as
    # EMAIL, not double-counted by the phone class afterwards
    from ocr_translation_spark.functions.pii import scrub_pii

    docs = _docs(spark, [(1, "reach 555-123-4567x@corp.io today")])
    r = scrub_pii(docs).collect()[0]
    assert r["n_email"] == 1 and r["n_phone"] == 0
    assert r["scrubbed_text"] == "reach <PII> today"


# ----------------------------------------- randomized brute-force parity


def _rand_corpus(seed, n_docs=80, vocab=8, max_len=15):
    import random

    rnd = random.Random(seed)
    words = [f"w{i}" for i in range(vocab)]
    return [
        (i, " ".join(rnd.choice(words) for _ in range(rnd.randint(0, max_len))))
        for i in range(n_docs)
    ]


def test_passage_dedup_matches_bruteforce_random(spark):
    from collections import Counter

    k, mc = 3, 3
    rows = _rand_corpus(seed=42)
    # brute force: global gram counts, then per-doc coverage filter
    toks = {i: t.split() if t.strip() else [] for i, t in rows}
    counts = Counter(
        " ".join(ts[j:j + k])
        for ts in toks.values()
        for j in range(max(len(ts) - k + 1, 0))
    )
    want = {}
    for i, ts in toks.items():
        starts = [
            j for j in range(max(len(ts) - k + 1, 0))
            if counts[" ".join(ts[j:j + k])] >= mc
        ]
        covered = {p for s in starts for p in range(s, s + k)}
        kept = [w for j, w in enumerate(ts) if j not in covered]
        want[i] = (len(ts), len(ts) - len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["cleaned_text"])
        for r in passage_dedup(
            _docs(spark, rows), k=k, min_count=mc
        ).collect()
    }
    assert got == want


def test_bigram_lm_score_matches_bruteforce_random(spark):
    from collections import Counter

    rows = _rand_corpus(seed=7, n_docs=60, vocab=5, max_len=12)
    toks = {i: t.split() if t.strip() else [] for i, t in rows}
    vocab_size = len({w for ts in toks.values() for w in ts})
    bic = Counter(
        (ts[j], ts[j + 1]) for ts in toks.values()
        for j in range(len(ts) - 1)
    )
    pre = Counter()
    for (w1, _), c in bic.items():
        pre[w1] += c
    want = {}
    for i, ts in toks.items():
        ps = [
            ((bic[(ts[j], ts[j + 1])] + 1) * 1_000_000)
            // (pre[ts[j]] + vocab_size)
            for j in range(len(ts) - 1)
        ]
        n, s = len(ps), sum(ps)
        want[i] = (n, s, s // n if n else 0)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_p_micro"], r["mean_p_micro"])
        for r in bigram_lm_score(_docs(spark, rows)).collect()
    }
    assert got == want
