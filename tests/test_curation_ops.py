"""Round-5 curation operators: benchmark decontamination, vocabulary
OOV coverage, unigram concentration signals, deterministic mixture
resampling.  Value checks on hand-computed micro-corpora plus plan
assertions for the broadcast shapes the 100 TB story depends on.
(The driver-testdata value parity vs DuckDB lives in
test_entry_oracle.py / tools/check_oracles.py.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_translation_spark.functions.decontam import ngram_decontaminate
from ocr_translation_spark.functions.sampling import weighted_mixture_sample
from ocr_translation_spark.functions.text import token_concentration
from ocr_translation_spark.functions.vocab import build_vocab, oov_rate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- decontam


def test_decontaminate_flags_overlap_and_short_docs(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    corpus = _docs(
        spark,
        [
            (1, "x y a b c d z"),   # contains bench 4-gram "a b c d"
            (2, "x y z w q r"),     # no overlap
            (3, "a b c"),           # < 4 tokens: no grams at all
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in ngram_decontaminate(corpus, bench, n=4).collect()
    }
    assert got[1]["contaminated"] and got[1]["n_hits"] == 1
    assert got[1]["n_grams"] == 4  # 7 tokens -> 4 distinct 4-grams
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert got[3] == {
        "doc_id": 3, "n_grams": 0, "n_hits": 0, "contaminated": False
    }


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same contaminated gram appearing twice in a doc is ONE hit
    bench = _docs(spark, [(100, "a b c d")])
    corpus = _docs(spark, [(1, "a b c d x a b c d")])
    row = ngram_decontaminate(corpus, bench, n=4).collect()[0]
    assert row["n_hits"] == 1 and row["contaminated"]


def test_decontaminate_plan_broadcasts_dictionary(spark):
    bench = _docs(spark, [(100, "a b c d e")])
    corpus = _docs(spark, [(1, "a b c d e f g")])
    plan = ngram_decontaminate(corpus, bench, n=4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------------------------- vocab


def test_vocab_top_v_deterministic_ties(spark):
    docs = _docs(spark, [(1, "b b a a c")])
    # a and b tie at 2 -> token text breaks the tie -> vocab = {a}
    vocab = [r["tok"] for r in build_vocab(docs, 1).collect()]
    assert vocab == ["a"]


def test_oov_rate_values_and_empty_doc(spark):
    docs = _docs(spark, [(1, "a a b c"), (2, "a a a a"), (3, "  ")])
    vocab = build_vocab(docs, 1)  # {a}: 6 occurrences
    got = {r["doc_id"]: r.asDict() for r in oov_rate(docs, vocab).collect()}
    assert got[1] == {
        "doc_id": 1, "n_tokens": 4, "n_oov": 2, "oov_rate": 0.5
    }
    assert got[2]["n_oov"] == 0 and got[2]["oov_rate"] == 0.0
    assert got[3] == {
        "doc_id": 3, "n_tokens": 0, "n_oov": 0, "oov_rate": 0.0
    }


def test_oov_plan_broadcasts_vocab(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a a d")])
    plan = oov_rate(docs, build_vocab(docs, 2))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------------------- concentration


def test_token_concentration_hand_computed(spark):
    # doc 1: a a a b  -> n=4, m=3, sum_c2=10, types=2, hapax=1
    docs = _docs(spark, [(1, "a a a b"), (2, "")])
    got = {
        r["doc_id"]: r.asDict()
        for r in token_concentration(docs).collect()
    }
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_token_frac"] == 0.75
    assert got[1]["simpson_index"] == round(1 - 10 / 16, 6)
    assert got[1]["hapax_frac"] == 0.5
    assert got[2] == {
        "doc_id": 2, "n_tokens": 0, "top_token_frac": 0.0,
        "simpson_index": 0.0, "hapax_frac": 0.0,
    }


def test_token_concentration_degenerate_doc(spark):
    # all-one-token doc: concentration maxes out, diversity bottoms out
    docs = _docs(spark, [(1, "spam spam spam spam spam")])
    row = token_concentration(docs).collect()[0]
    assert row["top_token_frac"] == 1.0
    assert row["simpson_index"] == 0.0
    assert row["hapax_frac"] == 0.0


# ----------------------------------------------------------------- mixture


def test_mixture_sample_determinism_and_small_strata_kept(spark):
    rows = [(i, f"t{'x' * (i % 3)}", f"s{i % 2}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    small = spark.createDataFrame(
        [(1000 + i, "t", "tiny") for i in range(5)],
        "doc_id long, text string, source string",
    )
    out1 = weighted_mixture_sample(
        df.union(small), "source", "doc_id", 20
    )
    a = sorted(r["doc_id"] for r in out1.collect())
    b = sorted(r["doc_id"] for r in out1.collect())
    assert a == b  # content-addressed, not RNG
    # strata at-or-under the cap are kept verbatim
    kept_tiny = [i for i in a if i >= 1000]
    assert len(kept_tiny) == 5
    # the two 100-row strata land near E[20 kept] each (binomial-ish
    # bound wide enough to never flake: p=0.2, n=100)
    per = [sum(1 for i in a if i < 1000 and i % 2 == s) for s in (0, 1)]
    assert all(5 <= c <= 40 for c in per), per


def test_mixture_sample_matches_probability_rule(spark):
    # brute-force the rule in Python for one stratum and compare
    import hashlib

    rows = [(i, "t", "s") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = sorted(
        r["doc_id"]
        for r in weighted_mixture_sample(df, "source", "doc_id", 10).collect()
    )
    want = [
        i
        for i in range(50)
        if int(hashlib.sha256(str(i).encode()).hexdigest()[:15], 16) * 50
        < 10 * 16**15
    ]
    assert got == want


# -------------------------------------------------------- run_length_stats


def test_run_length_stats_randomized_against_counter(spark):
    """Cross-check the in-row run scan against collections.Counter on
    deterministic pseudo-random token arrays (incl. empty)."""
    import random
    from collections import Counter

    from ocr_translation_spark.functions.text import run_length_stats

    rng = random.Random(42)
    arrays = [[]] + [
        [rng.choice("abcdef") for _ in range(rng.randrange(1, 40))]
        for _ in range(60)
    ]
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, arr array<string>"
    )
    got = {
        r["i"]: r["s"].asDict()
        for r in df.select("i", run_length_stats(F.col("arr")).alias("s")).collect()
    }
    for i, a in enumerate(arrays):
        c = Counter(a)
        want = {
            "mx": max(c.values(), default=0),
            "dup": sum(v for v in c.values() if v >= 2),
            "types": len(c),
            "hapax": sum(1 for v in c.values() if v == 1),
            "sumc2": sum(v * v for v in c.values()),
        }
        assert got[i] == want, (i, a, got[i], want)
