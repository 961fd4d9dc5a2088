"""T5 span-corruption example generation (functions/corruption.py)."""

from __future__ import annotations

import hashlib
import re


def _py_corrupt(doc_id, text, select_mod=4, B=5, L=3):
    norm = re.sub(r"\s+", " ", text.strip().lower())
    toks = [] if norm == "" else norm.split(" ")
    n = len(toks)
    nb = (n + B - 1) // B
    inp, tgt, k = [], [], 0
    for b in range(nb):
        h = int(
            hashlib.sha256(f"{doc_id}:{b}".encode()).hexdigest()[:5], 16
        )
        masked = (B * b + L <= n) and (h % select_mod == 0)
        if masked:
            sent = f"<extra_id_{k}>"
            inp += [sent] + toks[B * b + L : B * b + B]
            tgt += [sent] + toks[B * b : B * b + L]
            k += 1
        else:
            inp += toks[B * b : B * b + B]
    return (n, k, k * L, " ".join(inp), " ".join(tgt))


def _run(spark, rows, **kw):
    from ocr_translation_spark.functions.corruption import span_corruption

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_corruption(df, **kw)
    return {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_spans"],
            r["n_masked_tokens"],
            r["input_text"],
            r["target_text"],
        )
        for r in out.collect()
    }


def test_python_parity_varied_lengths(spark):
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(i * 3 % 23)))
        for i in range(40)
    ]
    got = _run(spark, rows)
    for did, text in rows:
        assert got[did] == _py_corrupt(did, text), f"doc {did}"
    # the 1-in-4 selector actually masks something across 40 docs
    assert any(v[1] > 0 for v in got.values())
    # and leaves something unmasked
    assert any(v[1] == 0 for v in got.values() if v[0] > 0)


def test_roundtrip_reconstruction(spark):
    # input + target together reconstruct the original token stream:
    # replace <extra_id_k> in input with the k-th target span
    rows = [(i, " ".join(f"w{j}" for j in range(17))) for i in range(30)]
    got = _run(spark, rows)
    for did, text in rows:
        n, k, nm, inp, tgt = got[did]
        spans = {}
        cur = None
        for tok in tgt.split(" ") if tgt else []:
            if tok.startswith("<extra_id_"):
                cur = tok
                spans[cur] = []
            else:
                spans[cur].append(tok)
        out = []
        for tok in inp.split(" ") if inp else []:
            if tok.startswith("<extra_id_"):
                out += spans[tok]
            else:
                out.append(tok)
        assert " ".join(out) == text.lower()


def test_blank_and_short_docs(spark):
    got = _run(spark, [(1, "   "), (2, "a b"), (3, "")])
    assert got[1] == (0, 0, 0, "", "")
    # 2 tokens: block 0 not maskable (5*0+3 > 2) -> passthrough
    assert got[2] == (2, 0, 0, "a b", "")
    assert got[3] == (0, 0, 0, "", "")


def test_select_mod_one_masks_every_full_block(spark):
    got = _run(spark, [(7, " ".join(f"x{j}" for j in range(10)))],
               select_mod=1)
    n, k, nm, inp, tgt = got[7]
    assert (n, k, nm) == (10, 2, 6)
    assert inp == "<extra_id_0> x3 x4 <extra_id_1> x8 x9"
    assert tgt == "<extra_id_0> x0 x1 x2 <extra_id_1> x5 x6 x7"
