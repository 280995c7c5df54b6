"""Unigram-LM tokenizer (functions/unigram.py): parity of the
distributed training path against an independent sequential reference,
Viterbi encode parity, determinism across partitioning, persistence,
and the tokenizer= integration into chunking / budget sampling.

The numeric spec (accumulation order of the lattice logsumexp, the
per-word fixed-point rounding, the prune ordering) is part of the
contract — the reference follows the spec, the implementation follows
the reference's results exactly."""

from __future__ import annotations

import math
import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.functions.bpe import train_bpe
from kmeanwithmapreduce_spark.functions.unigram import (
    UnigramTokenizer,
    rebuild_tokenizer,
    train_unigram,
)
from kmeanwithmapreduce_spark.functions.bpe import word_frequencies
from kmeanwithmapreduce_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"
_SCALE = 1 << 20
_NEG = float("-inf")


# -- independent sequential reference ---------------------------------------


def _lse(a, b):
    # the spec's binary logsumexp form: max-shifted two-term sum (the
    # exact expression matters — log1p(exp(d)) differs by ulps and the
    # parity contract is exact integers)
    if a == _NEG:
        return b
    if b == _NEG:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _ref_logprobs(counts):
    # spec form: log(c) - log(total), not log(c / total) (ulp-distinct)
    lt = math.log(sum(counts.values()))
    return {p: math.log(c) - lt for p, c in counts.items()}


def ref_train(word_freqs, vocab_size, seed_size, max_piece_len,
              shrink=0.75, em_iters=2, min_count=2, prune_by="count"):
    """Straight-line single-process unigram-LM training following the
    documented spec; no Spark, no code shared with the module beyond
    the spec itself."""
    words = [("▁" + w, int(f)) for w, f in word_freqs]

    cnt: Counter = Counter()
    for w, f in words:
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                cnt[w[i : i + ln]] += f
    counts = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1 and c >= min_count),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    counts.update(dict(multi))

    def em_once(counts):
        lp = _ref_logprobs(counts)
        agg: dict[str, int] = {}
        for w, f in words:
            n = len(w)
            fwd = [_NEG] * (n + 1)
            fwd[0] = 0.0
            for i in range(1, n + 1):
                a = _NEG
                for ln in range(1, min(max_piece_len, i) + 1):
                    v = lp.get(w[i - ln : i])
                    if v is not None:
                        a = _lse(a, fwd[i - ln] + v)
                fwd[i] = a
            bwd = [_NEG] * (n + 1)
            bwd[n] = 0.0
            for i in range(n - 1, -1, -1):
                a = _NEG
                for ln in range(1, min(max_piece_len, n - i) + 1):
                    v = lp.get(w[i : i + ln])
                    if v is not None:
                        a = _lse(a, v + bwd[i + ln])
                bwd[i] = a
            z = fwd[n]
            if z == _NEG:
                continue
            per_word: dict[str, float] = {}
            for i in range(n):
                for ln in range(1, min(max_piece_len, n - i) + 1):
                    piece = w[i : i + ln]
                    v = lp.get(piece)
                    if v is None:
                        continue
                    per_word[piece] = per_word.get(piece, 0.0) + math.exp(
                        fwd[i] + v + bwd[i + ln] - z
                    )
            for piece, p in per_word.items():
                c = int(round(p * f * _SCALE))
                if c:
                    agg[piece] = agg.get(piece, 0) + c
        return agg

    while True:
        for _ in range(em_iters):
            new = em_once(counts)
            for p in counts:
                if len(p) == 1 and not new.get(p):
                    new[p] = 1
            counts = new
        if len(counts) <= vocab_size:
            break
        target = max(vocab_size, int(len(counts) * shrink))
        chars = {p: c for p, c in counts.items() if len(p) == 1}
        if prune_by == "loss":
            # Kudo §3.2 spec: loss = expected count x (logp(piece) -
            # best logp of re-segmenting the piece WITHOUT itself)
            lp = _ref_logprobs(counts)
            scored = []
            for p, c in counts.items():
                if len(p) == 1:
                    continue
                n = len(p)
                best = [_NEG] * (n + 1)
                best[0] = 0.0
                for i in range(1, n + 1):
                    for ln in range(1, min(max_piece_len, i) + 1):
                        sub = p[i - ln : i]
                        if sub == p:
                            continue
                        v = lp.get(sub)
                        if v is not None and best[i - ln] + v > best[i]:
                            best[i] = best[i - ln] + v
                scored.append((p, c, c * (lp[p] - best[n])))
            scored.sort(key=lambda t: (-t[2], t[0]))
            pruned = dict(chars)
            pruned.update({p: c for p, c, _l in
                           scored[: max(0, target - len(chars))]})
        else:
            multi = sorted(
                ((p, c) for p, c in counts.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0]),
            )
            pruned = dict(chars)
            pruned.update(dict(multi[: max(0, target - len(chars))]))
        if len(pruned) == len(counts):
            break
        counts = pruned
    return sorted(counts.items(), key=lambda pc: (-pc[1], pc[0]))


def ref_viterbi(tok, word):
    """Independent Viterbi over the tokenizer's log-probs (same
    tie-break spec: strictly-greater, lengths ascending)."""
    w = "▁" + word
    n = len(w)
    best = [_NEG] * (n + 1)
    best[0] = 0.0
    back = [None] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(tok.max_piece_len, i) + 1):
            piece = w[i - ln : i]
            v = tok.logp.get(piece)
            if v is None:
                if ln > 1:
                    continue
                v = tok.unk_lp
            if best[i - ln] + v > best[i]:
                best[i] = best[i - ln] + v
                back[i] = (i - ln, piece)
    pieces = []
    i = n
    while i > 0:
        j, piece = back[i]
        pieces.append(piece)
        i = j
    return pieces[::-1]


# -- tests -------------------------------------------------------------------


KNOBS = dict(vocab_size=120, seed_size=2000, max_piece_len=6)


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def trained(spark, docs):
    return train_unigram(docs, **KNOBS)


def test_train_matches_sequential_reference(spark, docs, trained):
    wf = word_frequencies(docs, "text", 20_000)
    want = ref_train(wf, **KNOBS)
    assert trained.pieces_counts == want


def test_train_partitioning_invariant(spark, docs, trained):
    tok2 = train_unigram(docs.repartition(13), **KNOBS)
    assert tok2.pieces_counts == trained.pieces_counts


def test_encode_matches_reference_viterbi(spark, docs, trained):
    words = [
        r.w for r in docs.select(
            F.explode(F.split("text", r"\s+")).alias("w")
        ).where(F.col("w") != "").distinct().orderBy("w").limit(60).collect()
    ]
    words += ["unseenQQQ", "x", "", "zzzzzzzzzzzzzzzzzzzz"]
    for w in words:
        if w == "":
            continue
        assert trained.encode_word(w) == ref_viterbi(trained, w), w


def test_encode_unknown_chars_fall_back_per_char(trained):
    toks = trained.encode_word("Ω7")
    assert toks[0] == "▁" or toks[0].startswith("▁")
    assert "Ω" in toks and "7" in toks
    assert trained.detokenize(trained.encode("a Ω7 b")) == "a Ω7 b"


def test_detokenize_inverse_whitespace_normalized(trained):
    s = "the   spark \t table"
    assert trained.detokenize(trained.encode(s)) == "the spark table"


def test_save_load_roundtrip_and_refusals(tmp_path, trained):
    p = str(tmp_path / "uni.json")
    trained.save(p)
    loaded = UnigramTokenizer.load(p)
    assert loaded.pieces_counts == trained.pieces_counts
    assert loaded.encode("spark table") == trained.encode("spark table")
    # foreign format refused
    bad = str(tmp_path / "bad.json")
    import json

    with open(bad, "w") as fh:
        json.dump({"format": "bpe-merges", "version": 1, "merges": []}, fh)
    with pytest.raises(ValueError, match="unigram-lm"):
        UnigramTokenizer.load(bad)
    # foreign scale refused (a build with a different fixed point would
    # silently reinterpret counts)
    obj = json.load(open(p))
    obj["scale"] = 1 << 10
    with open(bad, "w") as fh:
        json.dump(obj, fh)
    with pytest.raises(ValueError, match="scale"):
        UnigramTokenizer.load(bad)


def test_spec_rebuild_roundtrip(trained):
    re = rebuild_tokenizer(trained.spec())
    assert re.pieces_counts == trained.pieces_counts
    bpe = train_bpe_small()
    re2 = rebuild_tokenizer(bpe.spec())
    assert re2.merges == bpe.merges and re2.mode == bpe.mode
    with pytest.raises(ValueError, match="spec"):
        rebuild_tokenizer(("nope",))


def train_bpe_small():
    from kmeanwithmapreduce_spark.functions.bpe import BPETokenizer

    return BPETokenizer([("a", "b"), ("ab", "</w>")], "char")


def test_chunk_documents_accepts_unigram(spark, docs, trained):
    from kmeanwithmapreduce_spark.operators.cleaning import chunk_documents

    ch = chunk_documents(
        docs.limit(40), seq_len=16, stride=12, tokenizer=trained
    ).collect()
    assert len(ch) > 0
    by_doc: dict = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    src = {r.doc_id: r.text for r in docs.limit(40).collect()}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        toks = trained.encode(src[doc_id])
        # stride/window accounting in unigram tokens
        assert rows[0].n_tokens == min(16, len(toks))
        assert len(rows) == (len(toks) - 1) // 12 + 1
        # every full window's text re-encodes to its own token count
        # only when cut at word boundaries; at minimum the detokenized
        # first window is a prefix of the document's normalized text
        norm = " ".join(src[doc_id].split())
        assert norm.startswith(rows[0].chunk_text[: len(rows[0].chunk_text) // 2])


def test_token_budget_sample_accepts_unigram(spark, docs, trained):
    from kmeanwithmapreduce_spark.operators.cleaning import (
        token_budget_sample,
    )

    out = token_budget_sample(
        docs.limit(100), budget=800, tokenizer=trained
    ).collect()
    assert out and all(r.cum_tokens <= 800 for r in out)
    counted = {
        r.doc_id: r.n_tokens
        for r in trained.count_col(
            docs.limit(100).select("doc_id", "text"), "text", "n_tokens"
        ).collect()
    }
    for r in out:
        assert r.n_tokens == counted[r.doc_id]


def test_loss_ranked_prune_matches_sequential_reference(spark, docs, trained):
    """Round-12: the prune_by="loss" variant (Kudo §3.2's
    likelihood-loss ranking) must match the independently-written
    sequential reference extended with the same spec — and the default
    count-ranked training (the t14 golden surface) must be unchanged
    by the knob's existence."""
    from kmeanwithmapreduce_spark.functions.unigram import train_unigram as tu

    tok_loss = tu(docs, prune_by="loss", **KNOBS)
    wf = word_frequencies(docs, "text", 20_000)
    want = ref_train(wf, prune_by="loss", **KNOBS)
    assert tok_loss.pieces_counts == want
    # the variant really prunes differently on this corpus (otherwise
    # the test proves nothing) and stays partitioning-invariant
    assert tok_loss.pieces_counts != trained.pieces_counts
    tok_loss2 = tu(docs.repartition(13), prune_by="loss", **KNOBS)
    assert tok_loss2.pieces_counts == tok_loss.pieces_counts
    # default path untouched
    assert tu(docs, prune_by="count", **KNOBS).pieces_counts == trained.pieces_counts
    with pytest.raises(ValueError, match="prune_by"):
        tu(docs, prune_by="entropy", **KNOBS)
