"""BPE subword tokenizer: training determinism, encode parity against
an independent sequential reference, and the tokenizer= knob re-basing
chunking / budget sampling / packing / mixture on subword counts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kmeanwithmapreduce_spark.functions import bpe as B
from kmeanwithmapreduce_spark.operators.cleaning import (
    chunk_documents,
    pack_sequences,
    token_budget_sample,
)
from kmeanwithmapreduce_spark.operators.curation import domain_mixture_sample
from kmeanwithmapreduce_spark.sources.readers import load_table


def _ref_encode(word: str, merges) -> list[str]:
    """INDEPENDENT reference: apply merges sequentially in training
    order (not greedy-by-rank). Equivalent because a merge at rank r
    only creates pairs ranked after r — the equivalence the encoder's
    docstring claims, exercised here by a genuinely different code
    path."""
    syms = list(word) + ["</w>"]
    for a, b in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def _ref_count(text: str, merges) -> int:
    return sum(len(_ref_encode(w, merges)) for w in text.split())


def test_train_merges_hand_example():
    """[("ab",4), ("abc",3)] — every merge and tie-break computed by
    hand: (a,b)=7 first; (ab,</w>)=4; then a 3-3 tie between (ab,c) and
    (c,</w>) resolved lexicographically to (ab,c); then (abc,</w>)."""
    merges = B.train_merges([("ab", 4), ("abc", 3)], n_merges=10)
    assert merges == [
        ("a", "b"),
        ("ab", "</w>"),
        ("ab", "c"),
        ("abc", "</w>"),
    ]


def test_train_merges_min_count_stops():
    merges = B.train_merges([("xy", 1)], n_merges=10, min_count=2)
    assert merges == []


def test_encoder_matches_sequential_reference():
    tok = B.BPETokenizer(B.train_merges([("ab", 4), ("abc", 3), ("bc", 2)], 6))
    for w in ("ab", "abc", "bc", "abcabc", "zzz", "a", ""):
        got = tok.encode_word(w) if w else tok.encode(w)
        want = _ref_encode(w, tok.merges) if w else []
        assert got == want, w


def test_detokenize_roundtrip():
    tok = B.BPETokenizer(B.train_merges([("ab", 4), ("abc", 3)], 6))
    text = "ab abc ab"
    assert tok.detokenize(tok.encode(text)) == text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def trained(docs):
    return B.train_bpe(docs, n_merges=60)


def test_training_partitioning_invariant(spark, docs, trained):
    """Merges are a pure function of corpus CONTENT: a hostile
    repartition (7 slices) and a coalesce(1) must train the identical
    merge table — the k01 _hash_order_init discipline."""
    assert B.train_bpe(docs.repartition(7), n_merges=60).merges == trained.merges
    assert B.train_bpe(docs.coalesce(1), n_merges=60).merges == trained.merges


def test_spark_counts_match_python_reference(spark, docs, trained):
    """Every document's Spark-side BPE count equals the independent
    sequential plain-Python reference — exact, all docs."""
    got = {
        r.doc_id: r.n
        for r in B.bpe_count_col(
            docs.select("doc_id", "text"), trained, "text", "n"
        ).collect()
    }
    local = docs.select("doc_id", "text").collect()
    assert len(got) == len(local)
    for r in local:
        assert got[r.doc_id] == _ref_count(r.text, trained.merges), r.doc_id


def test_bpe_counts_differ_from_whitespace(docs, trained):
    """The knob must matter: with 60 merges over this corpus, subword
    counts exceed whitespace counts (words are only partially merged)."""
    row = (
        B.bpe_count_col(docs.select("text"), trained, "text", "n_bpe")
        .agg(
            F.sum("n_bpe").alias("bpe"),
            F.sum(F.size(F.split(F.col("text"), " "))).alias("ws"),
        )
        .first()
    )
    assert row.bpe > row.ws


def test_chunk_documents_bpe_total_coverage(spark, docs, trained):
    """Disjoint chunking (stride == seq_len) over BPE tokens: per-doc
    chunk token counts must sum exactly to the doc's encode length, and
    every chunk's text must equal the detokenized window (checked
    against a driver-side re-encode on a sample)."""
    sample = docs.where(F.col("doc_id") < 50)
    ch = chunk_documents(
        sample, seq_len=32, stride=32, tokenizer=trained
    ).collect()
    by_doc: dict = {}
    for r in ch:
        by_doc.setdefault(r.doc_id, []).append(r)
    cache: dict = {}
    for r in sample.select("doc_id", "text").collect():
        toks = trained.encode(r.text, cache)
        rows = sorted(by_doc.get(r.doc_id, []), key=lambda x: x.chunk_idx)
        assert sum(x.n_tokens for x in rows) == len(toks), r.doc_id
        for x in rows:
            win = toks[x.chunk_idx * 32 : x.chunk_idx * 32 + 32]
            assert x.chunk_text == trained.detokenize(win)


def test_chunk_documents_bpe_overlap_counts(spark, docs, trained):
    """stride < seq_len: chunk count per doc is floor((T-1)/stride)+1
    with T = BPE token count — same shape law as the whitespace path."""
    sample = docs.where(F.col("doc_id") < 30)
    ch = (
        chunk_documents(sample, seq_len=48, stride=24, tokenizer=trained)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"))
        .collect()
    )
    counts = {
        r.doc_id: r.n
        for r in B.bpe_count_col(
            sample.select("doc_id", "text"), trained, "text", "n"
        ).collect()
    }
    for r in ch:
        t = counts[r.doc_id]
        assert r.n_chunks == (t - 1) // 24 + 1, r.doc_id


def test_token_budget_sample_bpe_matches_naive(spark, docs, trained):
    """Bucket-decomposed budget sampling over SUBWORD counts equals the
    naive single-ordering cumsum computed driver-side."""
    budget = 15_000
    got = sorted(
        (r.doc_id, r.n_tokens, r.cum_tokens)
        for r in token_budget_sample(
            docs, budget=budget, tokenizer=trained
        ).collect()
    )
    cache: dict = {}
    rows = [
        (
            hashlib.md5(str(r.doc_id).encode()).hexdigest(),
            r.doc_id,
            trained.count(r.text, cache),
        )
        for r in docs.select("doc_id", "text").collect()
    ]
    rows.sort()
    want, cum = [], 0
    for _h, did, n in rows:
        cum += n
        if cum > budget:
            break
        want.append((did, n, cum))
    assert got == sorted(want)


def test_pack_sequences_over_bpe_chunks(spark, docs, trained):
    """Packing BPE chunks: every pack's token sum respects the budget
    (singleton overflow chunks exempt by the documented rule)."""
    ch = chunk_documents(
        docs.where(F.col("doc_id") < 100),
        seq_len=32,
        stride=32,
        tokenizer=trained,
    )
    packed = pack_sequences(ch, budget=96, n_buckets=8).collect()
    per_pack: dict = {}
    for r in packed:
        per_pack.setdefault(r.pack_id, []).append(int(r.n_tokens))
    for pid, toks in per_pack.items():
        assert sum(toks) <= 96 or len(toks) == 1, pid


def test_domain_mixture_bpe_knob(spark, docs, trained):
    """Mixture keep-rule over subword totals: returned n_tokens are the
    BPE counts, and the kept set is deterministic across two runs."""
    w = {f"src{i}": 1 for i in range(20)}
    a = domain_mixture_sample(docs, w, tokenizer=trained)
    rows = a.collect()
    cache: dict = {}
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    for r in rows[:25]:
        assert r.n_tokens == trained.count(texts[r.doc_id], cache)
    b = sorted(map(tuple, domain_mixture_sample(docs, w, tokenizer=trained).collect()))
    assert sorted(map(tuple, rows)) == b


def test_tokenizer_save_load_roundtrip(tmp_path):
    """The persisted merge table reloads to an identical tokenizer —
    the train-once / tokenize-everywhere artifact, unicode included."""
    from kmeanwithmapreduce_spark.functions.bpe import BPETokenizer, train_merges

    wf = [("löw", 10), ("löwer", 6), ("日本語", 5), ("newest", 4), ("wider", 3)]
    tok = BPETokenizer(train_merges(wf, n_merges=12))
    p = str(tmp_path / "merges.json")
    tok.save(p)
    tok2 = BPETokenizer.load(p)
    assert tok2.merges == tok.merges
    for w in ("löwer", "日本語です", "unseen-word"):
        assert tok2.encode_word(w) == tok.encode_word(w)
    import json
    with open(str(tmp_path / "bad.json"), "w") as fh:
        json.dump({"format": "other"}, fh)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        BPETokenizer.load(str(tmp_path / "bad.json"))


# --------------------------------------------------------------------------
# byte mode (GPT-2 bytes->unicode alphabet) — round 8


def test_byte_mode_roundtrip_non_ascii_and_emoji():
    corpus = [
        ("héllo wörld 🙂🙂", 5),
        ("日本語 テスト", 4),
        ("mixed ascii héllo", 3),
    ]
    wf = [(w, c) for text, c in corpus for w in text.split()]
    tok = B.BPETokenizer(B.train_merges(wf, 64, mode="byte"), "byte")
    for text, _ in corpus:
        assert tok.detokenize(tok.encode(text)) == text
    # inputs NEVER seen in training — including codepoints outside the
    # training alphabet — still tokenize (no UNK) and round-trip
    for novel in ("straße", "здравствуй мир", "🚀 launch", "a b"):
        toks = tok.encode(novel)
        assert toks
        assert tok.detokenize(toks) == " ".join(novel.split())


def test_byte_mode_vocabulary_is_closed():
    """Every symbol an encode can ever emit decomposes into the 256-char
    byte alphabet + EOW — char mode's alphabet instead grows with novel
    input characters."""
    wf = [("abc", 9), ("abd", 5)]
    tok = B.BPETokenizer(B.train_merges(wf, 8, mode="byte"), "byte")
    alphabet = set(B._BYTE_TO_UNI.values()) | {B._EOW_BYTE}
    for novel in ("xyz", "日本", "🙂"):
        for sym in tok.encode(novel):
            assert set(sym) <= alphabet, sym

    ctok = B.BPETokenizer(B.train_merges(wf, 8, mode="char"), "char")
    assert any(
        set(sym) - alphabet - {B._EOW}
        for sym in ctok.encode("日本")
        if sym != B._EOW
    )


def test_byte_mode_encoder_matches_sequential_reference():
    """The greedy lowest-rank encoder == sequential merge application,
    in byte mode too (same argument as char mode: a rank-r merge only
    creates pairs ranked after r)."""
    wf = [("héllo", 7), ("hellö", 5), ("hello", 4), ("🙂🙂", 3)]
    merges = B.train_merges(wf, 32, mode="byte")
    tok = B.BPETokenizer(merges, "byte")

    def seq_encode(word):
        syms = B._word_symbols(word, "byte")
        for a, b in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        return syms

    for w in ("héllo", "hellö", "hello", "🙂🙂", "unseen", "héllö"):
        assert tok.encode_word(w) == seq_encode(w), w


def test_byte_mode_save_load_and_legacy_files(tmp_path):
    import json

    wf = [("naïve", 6), ("naive", 4)]
    tok = B.BPETokenizer(B.train_merges(wf, 16, mode="byte"), "byte")
    p = str(tmp_path / "tok.json")
    tok.save(p)
    loaded = B.BPETokenizer.load(p)
    assert loaded.mode == "byte" and loaded.merges == tok.merges
    assert loaded.encode("naïve") == tok.encode("naïve")

    # a pre-byte-mode file (neither "mode" nor "eow" keys) loads as char
    obj = json.load(open(p))
    del obj["mode"], obj["eow"]
    p2 = str(tmp_path / "legacy.json")
    json.dump(obj, open(p2, "w"))
    assert B.BPETokenizer.load(p2).mode == "char"

    # a byte-mode file saved with a DIFFERENT sentinel is refused loudly
    # (its EOW merges would silently never fire under this build)
    obj = json.load(open(p))
    obj["eow"] = "</w>"
    p3 = str(tmp_path / "stale.json")
    json.dump(obj, open(p3, "w"))
    with pytest.raises(ValueError, match="sentinel"):
        B.BPETokenizer.load(p3)


def test_byte_mode_spark_apply_and_chunking(spark):
    """The mapInPandas apply paths carry the mode into the executor-side
    rebuild: counts and chunk texts must match driver-side byte-mode
    encoding."""
    rows = [(1, "héllo wörld héllo"), (2, "🙂 日本語 テスト 🙂")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    tok = B.train_bpe(docs, n_merges=32, min_count=1, mode="byte")
    assert tok.mode == "byte"
    got = {r.doc_id: r.n_tokens for r in B.bpe_count_col(docs, tok).collect()}
    want = {i: len(tok.encode(t)) for i, t in rows}
    assert got == want
    chunks = chunk_documents(docs, seq_len=4, stride=4, tokenizer=tok).collect()
    for c in chunks:
        toks = tok.encode(dict(rows)[c.doc_id])
        win = toks[c.chunk_idx * 4 : c.chunk_idx * 4 + 4]
        assert c.chunk_text == tok.detokenize(win)


def test_byte_mode_roundtrips_literal_eow_marker_text():
    """Byte mode's sentinel is a private-use codepoint no byte maps to,
    so text containing a literal "</w>" round-trips exactly — the
    char-mode sentinel collision (documented limitation there) is
    structurally impossible in byte mode."""
    wf = [("a</w>b", 3), ("plain", 2)]
    tok = B.BPETokenizer(B.train_merges(wf, 16, mode="byte"), "byte")
    for text in ("a</w>b", "x </w> y", "</w></w>"):
        assert tok.detokenize(tok.encode(text)) == " ".join(text.split())
