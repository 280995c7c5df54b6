"""Unigram-LM subword tokenizer (SentencePiece-style): distributed EM
training + Arrow-batched Viterbi application.

Public-knowledge algorithm (Kudo, "Subword Regularization: Improving
Neural Network Translation Models with Multiple Subword Candidates",
ACL 2018 — the SentencePiece unigram model; Kudo & Richardson, EMNLP
2018 for the toolkit conventions, e.g. the U+2581 word-boundary
marker). No reference-file citation: the reference has no text
surface — this is the second subword family next to ``functions/
bpe.py``, giving every token-denominated operator (chunking, packing,
token-budget sampling) a ``tokenizer=`` choice between merge-table
BPE and likelihood-based unigram segmentation.

Model: a vocabulary of pieces with probabilities; a word's
segmentation is the piece sequence maximizing the sum of piece
log-probabilities (Viterbi). Training starts from a large seed of
candidate substrings and alternates EM (expected piece counts over
all segmentations, the forward-backward lattice pass) with pruning
(drop the lowest-probability pieces, never single characters) until
the vocabulary reaches ``vocab_size``. Two prune rankings
(``prune_by``): ``"count"`` (default) ranks by expected count — an
exact-integer ranking that keeps training a pure integer function of
the word table (the t14 golden surface); ``"loss"`` implements Kudo
§3.2's likelihood-loss ranking (expected count x the log-prob gap to
each piece's best alternative segmentation — see ``_prune_loss``).
Both shrink toward the same high-likelihood core; a parity test pins
the loss variant against an independent sequential reference.

Scale design (the bpe.py discipline, extended):

- **Training never moves the corpus to the driver.** The corpus
  reduces once to the same capped word-frequency table BPE uses
  (one map-side-combined groupBy + deterministic top-N).
- **Seed extraction is distributed and exact-integer**: all
  substrings of the marked word forms up to ``max_piece_len``
  explode JVM-side; occurrence-weighted counts are integer sums, so
  the (count DESC, piece ASC) top-``seed_size`` cut is a pure
  function of corpus content.
- **The E-step is distributed and partitioning-invariant**: each
  word's forward-backward pass runs on executors (mapInPandas, the
  current piece log-probs riding the closure); per-word expected
  counts round to FIXED-POINT integers (scale 2^20) BEFORE leaving
  the word, so the cross-word aggregation is an exact integer sum —
  order- and partitioning-independent (the c06 exact-arithmetic
  discipline; decimal(38,0) accumulation, no float summation across
  rows). The M-step on the driver is O(pieces).
- **Application is an Arrow-batched mapInPandas** Viterbi with the
  piece table in the closure and the bpe.BoundedCache word cache.

Determinism note: per-word float lattice math is fixed-order IEEE
arithmetic, identical on every executor of one build; the golden
registry rows assume one libm across driver and executors (the same
assumption the float-IDCT parity tests document).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from .bpe import BoundedCache, word_frequencies

# SentencePiece's word-boundary marker (U+2581 LOWER ONE EIGHTH BLOCK):
# every word trains/encodes as marker+word, so detokenize recovers word
# boundaries from the token stream alone.
_WB = "▁"

# fixed-point scale for expected counts: 2^20 ≈ 1e6 fractional
# precision — far below any EM-relevant signal, small enough that a
# per-word contribution (f * posterior * _SCALE) stays in int64 for
# word frequencies up to ~2^43
_SCALE = 1 << 20

# encode-time fallback log-prob for characters never seen in training:
# strictly below any real piece so it never outranks a covered path
_UNK_PENALTY = 10.0


def _mark(word: str) -> str:
    return _WB + word


def _neg_inf() -> float:
    return float("-inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == float("-inf"):
        return b
    if b == float("-inf"):
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _word_expected_counts(
    word: str, freq: int, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One marked word's expected piece counts (forward-backward over
    the segmentation lattice), scaled to fixed-point integers. Pure
    function of (word, freq, logp) — executors and any sequential
    reference compute bit-identical integers."""
    n = len(word)
    fwd = [_neg_inf()] * (n + 1)
    fwd[0] = 0.0
    for i in range(1, n + 1):
        acc = _neg_inf()
        for length in range(1, min(max_piece_len, i) + 1):
            lp = logp.get(word[i - length : i])
            if lp is not None:
                acc = _logsumexp2(acc, fwd[i - length] + lp)
        fwd[i] = acc
    bwd = [_neg_inf()] * (n + 1)
    bwd[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _neg_inf()
        for length in range(1, min(max_piece_len, n - i) + 1):
            lp = logp.get(word[i : i + length])
            if lp is not None:
                acc = _logsumexp2(acc, lp + bwd[i + length])
        bwd[i] = acc
    z = fwd[n]
    if z == float("-inf"):
        return {}  # uncoverable word (no char pieces): contributes nothing
    post: dict[str, float] = {}
    for i in range(n):
        for length in range(1, min(max_piece_len, n - i) + 1):
            piece = word[i : i + length]
            lp = logp.get(piece)
            if lp is None:
                continue
            p = math.exp(fwd[i] + lp + bwd[i + length] - z)
            post[piece] = post.get(piece, 0.0) + p
    out: dict[str, int] = {}
    for piece, p in post.items():
        c = int(round(p * freq * _SCALE))
        if c:
            out[piece] = c
    return out


def _to_logprobs(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    log_total = math.log(total)
    return {p: math.log(c) - log_total for p, c in counts.items()}


def _prune(counts: dict[str, int], target: int) -> dict[str, int]:
    """Keep the ``target`` highest-expected-count pieces (count DESC,
    piece ASC — fully deterministic), never dropping single
    characters (coverage guarantee)."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    keep = dict(chars)
    for p, c in multi[: max(0, target - len(chars))]:
        keep[p] = c
    return keep


def _best_alt_logp(
    piece: str, logp: dict[str, float], max_piece_len: int
) -> float:
    """Best log-probability of segmenting ``piece``'s own surface with
    every vocabulary piece EXCEPT itself — the re-segmentation its
    occurrences fall back to if it is pruned (Kudo §3.2's alternative
    path). Always finite: single characters are never pruned, so a
    char-by-char path exists."""
    n = len(piece)
    best = [_neg_inf()] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for length in range(1, min(max_piece_len, i) + 1):
            sub = piece[i - length : i]
            if sub == piece:
                continue
            lp = logp.get(sub)
            if lp is None:
                continue
            s = best[i - length] + lp
            if s > best[i]:
                best[i] = s
    return best[n]


def _prune_loss(
    counts: dict[str, int], target: int, max_piece_len: int
) -> dict[str, int]:
    """Kudo §3.2's LOSS-RANKED prune: rank each multi-char piece by
    the corpus-likelihood drop its removal costs — expected count x
    (logp(piece) - logp(best alternative segmentation of its surface))
    — and keep the ``target`` highest-loss pieces (loss DESC, piece
    ASC). Single characters always survive (coverage). Driver-side
    O(pieces x len x max_piece_len) — piece-table-sized, like the
    M-step. Ranking uses fixed-order float arithmetic (the same
    one-libm assumption the lattice math documents); the count-ranked
    ``_prune`` remains the default and the t14 golden surface."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    logp = _to_logprobs(counts)
    scored = []
    for p, c in counts.items():
        if len(p) == 1:
            continue
        loss = c * (logp[p] - _best_alt_logp(p, logp, max_piece_len))
        scored.append((p, c, loss))
    scored.sort(key=lambda t: (-t[2], t[0]))
    keep = dict(chars)
    for p, c, _loss in scored[: max(0, target - len(chars))]:
        keep[p] = c
    return keep


def _seed_candidates(
    docs_or_words, text_col: str, top_words: int, seed_size: int,
    max_piece_len: int, min_count: int,
) -> tuple[list[tuple[str, int]], dict[str, int]]:
    """(capped word table [marked], seed piece counts). Distributed
    substring explosion with exact integer occurrence-weighted counts;
    all single characters are kept regardless of count (coverage)."""
    word_freqs = word_frequencies(docs_or_words, text_col, top_words)
    words = [(_mark(w), int(f)) for w, f in word_freqs]
    spark = docs_or_words.sparkSession
    wdf = spark.createDataFrame(words, "w string, f long")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - s + 1),
                ),
                lambda ln: F.col("w").substr(s, ln),
            ),
        )
    )
    grouped = (
        wdf.select(F.explode(subs).alias("p"), "f")
        .groupBy("p")
        .agg(F.sum("f").alias("c"))
    )
    # bounded by the corpus ALPHABET (distinct codepoints: <= ~1.1M by
    # Unicode itself, a few thousand for real text), not by seed_size —
    # single characters are all kept for the coverage guarantee, so
    # this collect's bound is structural, unlike the limit() below
    chars = grouped.where(F.length("p") == 1).collect()
    multi = (
        grouped.where((F.length("p") > 1) & (F.col("c") >= min_count))
        .orderBy(F.col("c").desc(), F.col("p"))
        .limit(seed_size)
        .collect()
    )
    seed = {r["p"]: int(r["c"]) for r in chars}
    for r in multi:
        seed[r["p"]] = int(r["c"])
    return words, seed


def _em_step_distributed(
    spark, words_df: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """One distributed E-step: per-word forward-backward on executors,
    per-word fixed-point rounding, exact decimal(38,0) aggregation —
    the result is independent of partitioning."""
    import pandas as pd

    schema = StructType(
        [StructField("p", StringType()), StructField("c", LongType())]
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["w"], pdf["f"]):
                for piece, c in _word_expected_counts(
                    w, int(f), logp, max_piece_len
                ).items():
                    acc[piece] = acc.get(piece, 0) + c
            yield pd.DataFrame(
                {"p": list(acc.keys()), "c": list(acc.values())}
            )

    rows = (
        words_df.mapInPandas(gen, schema)
        .groupBy("p")
        .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("c"))
        .collect()
    )
    return {r["p"]: int(r["c"]) for r in rows}


class UnigramTokenizer:
    """Immutable piece table + Viterbi encoder. The canonical state is
    ``pieces_counts`` — [(piece, fixed-point expected count)] sorted
    (count DESC, piece ASC) — an exact-integer artifact, so save/load
    round-trips bit-for-bit and log-probs re-derive deterministically.
    Safe to ship to executors via ``spec()`` (plain data) and rebuild
    there."""

    def __init__(self, pieces_counts: Sequence[tuple[str, int]]):
        self.pieces_counts: list[tuple[str, int]] = sorted(
            ((p, int(c)) for p, c in pieces_counts),
            key=lambda pc: (-pc[1], pc[0]),
        )
        if not self.pieces_counts:
            raise ValueError("unigram tokenizer needs a non-empty vocabulary")
        self.logp = _to_logprobs(dict(self.pieces_counts))
        self.max_piece_len = max(len(p) for p, _ in self.pieces_counts)
        self.unk_lp = min(self.logp.values()) - _UNK_PENALTY

    # -- the duck-typed tokenizer protocol (shared with BPETokenizer) --

    def spec(self) -> tuple:
        return ("unigram", self.pieces_counts)

    def encode_word(self, word: str) -> list[str]:
        """Viterbi best segmentation of the MARKED word. Characters
        outside the vocabulary segment as themselves at ``unk_lp``.
        Ties keep the first-found path (shortest piece at each
        boundary) — fixed iteration order, fully deterministic."""
        w = _mark(word)
        n = len(w)
        logp = self.logp
        best = [float("-inf")] * (n + 1)
        back: list[tuple[int, str] | None] = [None] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for length in range(1, min(self.max_piece_len, i) + 1):
                piece = w[i - length : i]
                lp = logp.get(piece)
                if lp is None:
                    if length > 1:
                        continue
                    lp = self.unk_lp  # unknown char fallback
                s = best[i - length] + lp
                if s > best[i]:
                    best[i] = s
                    back[i] = (i - length, piece)
        out: list[str] = []
        i = n
        while i > 0:
            j, piece = back[i]
            out.append(piece)
            i = j
        out.reverse()
        return out

    def encode(self, text: str, cache: dict | None = None) -> list[str]:
        out: list[str] = []
        if not text:
            return out
        for w in text.split():
            if cache is not None:
                toks = cache.get(w)
                if toks is None:
                    toks = self.encode_word(w)
                    cache[w] = toks
            else:
                toks = self.encode_word(w)
            out.extend(toks)
        return out

    def count(self, text: str, cache: dict | None = None) -> int:
        return len(self.encode(text, cache))

    def detokenize(self, tokens: Iterable[str]) -> str:
        """Inverse of encode up to whitespace normalization: word
        boundaries are the U+2581 markers. A window cut mid-word
        yields the partial word — the chunking semantics shared with
        BPETokenizer.detokenize."""
        text = "".join(tokens)
        words = text.split(_WB)
        return " ".join(w for w in words if w != "")

    def count_col(
        self, df: DataFrame, text_col: str = "text", out_col: str = "n_tokens"
    ) -> DataFrame:
        return unigram_count_col(df, self, text_col, out_col)

    def tokens_col(
        self, df: DataFrame, text_col: str = "text",
        out_col: str = "uni_tokens",
    ) -> DataFrame:
        return unigram_tokens_col(df, self, text_col, out_col)

    # -- persistence ---------------------------------------------------

    def save(self, path: str) -> None:
        """Persist the piece table as JSON — exact integers, so the
        loaded tokenizer is bit-identical (the BPE save/load
        discipline)."""
        import json

        with open(path, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "format": "unigram-lm",
                    "version": 1,
                    "marker": _WB,
                    "scale": _SCALE,
                    "pieces": [[p, c] for p, c in self.pieces_counts],
                },
                fh,
                ensure_ascii=False,
            )

    @classmethod
    def load(cls, path: str) -> "UnigramTokenizer":
        import json

        with open(path, encoding="utf-8") as fh:
            obj = json.load(fh)
        if obj.get("format") != "unigram-lm" or obj.get("version") != 1:
            raise ValueError(f"{path}: not a v1 unigram-lm file")
        if obj.get("marker", _WB) != _WB or obj.get("scale", _SCALE) != _SCALE:
            raise ValueError(
                f"{path}: saved with marker/scale "
                f"({obj.get('marker')!r}, {obj.get('scale')!r}); this build "
                f"uses ({_WB!r}, {_SCALE}) — retrain/re-save with this build"
            )
        return cls([(p, int(c)) for p, c in obj["pieces"]])


def rebuild_tokenizer(spec: tuple):
    """Executor-side rebuild from a ``spec()`` tuple — the one dispatch
    point the tokenizer-generic operators (chunking, budget sampling)
    close over, so a new tokenizer family plugs in here once."""
    kind = spec[0]
    if kind == "unigram":
        return UnigramTokenizer(spec[1])
    if kind == "bpe":
        from .bpe import BPETokenizer

        return BPETokenizer(spec[1], spec[2])
    raise ValueError(f"unknown tokenizer spec kind {kind!r}")


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    top_words: int = 20_000,
    seed_size: int = 8192,
    max_piece_len: int = 8,
    shrink: float = 0.75,
    em_iters: int = 2,
    min_count: int = 2,
    prune_by: str = "count",
) -> UnigramTokenizer:
    """End-to-end training: corpus → capped word table (one Spark agg)
    → distributed seed extraction → alternating distributed EM and
    deterministic pruning until ``vocab_size``. Pure function of corpus
    content (partitioning-invariant by exact-integer aggregation).
    ``prune_by``: ``"count"`` (default — exact-integer ranking, the
    t14 golden surface) or ``"loss"`` (Kudo §3.2's likelihood-loss
    ranking; see _prune_loss)."""
    if not 0.0 < shrink < 1.0:
        raise ValueError("shrink must be in (0, 1)")
    if prune_by not in ("count", "loss"):
        raise ValueError(f"prune_by must be 'count' or 'loss', got {prune_by!r}")
    words, counts = _seed_candidates(
        docs, text_col, top_words, seed_size, max_piece_len, min_count
    )
    if not counts:
        raise ValueError("empty corpus: no seed pieces")
    spark = docs.sparkSession
    words_df = spark.createDataFrame(words, "w string, f long").cache()
    try:
        while True:
            for _ in range(em_iters):
                new = _em_step_distributed(
                    spark, words_df, _to_logprobs(counts), max_piece_len
                )
                # single characters survive at a floor of one
                # fixed-point unit (coverage must outlive rounding)
                for p in counts:
                    if len(p) == 1 and not new.get(p):
                        new[p] = 1
                counts = new
            if len(counts) <= vocab_size:
                break
            target = max(vocab_size, int(len(counts) * shrink))
            if prune_by == "loss":
                pruned = _prune_loss(counts, target, max_piece_len)
            else:
                pruned = _prune(counts, target)
            if len(pruned) == len(counts):
                break  # only chars left above vocab_size: cannot shrink
            counts = pruned
    finally:
        words_df.unpersist()
    return UnigramTokenizer(list(counts.items()))


def unigram_count_col(
    df: DataFrame,
    tokenizer: UnigramTokenizer,
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """Append the unigram token count of ``text_col`` — Arrow-batched
    mapInPandas, piece table in the closure, cross-batch word cache."""
    spec = tokenizer.spec()
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType())]
    )

    def gen(batches: Iterator) -> Iterator:
        tok = rebuild_tokenizer(spec)
        cache: dict = BoundedCache()
        for pdf in batches:
            pdf[out_col] = [
                tok.count(t, cache) if t is not None else 0
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def unigram_tokens_col(
    df: DataFrame,
    tokenizer: UnigramTokenizer,
    text_col: str = "text",
    out_col: str = "uni_tokens",
) -> DataFrame:
    """Append the full unigram piece array (array<string>)."""
    spec = tokenizer.spec()
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )

    def gen(batches: Iterator) -> Iterator:
        tok = rebuild_tokenizer(spec)
        cache: dict = BoundedCache()
        for pdf in batches:
            pdf[out_col] = [
                tok.encode(t, cache) if t is not None else []
                for t in pdf[text_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema)
