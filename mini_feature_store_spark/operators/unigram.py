"""Unigram-LM (SentencePiece-style) subword tokenizer — the alternative
induction algorithm to BPE (Kudo 2018, "Subword Regularization"; the
SentencePiece library's default). Where BPE GROWS a vocabulary by
merging pairs, unigram-LM SHRINKS one: seed a large candidate piece set
from corpus substrings, score pieces, keep the best V, and segment text
by the highest-scoring piece decomposition (Viterbi).

This implementation is the DETERMINISTIC INTEGER-SCORED variant:

- **Seed** — every substring of length ≤ ``max_piece_len`` of the
  distinct-chunk word table (the same one corpus pass / Heaps'-law
  separation as ``bpe.py``), frequency-weighted; keep the top
  ``vocab_size`` by (freq DESC, piece ASC) plus ALL single characters
  (segmentation closure — every word stays representable).
- **Refine** (``refine_rounds``, the EM-shaped step) — segment the
  word table with the current vocabulary, count each piece's actual
  USAGE (Σ word-freq × occurrences in the word's best segmentation),
  re-select top-V by usage. Kudo's M-step re-estimates float
  probabilities; usage counts are the integer sufficient statistic of
  that step, and staying in exact integers is what lets a DuckDB
  oracle replay training bit-identically (float EM would be
  engine-divergent at the argmax boundaries).
- **Segment** (Viterbi) — per word, the decomposition minimizing
  ``(piece_count, -Σ piece_freq, space-joined-pieces)``: fewest pieces
  first (what a converged unigram LM prefers — longer pieces carry
  more probability mass than their parts under any subadditive score),
  then highest total frequency, then a lexicographic key so the argmin
  is a TOTAL order — every comparison integer/string-exact, engine
  portable. Characters unseen at training segment as themselves with
  frequency 0 (the vocabulary-closure fallback).

Scale shape, mirroring ``bpe.py``: ONE corpus pass to the word table;
seeding and refinement run on the distinct-chunk table (vocabulary
scale), never the corpus. The Viterbi DP is O(len · max_piece_len) per
DISTINCT word, executed as an Arrow ``mapInPandas`` over the word set
with the vocabulary shipped by broadcast (``bpe.py:map_word_syms`` —
the packer pattern); tokenization joins segmentations back to chunk
positions, so the corpus is never shuffled by piece.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_feature_store_spark.operators.bpe import (
    _chunk_positions,
    _reassemble,
    map_word_syms,
    word_table,
)

#: piece-table schema of a trained vocabulary
PIECES_SCHEMA = "piece string, freq long"


def _pieces_from_words(words: DataFrame, max_piece_len: int) -> DataFrame:
    """Substring explode of a ``(word, freq)`` table → ``(piece, freq)``."""
    w = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda ln: w.substr(i, ln),
            ),
        )
    )
    return (
        words.select("freq", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("freq"))
    )


def piece_table(
    df: DataFrame, max_piece_len: int = 4, text_col: str = "text"
) -> DataFrame:
    """Seed candidate table: every substring of length ≤ ``max_piece_len``
    of every distinct corpus chunk, weighted by chunk frequency —
    ``(piece, freq)``. One corpus pass (via ``word_table``), then a
    substring explode on the DISTINCT-chunk table only."""
    words = word_table(df, text_col).select("word", "freq")
    return _pieces_from_words(words, max_piece_len)


def _segment_word(
    word: str, freq_of: dict[str, int], max_piece_len: int
) -> list[str]:
    """Viterbi segmentation under the integer score (see module
    docstring): dp over prefix lengths, each state carrying
    ``(piece_count, -freq_sum, key, pieces)`` with ``key`` the
    space-joined piece string — the deterministic total-order
    tie-break an oracle can replay (pieces never contain whitespace,
    so the key identifies the sequence)."""
    n = len(word)
    dp: list[tuple[int, int, str, tuple[str, ...]] | None] = [None] * (n + 1)
    dp[0] = (0, 0, "", ())
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_piece_len), i):
            prev = dp[j]
            if prev is None:
                continue
            piece = word[j:i]
            f = freq_of.get(piece)
            if f is None:
                if i - j != 1:
                    continue
                f = 0  # unseen single char: closure fallback
            key = piece if not prev[2] else prev[2] + " " + piece
            cand = (prev[0] + 1, prev[1] - f, key, prev[3] + (piece,))
            if best is None or cand[:3] < best[:3]:
                best = cand
        dp[i] = best
    final = dp[n]
    assert final is not None  # single-char fallback keeps dp total
    return list(final[3])


def _with_segmented_syms(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Attach each word's Viterbi segmentation as ``syms`` — vocabulary
    collected driver-side (bounded: vocab_size + alphabet rows, the
    IVF-centroid class) and shipped once per executor by broadcast.
    The DP window is DERIVED from the vocabulary (its longest piece),
    so a tokenize call can never silently under-window a vocabulary
    trained with a larger ``max_piece_len`` — candidates longer than
    any vocab piece are unmatchable anyway, so the derived window is
    exactly equivalent to the training one."""
    freq_of = {
        r["piece"]: int(r["freq"])
        for r in vocab.select("piece", "freq").collect()
    }
    window = max((len(p) for p in freq_of), default=1)
    bc = words.sparkSession.sparkContext.broadcast(freq_of)

    def factory():
        fo = bc.value
        return lambda w: _segment_word(w, fo, window)

    return map_word_syms(words, factory)


def unigram_train(
    df: DataFrame,
    vocab_size: int = 64,
    max_piece_len: int = 4,
    refine_rounds: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """Train a unigram-LM piece vocabulary: seed + select, then
    ``refine_rounds`` usage-re-estimation rounds (the integer EM step).
    Returns ``(piece, freq)`` — ``freq`` is the substring frequency
    after seeding, the segmentation USAGE after refinement. Single
    characters are always retained (closure), with usage 0 when the
    refined segmentation never uses them standalone. The result is a
    small driver-built frame (bounded by construction: vocab_size +
    alphabet rows — the ``bpe_train`` merge-table contract, ``limit``
    so the plan walker sees it bounded); consumers re-evaluate it for
    free instead of re-running a corpus pass per use."""
    if vocab_size <= 0:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    if max_piece_len <= 0:
        raise ValueError(
            f"max_piece_len must be positive, got {max_piece_len}"
        )
    if refine_rounds < 0:
        raise ValueError(
            f"refine_rounds must be non-negative, got {refine_rounds}"
        )
    # the ONE corpus pass; persisted when refinement re-reads it (the
    # bpe_train cache contract — released before returning)
    words = word_table(df, text_col).select("word", "freq")
    if refine_rounds > 0:
        words = words.persist()
    try:
        pieces = _pieces_from_words(words, max_piece_len)
        chars = pieces.where(F.length("piece") == 1)
        top = pieces.orderBy(F.col("freq").desc(), "piece").limit(vocab_size)
        # a char inside the top-V appears in both branches with the same
        # (piece, freq) row — distinct() is exact dedup, never a choice
        vocab = top.unionByName(chars).distinct()

        for _ in range(refine_rounds):
            seg = _with_segmented_syms(words, vocab)
            usage = (
                seg.select("freq", F.explode("syms").alias("piece"))
                .groupBy("piece")
                .agg(F.sum("freq").alias("freq"))
            )
            top = usage.orderBy(
                F.col("freq").desc(), "piece"
            ).limit(vocab_size)
            chars_usage = chars.select("piece").join(
                usage, "piece", "left"
            ).select(
                "piece",
                F.coalesce(F.col("freq"), F.lit(0))
                .cast("long")
                .alias("freq"),
            )
            vocab = top.unionByName(chars_usage).distinct()
        rows = [
            (r["piece"], int(r["freq"]))
            for r in vocab.select("piece", "freq").collect()
        ]
    finally:
        if refine_rounds > 0:
            words.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(rows, PIECES_SCHEMA).limit(len(rows) or 1)


def unigram_tokenize(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained piece vocabulary — identical
    output contract to ``bpe.py:bpe_tokenize``:
    ``(id_col, n_tokens, tokens)``. Chunk the text, Viterbi-segment the
    DISTINCT chunk set (cost per distinct word, never per occurrence;
    DP window derived from the vocabulary's longest piece), join back
    to chunk positions, reassemble in document order."""
    chunks = _chunk_positions(df, text_col, id_col)
    distinct_words = chunks.select("word").distinct()
    seg = _with_segmented_syms(distinct_words, vocab)
    joined = chunks.join(seg, "word").select(F.col(id_col), "pos", "syms")
    return _reassemble(joined, id_col)
