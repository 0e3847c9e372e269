"""Deduplication operators for training-data pipelines (prompt north star).

Five tiers, all shuffle-architected for 100 TB:

- ``exact_dedup``          hash-groupBy on normalized-text fingerprint; one
                           shuffle keyed by a 128-bit digest — no skew beyond
                           true duplicate groups.
- ``ngram_jaccard_pairs``  exact near-dup pairs via a shingle inverted index:
                           explode shingles → self-join on shingle → count
                           common → Jaccard. Sparse — only docs *sharing* a
                           shingle ever meet, so cost tracks true similarity
                           mass, not |docs|². Hot shingles are capped
                           (``max_shingle_freq``) the way production dedup
                           pipelines drop stop-shingles.
- ``minhash_lsh_pairs``    MinHash signatures + banded LSH: candidate pairs
                           only for band-bucket collisions; the 100 TB path
                           where even the sparse exact join is too big.
- ``simhash``              64-bit SimHash per doc + Hamming-bucket candidate
                           pairing.
- ``embedding_cosine_pairs`` near-dup by embedding cosine (in similarity.py).

MinHash/SimHash use xxhash64 with per-permutation seeds — JVM built-ins,
codegen'd, deterministic across runs; validated in tests against the exact
Jaccard operator (statistical recall, not value equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_feature_store_spark.functions import (
    round_half_up,
    spread,
    track_cache,
)
from mini_feature_store_spark.operators.text import _tokens, normalize


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group exact duplicates (normalized text) and keep the smallest id.

    Returns one row per distinct content: ``(keep_id, n_dupes, fingerprint)``.
    """
    return (
        df.select(F.col(id_col), F.md5(normalize(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("keep_id", "n_dupes", "fingerprint")
    )


def shingles(text, n: int = 3):
    """Word n-gram shingle array of a text column (distinct shingles).

    One codegen'd regex pass over the normalized (single-spaced) text: the
    lookahead captures the n-gram starting at a token boundary while the
    consumed part advances exactly one token, so ``find()`` visits each
    token start once. The earlier formulation — ``transform(sequence(...),
    i -> concat_ws(" ", slice(toks, i, n)))`` — is an interpreted
    higher-order-function chain (CodegenFallback) and measured ~100× slower
    per document; with 100 TB of documents the hot projection must stay
    inside whole-stage codegen.
    """
    norm = normalize(text)
    toks = _tokens(norm)
    gram = r"(?=((?:\S+ ){%d}\S+))(?:\S+ ?)" % (n - 1)
    return F.when(F.size(toks) < n, F.array(norm)).otherwise(
        F.array_distinct(F.regexp_extract_all(norm, F.lit(gram), 1))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact Jaccard-similar pairs (a < b) over word n-gram shingle sets.

    Plan: doc→shingle explode, self-join on shingle (inverted index), count
    common shingles per pair, Jaccard = common / (|A| + |B| − common).

    ``max_shingle_freq`` (default ON — the guard must not be opt-in at scale)
    drops shingles appearing in more than that many docs: stop-shingles
    produce quadratic candidate blowup (one shingle in k docs → k²/2 join
    rows) while carrying no discriminative signal. Jaccard is then computed
    over the *retained* shingle sets — per-doc sizes count post-filter — so
    the output stays a true Jaccard of well-defined sets and an oracle can
    mirror it exactly. ``None`` disables (exact full-set Jaccard; unsafe on
    open-domain corpora).

    Plan (ONE wide shuffle): explode doc→shingle with the doc's PRE-filter
    set size riding along in a struct, then a single
    ``groupBy(shingle).agg(collect_list(struct(id, psize)))`` builds the
    posting lists. The stop-shingle guard is a free length filter on the
    list (posting length IS the document frequency — per-doc shingles are
    distinct); candidate pairs come from a double Generate over each
    sorted list (posexplode × slice) — no self-join of the index, no
    document-frequency pass, and no per-doc sizes pass either: each pair
    already carries both docs' pre-filter sizes, and the post-filter size
    is recovered as ``psize − (# hot shingles in the doc)``, computed from
    the >cap postings alone (normally empty; at most |index|/cap rows).
    (The previous form — repartition+persist the exploded index, a hot-set
    aggregate job, an index self-join, and a third sizes pass — had the
    same O() but 5 wide stages; measured 6.7× slower at sf0.1.)

    Memory note for 100 TB: the final aggregation buffer of a single
    mega-hot shingle is O(its document frequency) before the length filter
    drops it (ObjectHashAggregate falls back to sort-based aggregation, so
    it is one group's list at a time, not the whole map). With zipfian text
    corpora and the default cap this is the right trade — one shuffle saved
    on every run vs a bounded transient buffer on the few stop-shingles.
    """
    sh = (
        spread(df)
        .select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
        .select("id", F.size("sh").alias("psize"), F.explode("sh").alias("shingle"))
        # Group on the 64-bit shingle hash, not the string: the posting
        # shuffle carries 8 bytes of key per row instead of the shingle
        # text. A false-positive pair needs an intra-corpus xxhash64
        # collision (~n_shingles²/2⁶⁵ — negligible even at 100 TB, and it
        # would only perturb one pair's common-count by 1).
        .select(
            F.xxhash64("shingle").alias("shingle"),
            F.struct("id", "psize").alias("doc"),
        )
    )
    posting = sh.groupBy("shingle").agg(F.collect_list("doc").alias("docs"))

    if max_shingle_freq is not None:
        # Two consumers (retained → pairs, hot → size corrections): persist
        # so the shingling regex pass + the one wide shuffle run once. The
        # postings are the compact form of the inverted index — at 100 TB
        # this is the artifact you'd materialize.
        posting = track_cache(posting.persist())
        retained = posting.where(F.size("docs") <= max_shingle_freq)
        hot_cnt = (
            posting.where(F.size("docs") > max_shingle_freq)
            .select(F.explode("docs").alias("d"))
            .groupBy(F.col("d.id").alias("id"))
            .agg(F.count(F.lit(1)).alias("hot"))
        )
    else:
        retained, hot_cnt = posting, None

    # Pairs from each posting list: array_sort on the structs orders by id
    # (first field), so id_a < id_b by construction; posexplode the anchor,
    # explode the tail slice. Both Generates stay in codegen; lists of
    # length 1 (the vast majority of shingles) generate nothing.
    pairs = (
        retained.where(F.size("docs") >= 2)
        .select(F.array_sort("docs").alias("docs"))
        .select(F.posexplode("docs").alias("pos", "a"), "docs")
        .select("a", F.explode(F.expr("slice(docs, pos + 2, size(docs))")).alias("b"))
    )
    # psize is functionally dependent on id, so widening the grouping key
    # costs nothing and saves the sizes join entirely.
    common = pairs.groupBy(
        F.col("a.id").alias("id_a"),
        F.col("a.psize").alias("psize_a"),
        F.col("b.id").alias("id_b"),
        F.col("b.psize").alias("psize_b"),
    ).agg(F.count(F.lit(1)).alias("common"))

    if hot_cnt is not None:
        # Hot-shingle corrections join onto the aggregated pairs (sparse).
        # hot_cnt is keyed by DOC id (docs containing a >max_shingle_freq
        # shingle) and under a Zipfian shingle distribution most docs hit
        # the hottest shingles, so it is O(corpus) — no hard broadcast
        # hint; AQE promotes it while it fits (r6 VERDICT #1).
        common = common.join(
            hot_cnt.select(F.col("id").alias("id_a"), F.col("hot").alias("hot_a")),
            "id_a",
            "left",
        ).join(
            hot_cnt.select(F.col("id").alias("id_b"), F.col("hot").alias("hot_b")),
            "id_b",
            "left",
        )
        size_a = F.col("psize_a") - F.coalesce(F.col("hot_a"), F.lit(0))
        size_b = F.col("psize_b") - F.coalesce(F.col("hot_b"), F.lit(0))
    else:
        size_a, size_b = F.col("psize_a"), F.col("psize_b")

    jac = F.col("common") / (size_a + size_b - F.col("common"))
    return (
        common.select(
            "id_a",
            "id_b",
            round_half_up(jac).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: for permutation i, min over shingles of
    xxhash64(shingle, seed=i). Pure JVM expressions → codegen, no UDF.

    Shape: explode shingles once, then ONE hash-aggregate with
    ``num_hashes`` min() columns — every hash+min stays in whole-stage
    codegen with map-side partial aggregation, and the only shuffle is the
    per-doc combine. (The per-row ``array_min(transform(...))`` form is an
    interpreted HOF chain — ~20× slower per doc.)"""
    sh = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    )
    # SQL-string expressions: one JVM-side parse instead of ~190 py4j round
    # trips per plan build (see simhash note above).
    per_doc = sh.groupBy("id").agg(
        *[
            F.expr(f"min(xxhash64(shingle, {i})) AS h{i}")
            for i in range(num_hashes)
        ]
    )
    arr = ", ".join(f"h{i}" for i in range(num_hashes))
    return per_doc.selectExpr("id", f"array({arr}) AS sig")


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH, scored by estimated
    Jaccard (signature agreement rate), filtered at ``threshold``.

    rows per band-bucket meet — candidate generation is a shuffle on
    (band, bucket-hash), never an all-pairs product. With r = hashes/bands
    rows per band, collision probability is the classic s-curve
    1 − (1 − s^r)^bands.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # Read 3× (banding + two candidate-pair joins); signatures are ~512 B/doc
    # vs the raw text they derive from — persist the small thing.
    sigs = track_cache(
        minhash_signatures(df, num_hashes, n, text_col, id_col).persist()
    )

    # Band join carries only (id, band, bucket) — 24 bytes/row — through the
    # candidate shuffle; the 512-byte signatures are joined back onto the
    # (much smaller) deduplicated candidate-pair set afterwards.
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")

    a, b = banded.alias("a"), banded.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        cand_ids.join(
            sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(num_hashes)
    )
    return cand.select(
        "id_a", "id_b", round_half_up(est).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def simhash(
    df: DataFrame,
    bits: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf_weighted: bool = False,
    max_weight: int = 15,
) -> DataFrame:
    """64-bit SimHash per document over whitespace tokens.

    Bit b of the hash is 1 iff Σ_tokens w(tok)·sign(bit b of
    xxhash64(token)) > 0 — classic (Charikar) simhash with per-feature
    weights. Default ``idf_weighted=False`` uses unit weights; the ±1 sum
    is algebraically 2·ones_b − n, so the aggregate only needs per-bit
    ones-counts plus one count. Those 64 counts are accumulated in
    **packed 16-bit lanes**: ``(h >> g) & 0x0001000100010001`` isolates bits
    g, g+16, g+32, g+48 into four independent 16-bit lanes of one long, so
    16 packed sums replace 64 scalar sums. Besides 4× less aggregate work,
    the smaller expression tree stays inside whole-stage codegen (65
    aggregate buffers overflows the JIT method budget and falls back to
    interpreted eval — measured ~4× slower). Single shuffle keyed by doc id.

    ``idf_weighted=True`` weights every token occurrence by a quantized
    idf, ``w = min(max_weight, max(0, ⌊2·ln((N+1)/(df+1))⌋))`` with N the
    corpus document count and df the token's document frequency — computed
    from the corpus itself (one distinct + one hash aggregate over the
    token stream; N rides along as a broadcast 1-row aggregate, so
    plan-build stays job-free). Why this matters: on Zipfian vocabularies
    the head words dominate every document's unweighted majority vote, so
    the hamming ≤ 3 ball around a signature genuinely contains a quadratic
    pair mass (measured 100× pairs at 10× data, SCALING.md); idf weighting
    zeroes the head (df ≈ N ⇒ w = 0) and restores discrimination. A doc
    whose every token has weight 0 (pure stop-word content) gets simhash 0
    — such docs carry no distinguishing signal by construction. The same
    packed lanes accumulate weighted counts (each token contributes
    w ≤ 15 per lane), and the bit rule becomes 2·Σ_{bit set} w > Σ w.

    Lane capacity bounds docs at 32767 tokens (Σw ≤ 32767 when weighted —
    signed-long headroom of the top lane under ANSI sum) — enforced with an
    explicit ``raise_error`` for the 32768..65535 band; fine for near-dup
    corpora, which shingle or truncate long docs anyway.
    """
    if bits != 64:
        raise ValueError("packed-lane simhash supports bits=64 only")
    base = spread(df).select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(normalize(F.col(text_col)))).alias("tok"),
    )
    # Expressions are assembled as SQL strings parsed ONCE on the JVM:
    # building this ~380-node tree through the Column API costs hundreds of
    # py4j round trips per plan construction (measured ~1 s of driver time
    # per call — pure fixed overhead that would also dog every job
    # submission on a real cluster).
    lane_mask = 0x0001000100010001
    if idf_weighted:
        # the tokenize/normalize/explode pass feeds BOTH the df-frequency
        # aggregate and the weighting join — persist so the regex scan
        # over the corpus runs once (same rule as the posting-list index)
        base = track_cache(base.persist())
        dfreq = base.distinct().groupBy("tok").agg(F.expr("count(1) AS df_t"))
        n_docs = df.select(
            F.count(F.lit(1)).cast("long").alias("n_docs")
        )
        toks = (
            base.join(dfreq, "tok")
            .crossJoin(F.broadcast(n_docs))
            .selectExpr(
                "id",
                "xxhash64(tok) AS h",
                f"least({max_weight}L, greatest(0L, cast(floor("
                "2.0 * ln((n_docs + 1) / (df_t + 1))) AS BIGINT))) AS w",
            )
        )
        sums = [
            F.expr(f"sum((shiftright(h, {g}) & {lane_mask}L) * w) AS g{g}")
            for g in range(16)
        ]
        total = F.expr("sum(w) AS n")
    else:
        toks = base.select("id", F.xxhash64("tok").alias("h"))
        sums = [
            F.expr(f"sum(shiftright(h, {g}) & {lane_mask}L) AS g{g}")
            for g in range(16)
        ]
        total = F.expr("count(1) AS n")
    per_doc = toks.groupBy("id").agg(*sums, total)
    per_doc = per_doc.withColumn(
        "n",
        F.expr(
            "CASE WHEN n < 32768 THEN n ELSE CAST(raise_error('simhash: doc "
            "exceeds 32767 tokens; lane packing would overflow — truncate "
            "or shingle first') AS BIGINT) END"
        ),
    )
    terms = []
    for b in range(bits):
        # ones_b sits in lane b//16 of packed sum g{b%16};
        # sign(2·ones − n) > 0  ⟺  the original ±1-sum formulation.
        ones = f"(shiftrightunsigned(g{b % 16}, {16 * (b // 16)}) & 65535L)"
        terms.append(
            f"(CASE WHEN {ones} * 2 > n THEN shiftleft(1L, {b}) ELSE 0L END)"
        )
    return per_doc.selectExpr("id", "(" + " ^ ".join(terms) + ") AS simhash")


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    blocks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf_weighted: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: split the 64-bit hash into ``blocks`` chunks; any
    pair within distance ``max_hamming`` (< blocks) agrees on ≥1 full chunk,
    so candidates are equi-join matches on (block index, chunk value) — a
    shuffle join, never all-pairs. Exact Hamming check afterwards.

    ``idf_weighted=True`` is the recommended setting on Zipfian (i.e. any
    natural-language) corpora: unit-weight simhash lets head words dominate
    the majority vote and the hamming ball goes quadratic (SCALING.md); idf
    weights restore discrimination at the cost of one distinct + one
    aggregate over the token stream.
    """
    if max_hamming >= blocks:
        raise ValueError("need max_hamming < blocks for pigeonhole guarantee")
    # 8 bytes/doc, read by both self-join sides — persist, don't re-derive.
    sims = track_cache(
        simhash(df, bits, text_col, id_col, idf_weighted=idf_weighted).persist()
    )
    return hamming_blocked_pairs(sims, max_hamming, bits, blocks)


def hamming_blocked_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    bits: int = 64,
    blocks: int = 4,
    hash_col: str = "simhash",
    id_col: str = "id",
) -> DataFrame:
    """All pairs (id_a < id_b) within Hamming distance ``max_hamming`` of
    any 64-bit-hash relation — the reusable pigeonhole core of
    ``simhash_pairs``, also used for perceptual image hashes
    (operators/multimodal.py:image_phash_pairs).

    Split the hash into ``blocks`` chunks; a pair within distance
    ``max_hamming`` (< blocks) agrees on ≥ 1 full chunk, so candidates are
    equi-join matches on (block index, chunk value) — never all-pairs —
    with the exact Hamming check afterwards. Output: (id_a, id_b, hamming).
    """
    if max_hamming >= blocks:
        raise ValueError("need max_hamming < blocks for pigeonhole guarantee")
    sims = hashes.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("simhash")
    )
    width = bits // blocks
    mask = (1 << width) - 1
    chunked = sims.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select("id", "simhash", "bc.blk", "bc.chunk")

    a, b = chunked.alias("a"), chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("h_a"),
            F.col("b.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


def ngram_jaccard_against(
    new: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """INCREMENTAL near-dup: Jaccard pairs between a NEW batch and an
    EXISTING corpus only — never corpus×corpus. The steady-state ingest
    shape: each arriving batch checks against what's already admitted, so
    per-batch cost is |batch's inverted index| joined against the corpus
    index, not a quadratic re-self-join of everything. Output: one row per
    (new_id, corpus_id) pair with Jaccard ≥ threshold — anti-join the batch
    against ``select(new_id)`` to admit only novel docs.

    Same stop-shingle guard and retained-set Jaccard semantics as
    ``ngram_jaccard_pairs`` (document frequency counted over corpus+batch
    together, matching what a combined corpus would compute). At 100 TB the
    corpus index is the natural candidate for the bucketed/persisted layout
    (write once, probe per batch).

    Same single-shuffle posting-list plan as ``ngram_jaccard_pairs``, with
    two lists per shingle (batch ids, corpus ids): the guard filters on the
    combined length (= combined document frequency) and candidate pairs are
    the per-shingle cross of the two lists — batch×corpus only, never
    corpus×corpus.
    """

    def index(df: DataFrame, tag: str) -> DataFrame:
        return (
            spread(df)
            .select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
            .select("id", F.size("sh").alias("psize"), F.explode("sh").alias("shingle"))
            .select(
                F.lit(tag).alias("side"),
                F.xxhash64("shingle").alias("shingle"),
                F.struct("id", "psize").alias("doc"),
            )
        )

    both = index(new, "n").unionByName(index(corpus, "c"))
    # collect_list skips NULLs, so one aggregate splits the posting into a
    # per-side pair of lists; combined length = combined document frequency.
    posting = both.groupBy("shingle").agg(
        F.expr("collect_list(CASE WHEN side = 'n' THEN doc END) AS new_docs"),
        F.expr("collect_list(CASE WHEN side = 'c' THEN doc END) AS corpus_docs"),
    )

    hot_new = hot_corp = None
    if max_shingle_freq is not None:
        posting = track_cache(posting.persist())
        df_combined = F.size("new_docs") + F.size("corpus_docs")
        retained = posting.where(df_combined <= max_shingle_freq)
        hot = posting.where(df_combined > max_shingle_freq)
        hot_new = (
            hot.select(F.explode("new_docs").alias("d"))
            .groupBy(F.col("d.id").alias("new_id"))
            .agg(F.count(F.lit(1)).alias("hot_new"))
        )
        hot_corp = (
            hot.select(F.explode("corpus_docs").alias("d"))
            .groupBy(F.col("d.id").alias("corpus_id"))
            .agg(F.count(F.lit(1)).alias("hot_corp"))
        )
    else:
        retained = posting

    common = (
        retained.where((F.size("new_docs") > 0) & (F.size("corpus_docs") > 0))
        .select(F.explode("new_docs").alias("nd"), "corpus_docs")
        .select("nd", F.explode("corpus_docs").alias("cd"))
        .groupBy(
            F.col("nd.id").alias("new_id"),
            F.col("nd.psize").alias("psize_new"),
            F.col("cd.id").alias("corpus_id"),
            F.col("cd.psize").alias("psize_corpus"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if hot_new is not None:
        # Same O(docs-with-hot-shingles) bound as ngram_jaccard_pairs —
        # unhinted, AQE decides (r6 VERDICT #1).
        common = common.join(hot_new, "new_id", "left").join(
            hot_corp, "corpus_id", "left"
        )
        size_new = F.col("psize_new") - F.coalesce(F.col("hot_new"), F.lit(0))
        size_corp = F.col("psize_corpus") - F.coalesce(F.col("hot_corp"), F.lit(0))
    else:
        size_new, size_corp = F.col("psize_new"), F.col("psize_corpus")

    jac = F.col("common") / (size_new + size_corp - F.col("common"))
    return common.select(
        "new_id",
        "corpus_id",
        round_half_up(jac).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def duplicate_spans(
    df: DataFrame,
    k: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find, per
    document, the contiguous token regions covered by ``k``-token windows
    that also appear in at least ``min_docs`` distinct documents — the
    verbatim cross-document substrings (mirrored licenses, quoted passages,
    syndicated paragraphs) that n-gram/MinHash whole-doc scoring cannot
    localize. Overlapping duplicated windows merge; the output spans are
    exactly the token ranges Lee et al.'s pipeline cuts (coverage
    semantics — the union of duplicated windows, not a claim that every
    sub-window of a merged span is itself duplicated).

    The reference implementation builds a corpus suffix array — inherently
    sequential and memory-resident. The Spark-first equivalent keys on
    hashed k-token windows instead (every duplicated substring of length
    ≥ k contains only duplicated k-windows, so window-level detection finds
    the same spans with start/end resolution of one token):

    1. one tokenize + window projection per doc (``sequence`` + ``slice``
       — narrow Generate, whole-stage codegen, no UDF);
    2. cross-doc window frequency as a TWO-LEVEL hash aggregate
       ``(doc, hash) → (hash)`` so map-side combine collapses within-doc
       repeats — the shuffle carries 8-byte xxhash64 keys (the same
       collision trade-off ``paragraph_dedup(exact=False)`` documents);
    3. duplicated windows join back (unhinted — boilerplate vocabulary is
       O(corpus) on a real crawl, AQE decides);
    4. overlapping or abutting windows merge into maximal spans with one
       window pass per doc: a span breaks only where a window's start
       leaves a GAP after the running max end of everything before it
       (``pos > prev_end + 1`` — classic interval merge as
       ``max().over(rowsBetween(unboundedPreceding, -1))`` + running-sum
       span ids — one shuffle keyed by doc). Two windows covering
       [1, k] and [k+1, 2k] therefore report ONE contiguous span.

    Output: one row per maximal span — ``(id_col, span_id, span_start,
    span_end, span_len, n_windows)``; token positions are 1-based
    inclusive. Documents with no duplicated window emit no rows. Spans are
    evidence for the caller's cut/drop policy (Lee et al. cut the span;
    Gopher-style filters drop the doc above a coverage threshold).
    """
    if k < 2:
        raise ValueError(f"k must be at least 2, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be at least 2, got {min_docs}")
    wins = _token_windows(df, k, text_col, id_col)
    dup = (
        wins.groupBy("id", "h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_docs)
        .select("h")
    )
    marked = wins.join(dup, "h").select("id", "pos")
    return _merge_spans(marked, k, id_col)


def _token_windows(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, pos, h) — every k-token window of every doc, 1-based start
    positions, 8-byte xxhash64 keys over the joined window text. The one
    projection every span-level operator shares (codegen sequence+slice
    Generate, no UDF)."""
    toks = _tokens(normalize(F.col(text_col)))
    return (
        spread(df)
        .select(
            F.col(id_col).alias("id"),
            toks.alias("_toks"),
            # docs shorter than k emit no windows: sequence(1, 0) would
            # DESCEND ([1, 0]) and fabricate positions, so gate on size
            F.explode(
                F.when(
                    F.size(toks) >= k,
                    F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "id",
            "pos",
            F.xxhash64(F.array_join(F.slice("_toks", F.col("pos"), k), " ")).alias(
                "h"
            ),
        )
    )


def _merge_spans(marked: DataFrame, k: int, id_col: str) -> DataFrame:
    """Interval-merge (id, pos) marked window starts into maximal covered
    spans: one window pass per doc (span breaks only where a start leaves
    a GAP after the running max end — ``pos > prev_end + 1`` — so abutting
    windows merge into one contiguous span), then one aggregate per
    (doc, span)."""
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (k - 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        marked.withColumn(
            "_new",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end + 1), 1
            ).otherwise(0),
        )
        .withColumn(
            "span_id",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
    )
    return spans.select(
        F.col("id").alias(id_col),
        F.col("span_id").cast("long"),
        F.col("span_start").cast("long"),
        F.col("span_end").cast("long"),
        (F.col("span_end") - F.col("span_start") + 1).cast("long").alias(
            "span_len"
        ),
        F.col("n_windows").cast("long"),
    )


def contamination_spans(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-LOCALIZED decontamination (the GPT-3 appendix C / PaLM
    treatment removes the overlapping WINDOW from the training doc, not
    the doc): per training document, the contiguous token regions covered
    by ``k``-token windows that appear verbatim anywhere in the benchmark
    corpus. ``decontaminate`` answers "how contaminated is this doc";
    this answers "which tokens", so the caller can cut spans (compose
    with ``cut_duplicate_spans``' rebuild) instead of dropping documents.
    Default ``k=13`` is GPT-3's collision window.

    Output: ``(id_col, span_id, span_start, span_end, span_len,
    n_windows)`` — same schema as ``duplicate_spans``.

    Scale shape: the benchmark side reduces to its DISTINCT window-hash
    set — ~10⁴-10⁶ rows against a 100 TB corpus — joined UNHINTED (AQE
    broadcasts when it fits, the decontaminate operator's contract);
    the corpus pass is the shared window projection + one semi join +
    the per-doc interval merge. The corpus is never shuffled by window
    hash.
    """
    if k < 2:
        raise ValueError(f"k must be at least 2, got {k}")
    wins = _token_windows(train, k, text_col, id_col)
    bench = (
        _token_windows(benchmark, k, text_col, id_col)
        .select("h")
        .distinct()
    )
    marked = wins.join(bench, "h", "left_semi").select("id", "pos")
    return _merge_spans(marked, k, id_col)


def cut_duplicate_spans(
    df: DataFrame,
    k: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply ``duplicate_spans``: remove every covered token region and
    re-join the survivors — the actual Lee et al. 2022 treatment (cut the
    duplicated substring, keep the document).

    Returns one row per INPUT document, including null/empty-text and
    fully-cut ones: ``(id_col, text_cut, n_spans, n_tokens_cut)``.
    ``text_cut`` is normalized-token text (lowercased, single-spaced) —
    the same rebuilt-text contract as ``paragraph_dedup``.

    Plan shape (r16 rewrite — guide §8 "decide with small rows, move
    big rows once", §2.3 "shuffle keys and metadata instead of
    payloads"): the span-detection subtree is consumed exactly ONCE and
    aggregated to one NARROW row per spanned doc (its disjoint
    ``[start, end]`` interval list + the two counts — interval count is
    bounded by tokens/k, and real cut policies touch a small fraction
    of docs); that plan table LEFT-joins the corpus ON THE DOC ID
    (AQE-broadcastable) and the rebuilt text is a higher-order
    ``filter`` over the token array in place — position ∉ any covered
    interval, O(tokens × spans-per-doc) per doc with NO corpus-side
    exchange at all. The previous form exploded every corpus token,
    shuffled them by (doc, pos) into a tag join and again into a
    collect_list rebuild — two corpus-token-level exchanges carrying
    token text, just to delete a few covered positions.
    ``n_tokens_cut`` = Σ span_len (spans are disjoint after the
    interval merge); null/empty-text docs keep their row via the
    coalesce-to-empty token array (text_cut = '', zero counts).
    """
    spans = duplicate_spans(df, k, min_docs, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans"),
        F.count(F.lit(1)).alias("_n_spans"),
        F.sum("span_len").alias("_n_cut"),
    )
    toks = spread(df).select(
        F.col(id_col),
        F.coalesce(
            _tokens(normalize(F.col(text_col))),
            F.array().cast("array<string>"),
        ).alias("_toks"),
    )
    tagged = toks.join(per_doc, id_col, "left")
    cov = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:long,span_end:long>>"),
    )
    kept = F.filter(
        "_toks",
        lambda tok, i: ~F.exists(
            cov,
            lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"]),
        ),
    )
    return tagged.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text_cut"),
        F.coalesce(F.col("_n_spans"), F.lit(0)).cast("long").alias(
            "n_spans"
        ),
        F.coalesce(F.col("_n_cut"), F.lit(0)).cast("long").alias(
            "n_tokens_cut"
        ),
    )


def duplicate_span_coverage(
    df: DataFrame,
    k: int = 50,
    min_docs: int = 2,
    max_share: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Doc-level policy over ``duplicate_spans``: the fraction of each
    document's tokens covered by cross-document duplicated spans, plus a
    drop flag at ``max_share`` — the Gopher-style alternative to cutting
    (Lee et al. 2022 cut the span; Rae et al. 2021-style filters drop the
    whole doc when too much of it is duplicated, since a mostly-verbatim
    page is boilerplate even where it differs).

    Returns one row per input document:
    ``(id_col, n_tokens, n_dup_tokens, dup_share, keep)``; ``dup_share``
    uses the portable floor-rounding at scale 6 and is 0.0 for span-free
    and empty docs (``keep = true``).

    Plan shape: the span subtree once (its two corpus scans), one
    token-count projection, one LEFT join on doc id — spans are disjoint
    after the interval merge so ``Σ span_len`` IS the covered-token
    count, no explode needed.
    """
    spans = duplicate_spans(df, k, min_docs, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_len").alias("n_dup_tokens")
    )
    base = spread(df).select(
        F.col(id_col),
        # greatest(…, 0): size(null) is -1 (or null under ansi), and a
        # NULL-text doc has zero tokens, not -1 — without the clamp it
        # would emit n_tokens=-1 (share still 0.0, but the count is a lie)
        F.greatest(
            F.size(_tokens(normalize(F.col(text_col)))).cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_tokens"),
    )
    share = F.when(F.col("n_tokens") > 0, round_half_up(
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)) / F.col("n_tokens"), 6
    )).otherwise(F.lit(0.0))
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long").alias(
            "n_dup_tokens"
        ),
        share.alias("dup_share"),
        (share < max_share).alias("keep"),
    )
