"""Scale-curve probe for the dedup / ANN / connected-components family.

Generates synthetic documents + embeddings at several multiples of the
sf0.1 testdata volume (5 000 docs / 2 000 vectors = 1×), times each family
operator at every scale, and writes per-op wall-clock to
``SCALING_RESULTS.json``. SCALING.md interprets the numbers.

Corpus model — deliberately NOT a copy of the sf testdata distribution:
the testdata draws documents from a ~30-word vocabulary and embeddings
from an isotropic Gaussian, which makes shingle / sign-bit blocking
provably non-selective (every blocking key is hot; see the
cosine_pairs_lsh docstring). That is the right shape for CORRECTNESS data
(dense edge cases) and the wrong shape for a SCALING study, where the
question is how the operators behave on realistic corpora:

- documents: Zipf(1.1) over a 10 000-word vocabulary, 40-60 words/doc,
  10% of docs are near-duplicates of an earlier doc with ~7% of words
  substituted (expected 3-gram Jaccard ≈ 0.65, comfortably over the 0.5
  dedup threshold) — so true pairs exist at every scale and grow linearly
  with N, like a real crawl.
- embeddings: isotropic N(0, I) in d=64 with 5% planted near-duplicates
  (v + 0.4·noise, cosine ≈ 0.93) — timed at the realistic near-dup
  operating point (threshold 0.85) where LSH prunes, AND at the bench
  operating point (threshold 0.4) where quadratic scoring is
  information-theoretically forced, for honesty.

Usage:
    python tools/scaling_probe.py --scales 1,3,10 [--out /tmp/mfss-scaling]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE_DOCS = 5_000
BASE_VECS = 2_000
BASE_EVENTS = 100_000
BASE_USERS = 1_500
DIM = 64


def gen_documents(out: Path, scale: float, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    n = int(BASE_DOCS * scale)
    vocab = np.array([f"w{i:04d}" for i in range(10_000)])
    p = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    p /= p.sum()

    texts: list[str] = []
    words_of: list[np.ndarray] = []
    n_base = int(n * 0.9)
    for i in range(n):
        if i < n_base:
            w = vocab[rng.choice(len(vocab), rng.integers(40, 61), p=p)]
        else:  # near-duplicate of a random earlier doc, ~7% words substituted
            src = words_of[rng.integers(0, n_base)]
            w = src.copy()
            mut = rng.random(len(w)) < 0.07
            w[mut] = vocab[rng.choice(len(vocab), mut.sum(), p=p)]
        words_of.append(w)
        texts.append(" ".join(w))
    langs = rng.choice(["en", "zh", "de", "fr", "es"], n)
    pq.write_table(
        pa.table(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": texts,
                "lang": langs,
                "source": np.char.add("src", (np.arange(n) % 5).astype(str)),
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        out / "documents.parquet",
    )


def gen_embeddings(out: Path, scale: float, seed: int = 11) -> None:
    rng = np.random.default_rng(seed)
    m = int(BASE_VECS * scale)
    m_base = int(m * 0.95)
    base = rng.standard_normal((m_base, DIM))
    src = rng.integers(0, m_base, m - m_base)
    dups = base[src] + 0.4 * rng.standard_normal((m - m_base, DIM))
    vecs = np.vstack([base, dups]).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": np.arange(m, dtype=np.int64),
                "embedding": list(vecs),
                "label": (np.arange(m) % 10).astype(np.int32),
            }
        ),
        out / "embeddings.parquet",
    )


def gen_events(out: Path, scale: float, seed: int = 13) -> None:
    """Synthetic behavioral events mirroring the sf0.1 table's shape
    (100k rows / 1 500 users / 30 days / 5 types at 1×) — the input for
    the r4-addition probes (winsorization, pattern mining, multi-view
    PIT), which run on events, not documents."""
    rng = np.random.default_rng(seed)
    n = int(BASE_EVENTS * scale)
    n_users = int(BASE_USERS * scale)
    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    offs = (rng.random(n) * 30 * 86400 * 1_000_000).astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": pa.array(ts0 + offs, pa.timestamp("us")),
                "user_id": rng.integers(0, n_users, n),
                "event_type": rng.choice(
                    ["view", "click", "purchase", "error", "signup"], n
                ),
                # lognormal-ish value with a heavy tail so winsorization
                # has real outlier mass to clip
                "value": np.round(rng.lognormal(2.0, 1.2, n), 2),
            }
        ),
        out / "events.parquet",
    )


def time_op(spark, build, iters: int = 2) -> float:
    best = float("inf")
    for _ in range(iters):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def run_scale(spark, d: Path, only: set[str] | None = None) -> dict[str, float]:
    from pyspark.sql import functions as F

    from mini_feature_store_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_against,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from mini_feature_store_spark.operators.graph import dedup_clusters
    from mini_feature_store_spark.operators.packing import pack_sequences
    from mini_feature_store_spark.operators.similarity import (
        cosine_pairs,
        cosine_pairs_lsh,
        ivf_topk,
        lsh_topk,
        pq_topk,
    )
    from mini_feature_store_spark.operators.text import (
        chunk_documents,
        lang_id,
        text_stats,
        token_count,
    )

    from mini_feature_store_spark.operators.clustering import (
        kmeans,
        semantic_dedup,
    )
    from mini_feature_store_spark.operators.similarity import int8_quantize

    def _kmeans_q(e, k, iters):
        return kmeans(e, k=k, iters=iters, seed=7)[1]

    def _semantic_q(e, k, threshold, iters):
        return semantic_dedup(e, k=k, threshold=threshold, iters=iters, seed=7)

    def _int8_q(e):
        return int8_quantize(e)

    docs = spark.read.parquet(str(d / "documents.parquet"))
    emb = spark.read.parquet(str(d / "embeddings.parquet"))
    n_docs = docs.count()
    split = int(n_docs * 0.9)
    queries = emb.where(F.col("vec_id") < 100)

    ops = {
        "text_stats": lambda: text_stats(docs),
        "lang_id": lambda: lang_id(docs),
        "ngram_jaccard_pairs": lambda: ngram_jaccard_pairs(docs, threshold=0.5),
        "dedup_clusters_cc": lambda: dedup_clusters(
            ngram_jaccard_pairs(docs, threshold=0.5)
        ),
        "ngram_jaccard_incremental": lambda: ngram_jaccard_against(
            docs.where(F.col("doc_id") >= split),
            docs.where(F.col("doc_id") < split),
            threshold=0.5,
        ),
        "minhash_lsh_pairs": lambda: minhash_lsh_pairs(docs, threshold=0.5),
        "simhash_pairs": lambda: simhash_pairs(docs),
        "simhash_pairs_idf": lambda: simhash_pairs(docs, idf_weighted=True),
        # realistic near-dup operating point: LSH prunes here
        "cosine_pairs_lsh_t085": lambda: cosine_pairs_lsh(
            emb, threshold=0.85, n_planes=12, n_tables=8
        ),
        "cosine_pairs_exact_t085": lambda: cosine_pairs(emb, threshold=0.85),
        # bench operating point: quadratic scoring information-theoretically
        # forced (signal/background per-plane gap 0.63 vs 0.50) — reported
        # for honesty, expected ~quadratic for BOTH paths
        "cosine_pairs_lsh_t04": lambda: cosine_pairs_lsh(emb, threshold=0.4),
        "cosine_pairs_exact_t04": lambda: cosine_pairs(emb, threshold=0.4),
        "embedding_cc_t085": lambda: dedup_clusters(
            cosine_pairs_lsh(emb, threshold=0.85, n_planes=12, n_tables=8)
        ),
        "lsh_topk": lambda: lsh_topk(queries, emb, k=5),
        "ivf_topk": lambda: ivf_topk(queries, emb, k=5),
        "pq_topk": lambda: pq_topk(queries, emb, k=5, n_probe=8, refine=8),
        "sequence_packing": lambda: pack_sequences(
            docs.select(
                "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
            ),
            budget=512,
            shard_col="source",
        ),
        "chunk_windows": lambda: chunk_documents(docs, chunk_tokens=40, overlap=8),
        # semantic tier (r4): clustering cost is iters·(GEMM scan +
        # combiner shuffle); semantic dedup adds within-cluster GEMM + CC.
        # At the 0.85 near-dup point clusters prune the pair GEMM like LSH
        # does, with k controlling the O(Σ nᵢ²·d) spread.
        "kmeans_assign_k16": lambda: _kmeans_q(emb, k=16, iters=4),
        "semantic_dedup_t085_k16": lambda: _semantic_q(
            emb, k=16, threshold=0.85, iters=4
        ),
        "int8_quantize": lambda: _int8_q(emb),
    }

    # ── r4-addition probes (r4 VERDICT #5): PageRank, video near-dup,
    # winsorization, pattern mining, multi-view PIT ──
    import struct as _struct

    from mini_feature_store_spark.operators.graph import pagerank
    from mini_feature_store_spark.operators.multimodal import (
        FAKE_VIDEO_MAGIC,
        synthesize_payloads,
        video_phash_neardup,
    )
    from mini_feature_store_spark.operators.point_in_time import (
        point_in_time_join_multi,
    )
    from mini_feature_store_spark.queries import (
        backfill_features_window_form,
    )

    events = spark.read.parquet(str(d / "events.parquet"))

    def _pagerank():
        pairs = ngram_jaccard_pairs(docs, threshold=0.5)
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        return pagerank(edges, iters=5)

    def _make_video(doc_id: int, n_chars: int) -> bytes:
        # the video_neardup query's generator: every 10th video re-encodes
        # an earlier one, sawtooth phase AND slope vary with the seed
        base = (doc_id - 5) if doc_id % 10 == 0 and doc_id >= 10 else doc_id
        w, h, c, nf = 24, 18, 3, 6
        n = w * h * c
        frames = []
        for f in range(nf):
            seed = (base * 131 + f * 17) % 4093
            slope = 17 + 2 * ((seed >> 8) % 16)
            frames.append(
                ((seed % 256 + np.arange(n, dtype=np.int64) * slope) % 256)
                .astype(np.uint8)
                .tobytes()
            )
        return (
            FAKE_VIDEO_MAGIC
            + _struct.pack("<HHBH", w, h, c, nf)
            + b"".join(frames)
        )

    def _video_neardup():
        media = synthesize_payloads(docs, _make_video, min_partitions=8)
        return video_phash_neardup(
            media, every_k=2, min_shared=2, max_hamming=0
        )

    def _winsorize():
        cuts = events.groupBy("event_type").agg(
            F.percentile("value", 0.05).alias("p05"),
            F.percentile("value", 0.95).alias("p95"),
        )
        wv = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
        return (
            events.join(F.broadcast(cuts), "event_type")
            .select("event_type", "value", wv.alias("wv"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 2).alias("raw_mean"),
                F.round(F.avg("wv"), 2).alias("wins_mean"),
                F.round(F.stddev_samp("value"), 2).alias("raw_std"),
                F.round(F.stddev_samp("wv"), 2).alias("wins_std"),
            )
        )

    def _patterns():
        # the user_event_patterns query shape: one hash aggregate builds
        # per-user initial strings, regex counts are a map-only projection
        seq = F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("i"),
                        )
                    )
                ),
                lambda x: x["i"],
            ),
        )
        return (
            events.groupBy("user_id")
            .agg(seq.alias("seq"))
            .select(
                "user_id",
                "seq",
                F.size(F.regexp_extract_all(F.col("seq"), F.lit("v+p"), 0))
                .cast("int")
                .alias("n_view_to_buy"),
                F.size(F.regexp_extract_all(F.col("seq"), F.lit("ec*p"), 0))
                .cast("int")
                .alias("n_error_recovery"),
            )
        )

    def _pit_multi():
        features = backfill_features_window_form(
            events, "2024-01-01", "2024-01-30"
        )
        weekly = events.groupBy(
            "user_id",
            F.date_add(F.date_trunc("week", "ts").cast("date"), 7).alias(
                "w_avail"
            ),
        ).agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias(
                "w_weekly_clicks"
            ),
            F.round(F.sum("value"), 2).alias("w_weekly_value"),
        )
        labels = (
            events.where(F.col("event_type") == "purchase")
            .select(
                "user_id", F.lit(1.0).alias("label"), F.col("ts").alias("as_of_ts")
            )
            .distinct()
        )
        return point_in_time_join_multi(
            labels,
            [
                {"features": features, "feature_ts": "day"},
                {"features": weekly, "feature_ts": "w_avail"},
            ],
        )

    # ── r7-new operator probes (r7 VERDICT #4): paragraph dedup,
    # per-benchmark decontamination, fractional-epoch upsampling,
    # temperature mixture sampling — plus the r8 URL/domain tier ──
    from mini_feature_store_spark.operators.sampling import (
        temperature_mixture_sample,
        upsample_epochs,
    )
    from mini_feature_store_spark.operators.text import (
        decontaminate_multi,
        paragraph_dedup,
    )
    from mini_feature_store_spark.operators.urls import (
        domain_cap_approx,
        url_dedup,
    )

    # paragraphized corpus: shared header/footer boilerplate on every doc
    # (df = N — the worst-case hot key for the frequency aggregate), the
    # Zipf body as the middle paragraph (unique except planted near-dups)
    para_docs = docs.select(
        "doc_id",
        F.concat(
            F.lit("subscribe to our newsletter today\n"),
            F.col("text"),
            F.lit("\ncopyright 2024 example corp all rights reserved"),
        ).alias("text"),
    )

    def _duplicate_spans():
        # the 10% planted near-dups share long verbatim runs (7% word
        # substitution leaves ~75% of k=4 windows intact) — true spans
        # grow linearly with N
        from mini_feature_store_spark.operators.dedup import duplicate_spans

        return duplicate_spans(docs, k=4, min_docs=2)

    def _contamination_spans():
        from mini_feature_store_spark.operators.dedup import (
            contamination_spans,
        )

        bench = docs.where(F.col("doc_id") % 97 == 0)
        return contamination_spans(
            docs.where(F.col("doc_id") % 97 != 0), bench, k=4
        )

    def _line_filter_c4():
        # synthesize line structure + terminal punctuation from the token
        # stream (the registry query's pattern): 7-token lines, every
        # third missing its '.'
        from mini_feature_store_spark.operators.text import line_filter

        toks = F.split(F.col("text"), r"\s+")
        nlines = F.ceil(F.size(toks) / F.lit(7.0)).cast("int")
        lines = F.transform(
            F.sequence(F.lit(1), F.greatest(nlines, F.lit(1))),
            lambda i: F.concat(
                F.array_join(F.slice(toks, (i - 1) * 7 + 1, 7), " "),
                F.when((F.col("doc_id") + i) % 3 != 0, F.lit(".")).otherwise(
                    F.lit("")
                ),
            ),
        )
        synth = docs.select(
            "doc_id", F.array_join(lines, "\n").alias("text")
        )
        return line_filter(synth)

    def _bigram_lm():
        # reference model = ~2% slice, score the whole corpus — the CCNet
        # shape (tiny trusted reference, big crawl)
        from mini_feature_store_spark.operators.text import bigram_lm_score

        return bigram_lm_score(docs.where(F.col("doc_id") % 47 == 0), docs)

    def _lm_buckets():
        # the NTILE-over-LM-subtree shape of doc_lm_buckets: per-language
        # perplexity terciles (5 synthetic langs; window keyed by lang,
        # ordered by score + id tie-break — never a global window)
        from pyspark.sql import Window

        from mini_feature_store_spark.operators.text import bigram_lm_score

        langs = docs.withColumn(
            "lang", (F.col("doc_id") % 5).cast("string")
        )
        scored = bigram_lm_score(
            langs.where(F.col("doc_id") % 47 == 0), langs
        )
        t = F.ntile(3).over(
            Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
        )
        return (
            langs.select("doc_id", "lang")
            .join(scored.select("doc_id", "avg_nll"), "doc_id")
            .select(
                "doc_id",
                "lang",
                "avg_nll",
                F.when(t == 1, "head")
                .when(t == 2, "middle")
                .otherwise("tail")
                .alias("bucket"),
            )
        )

    def _bpe_train10():
        # full distributed BPE induction: one corpus pass to the word
        # table, then 10 pair-count/argmax/rewrite rounds on the vocab
        # (the training happens eagerly inside the build — time_op's
        # noop write of the driver-built merge table adds nothing)
        from mini_feature_store_spark.operators.bpe import bpe_train

        merges, vocab = bpe_train(docs, n_merges=10)
        vocab.unpersist()
        return merges

    def _compact_store_job():
        # small-files maintenance: build an admitted store of ~n/5000*10
        # per-batch files (the foreachBatch append shape), time the
        # compaction swap itself, and print the anti-join probe latency
        # before/after plus the file counts (the row's evidence)
        import shutil
        import tempfile

        from mini_feature_store_spark.streaming.ingest import (
            compact_admitted_store,
        )

        base = Path(tempfile.mkdtemp(prefix="mfss-compact-"))
        store = str(base / "admitted")
        urled = _urlify(docs).select(
            "doc_id", F.col("url").alias("canonical_url")
        )
        n = urled.count()
        nfiles = max(10, n // 5_000 * 10)
        # one job produces the nfiles-file fragmented layout (a per-file
        # append loop would full-scan the table nfiles times; only the
        # compaction swap below is what's being measured)
        # round-robin: exactly nfiles non-empty, evenly-sized files (hash
        # repartition collides bucket values -> lumpy/empty files, and
        # range partitioning samples boundaries so counts can drift; the
        # probe only needs a fragmented N-file layout, not clustering)
        urled.repartition(nfiles).write.parquet(store)

        def _probe() -> float:
            batch = urled.where(F.col("doc_id") % 7 == 0)
            t0 = time.perf_counter()
            batch.join(
                spark.read.parquet(store), "canonical_url", "left_anti"
            ).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 2)

        before = _probe()
        t0 = time.perf_counter()
        report = compact_admitted_store(
            spark, store, "canonical_url", target_files=8
        )
        dt = round(time.perf_counter() - t0, 2)
        after = _probe()
        print(
            f"      compact_store: files {report['files_before']}->"
            f"{report['files_after']}, probe {before}s->{after}s",
            flush=True,
        )
        shutil.rmtree(base, ignore_errors=True)
        return dt

    def _dup_span_coverage():
        from mini_feature_store_spark.operators.dedup import (
            duplicate_span_coverage,
        )

        return duplicate_span_coverage(docs, k=4, min_docs=2)

    def _greedy_packing():
        from mini_feature_store_spark.operators.packing import (
            pack_documents_greedy,
        )

        return pack_documents_greedy(docs, max_tokens=128, shards=32)

    def _cut_duplicate_spans():
        # the apply form: detection subtree consumed once + one corpus
        # posexplode + one groupBy(doc) rebuild — r9 single-pass plan
        from mini_feature_store_spark.operators.dedup import (
            cut_duplicate_spans,
        )

        return cut_duplicate_spans(docs, k=4, min_docs=2)

    def _urldedup_stream():
        # REAL streaming run (foreachBatch, availableNow): 5 micro-batches
        # of N/5 urlified docs against a growing admitted store — returns
        # its own wall seconds (the _stream suffix routes around time_op).
        # The %2000-domain / %500-path url construction makes ~3/4 of
        # each batch collide with earlier batches' canonical URLs, so the
        # anti join does real work at every batch.
        import shutil
        import tempfile

        from mini_feature_store_spark.streaming.ingest import (
            incremental_urldedup_stream,
        )

        base = Path(tempfile.mkdtemp(prefix="mfss-urlstream-"))
        src = base / "incoming"
        src.mkdir()
        urled = _urlify(docs).select("doc_id", "url")
        for b in range(5):
            urled.where(F.col("doc_id") % 5 == b).coalesce(1).write.mode(
                "append"
            ).json(str(src))
        stream = (
            spark.readStream.schema("doc_id long, url string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        t0 = time.perf_counter()
        q = (
            incremental_urldedup_stream(
                stream, str(base / "admitted"), str(base / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = round(time.perf_counter() - t0, 2)
        shutil.rmtree(base, ignore_errors=True)
        return dt

    def _paragraph_dedup_exact():
        return paragraph_dedup(para_docs, min_docs=2, exact=True)

    def _paragraph_dedup_hash():
        # the 100 TB operating point: 8-byte keys on the shuffle
        return paragraph_dedup(para_docs, min_docs=2, exact=False)

    def _decontaminate_multi():
        # 3 benchmarks of ~1% of the corpus each: the realistic shape
        # (eval sets are tiny vs the corpus; contamination is sparse
        # because only planted near-dups overlap)
        bench = docs.where(F.col("doc_id") % 97 == 0).select(
            F.col("text"),
            F.concat(F.lit("bench"), (F.col("doc_id") % 3).cast("string")).alias(
                "benchmark"
            ),
        )
        return decontaminate_multi(docs, bench, n=3, threshold=0.1)

    def _upsample_epochs():
        # rate 2.5: every doc twice + half admitted a third time
        return upsample_epochs(docs, ["doc_id"], F.lit(2.5))

    def _temperature_sample():
        # strata = leading text word class via doc_id buckets (synthetic
        # corpus has no source col); 16 skewed strata from the Zipf ids
        strata = docs.withColumn(
            "src", (F.floor(F.sqrt(F.col("doc_id") + 1)) % 16).cast("string")
        )
        return temperature_mixture_sample(strata, ["doc_id"], "src", alpha=0.5)

    def _urlify(d):
        did = F.col("doc_id")
        return d.withColumn(
            "url",
            F.concat(
                F.when(did % 2 == 0, F.lit("https")).otherwise(F.lit("HTTPS")),
                F.lit("://"),
                F.when(did % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
                F.lit("d"),
                (did % 2000).cast("string"),
                F.lit(".com/p"),
                (did % 500).cast("string"),
                F.when(did % 3 == 0, F.lit("?utm_source=rss&b=2&a=1")).otherwise(
                    F.lit("")
                ),
            ),
        )

    def _url_dedup():
        return url_dedup(_urlify(docs))

    def _domain_cap_approx():
        # 2000 registrable domains (dN.com), celebrity-free; the
        # operator's skew story is the rate-threshold admission itself
        return domain_cap_approx(_urlify(docs), 20)

    def _domain_cap_approx_hot():
        # celebrity shape: 60% of the corpus on ONE domain — the workload
        # the approx cap exists for (window form serializes it)
        hot = _urlify(docs).withColumn(
            "url",
            F.when(
                F.col("doc_id") % 10 < 6,
                F.concat(
                    F.lit("https://hot.example.com/p"),
                    (F.col("doc_id") % 500).cast("string"),
                ),
            ).otherwise(F.col("url")),
        )
        return domain_cap_approx(hot, 20)

    # ── r11 additions: the four r10-new gaps (VERDICT #7) + the three
    # r11-new operators. BPE artifacts are trained ONCE per scale and
    # parquet-round-tripped so time_op's clearCache() can't force a
    # retrain inside the timed region — the rows measure tokenize/encode
    # cost, not training.
    _bpe_state: dict[str, str] = {}

    def _bpe_artifacts() -> str:
        if "dir" not in _bpe_state:
            import tempfile

            from mini_feature_store_spark.operators.bpe import bpe_train

            base = Path(tempfile.mkdtemp(prefix="mfss-bpe-"))
            merges, vocab = bpe_train(docs, n_merges=200)
            merges.write.mode("overwrite").parquet(
                str(base / "merges.parquet")
            )
            vocab.write.mode("overwrite").parquet(str(base / "vocab.parquet"))
            vocab.unpersist()
            _bpe_state["dir"] = str(base)
        return _bpe_state["dir"]

    def _bpe_tokenize_trained():
        from mini_feature_store_spark.operators.bpe import bpe_tokenize

        d_ = _bpe_artifacts()
        vocab = spark.read.parquet(d_ + "/vocab.parquet")
        return bpe_tokenize(docs, vocab)

    def _bpe_encode_replay200():
        # 200 merges > FOLD_MAX_MERGES → the Arrow replay path (the
        # real-vocabulary form this row exists to certify)
        from mini_feature_store_spark.operators.bpe import bpe_encode

        d_ = _bpe_artifacts()
        merges = spark.read.parquet(d_ + "/merges.parquet")
        return bpe_encode(docs, merges)

    def _packing_tokenizer_sized():
        # tokenizer→packing composition (pipeline --pack-tokenizer-dir):
        # replay-encode counts feed the per-shard greedy fold
        from mini_feature_store_spark.operators.bpe import bpe_encode
        from mini_feature_store_spark.operators.packing import (
            pack_documents_greedy,
        )

        d_ = _bpe_artifacts()
        merges = spark.read.parquet(d_ + "/merges.parquet")
        counts = bpe_encode(docs, merges).select("doc_id", "n_tokens")
        return pack_documents_greedy(
            counts, max_tokens=512, shards=32, tokens_col="n_tokens"
        )

    def _xmodal_alignment():
        # LAION-style 1-1 pair gate: stub image tower over synthesized
        # payloads + 16-dim text projection; zero-shuffle cosine
        from mini_feature_store_spark.operators.multimodal import (
            alignment_gate,
            encode_fake_image,
            image_embed_stub,
            synthesize_payloads,
        )

        def make_blob(doc_id: int, n_chars: int) -> bytes:
            w = 4 + doc_id % 13
            h = 3 + n_chars % 7
            return encode_fake_image(w, h, 3, seed=doc_id)

        media = synthesize_payloads(docs, make_blob)
        iemb = image_embed_stub(media).select("media_id", "image_embedding")
        tproj = emb.select(
            "vec_id",
            F.transform(
                F.slice("embedding", 1, 16), lambda x: x.cast("double")
            ).alias("text_embedding"),
        )
        pairs = iemb.join(tproj, iemb["media_id"] == tproj["vec_id"])
        return alignment_gate(pairs, threshold=0.2)

    def _trigram_lm():
        # same CCNet shape as bigram_lm_ref2pct, one order deeper; the
        # auto dispatch resolves to the POSITION strategy here (2%
        # reference → count tables broadcast)
        from mini_feature_store_spark.operators.text import trigram_lm_score

        return trigram_lm_score(docs.where(F.col("doc_id") % 47 == 0), docs)

    def _fivegram_lm():
        # CCNet's actual KenLM order via the generalized scorer (auto →
        # position at this reference size)
        from mini_feature_store_spark.operators.text import ngram_lm_score

        return ngram_lm_score(
            docs.where(F.col("doc_id") % 47 == 0), docs, order=5
        )

    def _bigram_lm_type():
        from mini_feature_store_spark.operators.text import bigram_lm_score

        return bigram_lm_score(
            docs.where(F.col("doc_id") % 47 == 0), docs, strategy="type"
        )

    def _trigram_lm_type():
        # the scale-path strategy measured against the same inputs —
        # pays distinct + join-back here, caps corpus shuffles at 100×
        from mini_feature_store_spark.operators.text import ngram_lm_score

        out = ngram_lm_score(
            docs.where(F.col("doc_id") % 47 == 0),
            docs,
            order=3,
            strategy="type",
        )
        return out

    def _fivegram_lm_type():
        from mini_feature_store_spark.operators.text import ngram_lm_score

        return ngram_lm_score(
            docs.where(F.col("doc_id") % 47 == 0),
            docs,
            order=5,
            strategy="type",
        )

    def _tokenizer_metrics():
        # tokenizer→analysis composition: per-language fertility and
        # compression over encode counts (vocab-join form for the probe)
        from mini_feature_store_spark.operators.bpe import bpe_tokenize
        from mini_feature_store_spark.operators.text import CHUNK_RE

        d_ = _bpe_artifacts()
        vocab = spark.read.parquet(d_ + "/vocab.parquet")
        enc = bpe_tokenize(docs, vocab).select("doc_id", "n_tokens")
        base = (
            docs.select(
                "doc_id",
                "lang",
                F.size(
                    F.regexp_extract_all(
                        F.lower(F.col("text")), F.lit(CHUNK_RE), 0
                    )
                )
                .cast("long")
                .alias("n_words"),
                F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
                .cast("long")
                .alias("n_chars"),
            ).join(enc, "doc_id", "left")
        )
        return base.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_tokens") / F.sum("n_words")).alias("fertility"),
            (F.sum("n_chars") / F.sum("n_tokens")).alias("compression"),
        )

    def _token_budget_mixture():
        from mini_feature_store_spark.operators.bpe import bpe_tokenize
        from mini_feature_store_spark.operators.sampling import (
            temperature_mixture_sample,
        )

        d_ = _bpe_artifacts()
        vocab = spark.read.parquet(d_ + "/vocab.parquet")
        enc = bpe_tokenize(docs, vocab).select("doc_id", "n_tokens")
        base = docs.select("doc_id", "lang").join(enc, "doc_id", "left")
        return temperature_mixture_sample(
            base, ["doc_id"], "lang", alpha=0.5, tokens_col="n_tokens"
        )

    def _unigram_train():
        # seed + one usage-refinement round; like bpe_train the timed
        # region includes training (the result is a driver-built frame,
        # so the noop write itself adds nothing)
        from mini_feature_store_spark.operators.unigram import unigram_train

        return unigram_train(
            docs, vocab_size=2000, max_piece_len=6, refine_rounds=1
        )

    def _uni_artifacts() -> str:
        if "uni_vocab" not in _bpe_state:
            import tempfile

            from mini_feature_store_spark.operators.unigram import (
                unigram_train,
            )

            base = Path(tempfile.mkdtemp(prefix="mfss-uni-"))
            unigram_train(
                docs, vocab_size=2000, max_piece_len=6, refine_rounds=1
            ).write.parquet(str(base / "pieces.parquet"))
            _bpe_state["uni_vocab"] = str(base / "pieces.parquet")
        return _bpe_state["uni_vocab"]

    def _unigram_tokenize():
        from mini_feature_store_spark.operators.unigram import (
            unigram_tokenize,
        )

        vocab = spark.read.parquet(_uni_artifacts())
        return unigram_tokenize(docs, vocab)

    # ── r12 additions: the comparison composition + true-EM trainer +
    # the composed mixture-manifest funnel (the three r12-new gates).
    def _tokenizer_comparison():
        # BPE-vs-unigram head-to-head over TRAINED artifacts (training
        # has its own rows; this times the comparison composition: two
        # corpus encodes + the base projection + two 1-row aggregates)
        from mini_feature_store_spark.operators.bpe import (
            CHUNK_RE,
            bpe_encode,
        )
        from mini_feature_store_spark.operators.unigram import (
            unigram_tokenize,
        )

        merges = spark.read.parquet(_bpe_artifacts() + "/merges.parquet")
        pieces = spark.read.parquet(_uni_artifacts())
        enc_b = bpe_encode(docs, merges).select("doc_id", "n_tokens")
        enc_u = unigram_tokenize(docs, pieces).select("doc_id", "n_tokens")
        base = docs.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(CHUNK_RE), 0
                )
            )
            .cast("long")
            .alias("n_words"),
            F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
            .cast("long")
            .alias("n_chars"),
        )

        def stats(name, enc):
            j = base.join(enc, "doc_id", "left")
            return j.agg(
                F.lit(name).alias("tokenizer"),
                F.sum("n_tokens").alias("total_tokens"),
                (F.sum("n_tokens") / F.sum("n_words")).alias("fertility"),
                (F.sum("n_chars") / F.sum("n_tokens")).alias("compression"),
            )

        return stats("bpe", enc_b).unionByName(stats("unigram", enc_u))

    def _unigram_train_em():
        # the true-EM trainer: E-step jobs ∝ em_iters × prune rounds,
        # each one Arrow pass over the DISTINCT word table
        from mini_feature_store_spark.operators.unigram import (
            unigram_train_em,
        )

        return unigram_train_em(
            docs, vocab_size=2000, max_piece_len=6, seed_multiplier=2
        )

    def _split_decontaminate():
        # r12 split hygiene: 80/10/10 md5 split, then train
        # decontaminated against its own val split (val shingles
        # broadcast; corpus never shuffled by shingle)
        from mini_feature_store_spark.operators.sampling import hash_split
        from mini_feature_store_spark.operators.text import decontaminate

        split = hash_split(
            docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        return decontaminate(
            split.where(F.col("split") == "train"),
            split.where(F.col("split") == "val"),
            n=5,
            threshold=0.05,
        )

    def _mixture_manifest():
        # the composed r12 gate: domain cap → token-budgeted temperature
        # mixture → doc-preserving packing (chunk-count token measure)
        from mini_feature_store_spark.operators.packing import (
            pack_documents_greedy,
        )
        from mini_feature_store_spark.operators.text import (
            word_chunk_count,
        )
        from mini_feature_store_spark.operators.urls import domain_cap

        with_url = _urlify(docs).select(
            "doc_id",
            "url",
            (F.floor(F.sqrt(F.col("doc_id") + 1)) % 16)
            .cast("string")
            .alias("lang"),
            F.greatest(
                word_chunk_count(F.col("text")), F.lit(0).cast("long")
            ).alias("n_tokens"),
        )
        capped = domain_cap(with_url, 20).select(
            "doc_id", "lang", "n_tokens"
        )
        admitted = temperature_mixture_sample(
            capped, ["doc_id"], "lang", alpha=0.5, tokens_col="n_tokens"
        )
        return pack_documents_greedy(
            admitted, max_tokens=2048, shards=32, tokens_col="n_tokens"
        )

    def _dsir_importance():
        # r12 DSIR: 2% target slice (the LM-family reference convention);
        # the weight table is n_buckets-bounded → broadcast at any scale,
        # scoring is one corpus-side shuffle
        from mini_feature_store_spark.operators.dsir import dsir_importance

        return dsir_importance(
            docs.where(F.col("doc_id") % 50 == 0),
            docs.where(F.col("doc_id") % 50 != 0),
        )

    def _dsir_resample():
        # Gumbel top-k at 5% of the corpus via threshold selection
        # (r13): approx_percentile bracket + core filter + bounded
        # boundary trim — no k-sized heap anywhere
        from mini_feature_store_spark.operators.dsir import dsir_resample

        n = docs.count()
        return dsir_resample(
            docs.where(F.col("doc_id") % 50 == 0),
            docs.where(F.col("doc_id") % 50 != 0),
            k=max(1, n // 20),
        )

    def _dsir_resample_20pct():
        # the r12 judge's curve: k = 20% of the corpus — the regime
        # where the old orderBy().limit(k) shape held a corpus-fraction
        # heap per task; threshold selection must stay scan-dominated
        from mini_feature_store_spark.operators.dsir import dsir_resample

        n = docs.count()
        return dsir_resample(
            docs.where(F.col("doc_id") % 50 == 0),
            docs.where(F.col("doc_id") % 50 != 0),
            k=max(1, n // 5),
        )

    def _doremi_excess():
        # r13 DoReMi round-1 signal: one corpus scan -> bounded
        # (domain, bucket) table; the curve should track the gram
        # explosion scan, with everything after data-size-flat
        from mini_feature_store_spark.operators.doremi import (
            doremi_excess_loss,
        )

        return doremi_excess_loss(
            docs.withColumn(
                "source", (F.col("doc_id") % 8).cast("string")
            ),
            n_buckets=2048,
        )

    def _semantic_decontaminate():
        # r12 embedding-space decontamination: FIXED-size benchmark (the
        # eval-suite contract) vs the growing corpus — wall should track
        # the corpus linearly
        from mini_feature_store_spark.operators.similarity import (
            semantic_decontaminate,
        )

        return semantic_decontaminate(
            emb.where(F.col("vec_id") >= 200),
            emb.where(F.col("vec_id") < 200),
            threshold=0.85,
        )

    def _clf_train():
        # r12 distributed LR trainer: 15 gradient iterations, each ONE
        # map-side-combined d+1-double aggregate over the cached feature
        # frame — wall should be scan-bound, iterations nearly free
        from mini_feature_store_spark.operators.text import (
            quality_classifier_train,
        )

        art = quality_classifier_train(
            docs.where(F.col("doc_id") % 20 == 0),
            docs.where(F.col("doc_id") % 20 != 0),
            n_iter=15,
            balanced=True,
        )
        return spark.createDataFrame(
            [(k, float(v)) for k, v in art["weights"].items()],
            "feature string, coef double",
        )

    def _gopher_rules():
        # r12 Gopher §A1.2 document rules: pure codegen projection —
        # the curve should track the text_stats scan almost exactly
        from mini_feature_store_spark.operators.text import (
            gopher_quality_flags,
        )

        return gopher_quality_flags(docs, min_stopwords=1)

    def _classifier_eval_auc():
        # r12 exact tie-aware AUC: one corpus aggregate keyed by the
        # scale-4 score (bounded groups) + a bounded rank window —
        # should be scan-dominated at every scale
        from mini_feature_store_spark.operators.text import (
            classifier_eval,
            quality_classifier_score,
        )

        scored = quality_classifier_score(docs).select(
            "quality_prob", (F.col("doc_id") % 2).cast("int").alias("label")
        )
        return classifier_eval(scored)

    ops.update(
        {
            "gopher_rules_projection": _gopher_rules,
            "classifier_eval_auc": _classifier_eval_auc,
            "dsir_importance_2pct": _dsir_importance,
            "dsir_resample_top5pct": _dsir_resample,
            "dsir_resample_top20pct": _dsir_resample_20pct,
            "doremi_excess_8dom": _doremi_excess,
            "semantic_decontaminate_b200": _semantic_decontaminate,
            "clf_train_15it": _clf_train,
            "unigram_train_v2000_r1": _unigram_train,
            "unigram_tokenize_trained": _unigram_tokenize,
            "bpe_tokenize_trained": _bpe_tokenize_trained,
            "bpe_encode_replay200": _bpe_encode_replay200,
            "packing_tokenizer_sized": _packing_tokenizer_sized,
            "xmodal_alignment_gate": _xmodal_alignment,
            "trigram_lm_ref2pct": _trigram_lm,
            "fivegram_lm_ref2pct": _fivegram_lm,
            "bigram_lm_type_strategy": _bigram_lm_type,
            "trigram_lm_type_strategy": _trigram_lm_type,
            "fivegram_lm_type_strategy": _fivegram_lm_type,
            "tokenizer_metrics": _tokenizer_metrics,
            "token_budget_mixture": _token_budget_mixture,
            "tokenizer_comparison_trained": _tokenizer_comparison,
            "unigram_train_em_v2000": _unigram_train_em,
            "mixture_manifest_composed": _mixture_manifest,
            "split_decontaminate": _split_decontaminate,
        }
    )
    ops.update(
        {
            "duplicate_spans_k4": _duplicate_spans,
            "contamination_spans_k4": _contamination_spans,
            "cut_duplicate_spans_k4": _cut_duplicate_spans,
            "urldedup_5batch_stream": _urldedup_stream,
            "line_filter_c4": _line_filter_c4,
            "bigram_lm_ref2pct": _bigram_lm,
            "dup_span_coverage_k4": _dup_span_coverage,
            "greedy_packing_128": _greedy_packing,
            "lm_buckets_ntile": _lm_buckets,
            "bpe_train_10merges": _bpe_train10,
            "compact_store_job": _compact_store_job,
            "paragraph_dedup_exact": _paragraph_dedup_exact,
            "paragraph_dedup_hash": _paragraph_dedup_hash,
            "decontaminate_multi_3bench": _decontaminate_multi,
            "upsample_epochs_r2_5": _upsample_epochs,
            "temperature_sample_a05": _temperature_sample,
            "url_dedup": _url_dedup,
            "domain_cap_approx": _domain_cap_approx,
            "domain_cap_approx_hot60": _domain_cap_approx_hot,
            "pagerank_5it": _pagerank,
            "video_phash_neardup": _video_neardup,
            "winsorize_events": _winsorize,
            "pattern_mining": _patterns,
            "pit_training_multi": _pit_multi,
        }
    )

    # ── r14-new probes (r13 VERDICT #6): the composed selection funnels
    # and the single-view PIT join — the bench top-5 family that had no
    # curve. The funnel probes run the REGISTRY QUERY functions against
    # the synthetic dir (schema-compatible with the sf testdata), so the
    # curve measures the shipped composition verbatim — including
    # corpus_selection_manifest's fixed k=100 budget (which therefore
    # SHRINKS as a corpus fraction at 3×/10×; the k-insensitivity of the
    # threshold selector is curve-pinned separately at SCALING.md:103).
    from mini_feature_store_spark import queries as _registry

    def _registry_q(name):
        return lambda: _registry.QUERIES[name](spark, str(d))

    def _pit_single():
        features = backfill_features_window_form(
            events, "2024-01-01", "2024-01-30"
        )
        labels = (
            events.where(F.col("event_type") == "purchase")
            .select(
                "user_id",
                F.lit(1.0).alias("label"),
                F.col("ts").alias("as_of_ts"),
            )
            .distinct()
        )
        return point_in_time_join(labels, features, feature_ts="day")

    from mini_feature_store_spark.operators.point_in_time import (
        point_in_time_join,
    )

    ops.update(
        {
            "selection_manifest_query": _registry_q(
                "corpus_selection_manifest"
            ),
            "selection_ensemble_query": _registry_q(
                "corpus_selection_manifest_ensemble"
            ),
            # r15-new: the crawl-shaped cap variant (hash-rate stage 4 —
            # the doubled-chain trade measured at scale) and the
            # quality-ranked survivor selection
            "selection_ensemble_approx_query": _registry_q(
                "corpus_selection_manifest_ensemble_approx"
            ),
            "dedup_best_of_cluster_query": _registry_q(
                "dedup_best_of_cluster"
            ),
            "funnel_lm_query": _registry_q("corpus_curation_funnel_lm"),
            "funnel_lm3_query": _registry_q("corpus_curation_funnel_lm3"),
            "pit_training_single": _pit_single,
        }
    )
    out = {}
    for name, build in ops.items():
        if only and name not in only:
            continue
        if name.endswith(("_stream", "_job")):
            # streaming/maintenance probes time themselves (a second run
            # would hit a pre-populated admitted store — a different
            # steady state — and the compaction swap is one-shot)
            out[name] = build()
        else:
            out[name] = time_op(spark, build)
        print(f"    {name:28s} {out[name]:8.2f}s", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument("--out", default="/tmp/mfss-scaling")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--ops", default="", help="comma-separated op subset (default: all)"
    )
    args = ap.parse_args()
    only = {s.strip() for s in args.ops.split(",") if s.strip()} or None
    scales = [float(s) for s in args.scales.split(",")]

    root = Path(args.out)
    for s in scales:
        d = root / f"x{s:g}"
        if not args.skip_gen or not d.exists():
            d.mkdir(parents=True, exist_ok=True)
            print(f"generating x{s:g} ...", flush=True)
            gen_documents(d, s)
            gen_embeddings(d, s)
            gen_events(d, s)

    from mini_feature_store_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe", shuffle_partitions=32)
    spark.range(1_000_000).groupBy("id").count().write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict[str, dict[str, float]] = {}
    for s in scales:
        print(f"  scale x{s:g}:", flush=True)
        results[f"x{s:g}"] = run_scale(spark, root / f"x{s:g}", only=only)
    spark.stop()

    out = Path(__file__).resolve().parent.parent / "SCALING_RESULTS.json"
    payload = {
        "base": {
            "documents": BASE_DOCS,
            "embeddings": BASE_VECS,
            "events": BASE_EVENTS,
            "dim": DIM,
        },
        "scales": results,
    }
    if only and out.exists():
        # subset run: merge the fresh numbers into the existing artifact
        prev = json.loads(out.read_text())
        for sk, ops_t in results.items():
            prev.setdefault("scales", {}).setdefault(sk, {}).update(ops_t)
        prev["base"] = payload["base"]
        payload = prev
    out.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
