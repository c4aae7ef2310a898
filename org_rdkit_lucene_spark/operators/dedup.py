"""Deduplication operators for large-scale training-data pipelines.

Four families, each expressed Spark-first (built-in expressions where
possible so Catalyst/Tungsten run the hot path; shuffles only on the
natural keys):

- exact:       sha256(content) hash-groupBy — one shuffle on the digest
- MinHash+LSH: token-shingle → md5-based minhash signature → banded
               bucket self-join → candidate pairs (shuffle on band key,
               never all-pairs)
- SimHash:     weighted term-bit fingerprint (Arrow kernel) + banded
               hamming candidates
- n-gram Jaccard: exact Jaccard over rare shingles for candidate pairs

MinHash/Jaccard use md5 (identical hex output in Spark and DuckDB) so
the driver's oracle can reproduce them bit-for-bit in SQL.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.functions.tokenizer import bind_array, tokens_column

N_MINHASH = 8
N_BANDS = 4  # 2 hashes per band


def shingles_column(text_col: str | Column, n: int = 3) -> Column:
    """n-gram token shingles (space-joined), built-in expressions only.

    The token array is BOUND once via :func:`bind_array` — slicing an
    unbound tokenizer expression inside the per-position transform
    re-runs the whole tokenizer chain per shingle (measured 15× slower
    at sf0.1)."""
    return bind_array(
        tokens_column(text_col),
        lambda toks: F.when(F.size(toks) < n, F.array()).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """Exact dedup: (doc_id, content_hash, is_duplicate) where the
    lowest doc_id per hash group is the keeper. One shuffle on the
    digest; at cluster scale the digest groupBy broadcasts nothing and
    skew is impossible (hashes are uniform)."""
    h = F.sha2(F.col(content_col), 256).alias("content_hash")
    w = Window.partitionBy("content_hash")
    return (
        df.select(F.col(id_col).alias("doc_id"), h)
        .withColumn("keeper", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "content_hash",
            (F.col("doc_id") != F.col("keeper")).alias("is_duplicate"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "text", n_hashes: int = N_MINHASH
) -> DataFrame:
    """MinHash signature per doc: h_i = min over shingles of
    md5('<i>#' || shingle). md5 is identical across engines, making the
    signature oracle-reproducible. One explode + one groupBy(doc)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_column(content_col)).alias("shingle"),
    ).distinct()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _cap_buckets(stacked: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """Drop OVERSIZED buckets before a bucket self-join. A bucket of M
    members yields M²/2 candidate pairs on a single join key — the
    classic LSH skew blowup on boilerplate-heavy corpora (license
    headers, generated code). Dropping is deterministic and mirrors the
    rare-shingle guard ``max_shingle_df``: members of a mega-bucket are
    near-certain duplicates of each other anyway and are better handled
    by exact dedup. Monitor the drop with :func:`oversized_buckets`.
    The size aggregation shuffles on the same key as the self-join, so
    the guard adds no new shuffle pattern."""
    ok = (
        stacked.groupBy(*keys)
        .agg(F.count("*").alias("_bsz"))
        .filter(F.col("_bsz") <= max_bucket_size)
        .select(*keys)
    )
    return stacked.join(ok, keys, "left_semi")


def oversized_buckets(stacked: DataFrame, keys: list[str], max_bucket_size: int) -> DataFrame:
    """The buckets a cap would drop, with their sizes — the operational
    'logged drop count' companion of :func:`_cap_buckets`."""
    return (
        stacked.groupBy(*keys)
        .agg(F.count("*").alias("bucket_size"))
        .filter(F.col("bucket_size") > max_bucket_size)
    )


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(doc_id, band, band_val) — each doc's LSH bucket memberships."""
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(df, id_col, content_col, n_hashes)
    bands = []
    for bi in range(n_bands):
        cols = [F.col(f"h{bi * rows_per_band + j}") for j in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bi).alias("band"),
                F.concat_ws("|", *cols).alias("band_val"),
            )
        )
    stacked = bands[0]
    for b in bands[1:]:
        stacked = stacked.unionByName(b)
    return stacked


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    n_hashes: int = N_MINHASH,
    n_bands: int = N_BANDS,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any band (band = concat of
    rows-per-band consecutive minhashes). Self-join happens per band
    key — the classic shingle→minhash→band→bucket-join, never O(n²).
    Buckets larger than ``max_bucket_size`` are dropped (None disables;
    see :func:`_cap_buckets` for why this is the 100 TB guard)."""
    stacked = minhash_band_buckets(df, id_col, content_col, n_hashes, n_bands)
    if max_bucket_size is not None:
        stacked = _cap_buckets(stacked, ["band", "band_val"], max_bucket_size)
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard over DISTINCT shingles: pairs with
    J = |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    Shingles with document frequency > ``max_shingle_df`` are dropped on
    BOTH sides (a deterministic rare-shingle restriction — the standard
    guard against the quadratic blowup of joining on boilerplate
    shingles; at 100 TB this is what keeps the shingle self-join
    bounded). jacc_q is the Jaccard quantized to 1e-6."""
    sh = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(shingles_column(content_col, n)).alias("s"))
        .distinct()
    )
    rare = sh.join(
        sh.groupBy("s").count().filter(F.col("count") <= max_shingle_df).select("s"),
        "s",
    )
    sizes = rare.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = rare.alias("a")
    b = rare.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("inter"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("sz", "sz1"), "doc1")
        .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("sz", "sz2"), "doc2")
        .withColumn("jacc", F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")))
    )
    return (
        j.filter(F.col("jacc") >= threshold)
        .select(
            "doc1",
            "doc2",
            F.floor(F.col("jacc") * 1_000_000 + F.lit(0.5)).cast("long").alias("jacc_q"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """ExactSubstr-style duplicate-span detection (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): find,
    per doc, the merged token spans covered by k-token windows that
    occur >= ``min_df`` times in the corpus (within-doc repeats count).
    Training pipelines CUT these spans rather than drop whole docs.

    Returns ``(doc_id, span_start, span_end, n_windows)`` — 0-based
    token offsets, ``span_end`` exclusive, one row per maximal merged
    span, where overlapping-or-adjacent duplicate windows
    ``[pos, pos+k)`` merge into one span (adjacency: a window starting
    exactly at the previous span's end extends it).

    Scale shape: the k-gram explode is linear (k x token volume); dup
    detection is one groupBy on the md5 gram digest (uniform key, no
    skew); the occurrence join back is keyed on the same digest —
    boilerplate grams make it hot, which is AQE-skew-join territory,
    and the dup side is pre-aggregated to one row per gram. The span
    merge is a per-doc window (bounded by doc length), pure Catalyst:
    a window [pos, pos+k) starts a new island iff pos > running
    max(pos + k) over all earlier duplicate windows of the doc."""
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(shingles_column(content_col, k)).alias("pos", "g"),
    ).select("doc_id", "pos", F.md5("g").alias("gh"))
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("gdf"))
        .filter(F.col("gdf") >= min_df)
        .select("gh")
    )
    hits = grams.join(dup, "gh").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "new_isl",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_isl").over(w))
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "span_start",
            "span_end",
            "n_windows",
        )
    )


# ---------------------------------------------------------------------------
# SimHash (Arrow kernel — 64-bit fingerprints)


def _simhash_kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized SimHash: one md5 per UNIQUE term per Arrow batch (not
    per doc×term), then all doc signatures via a single scatter-add of
    the tf-weighted ±1 bit matrix. Byte-identical to the scalar
    definition (md5(term)[:8] MSB-first bits, acc>0, offset by 2^63
    into signed int64; token-less docs → all-zero fingerprint)."""
    import hashlib

    for pdf in it:
        if len(pdf) == 0:
            continue
        n = len(pdf)
        toks = pdf["toks"]
        lens = toks.map(lambda x: 0 if x is None else len(x)).to_numpy(np.int64)
        acc = np.zeros((n, 64), dtype=np.float64)
        if lens.sum() > 0:
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks if t is not None and len(t)]
            )
            codes, uniques = pd.factorize(flat)
            u = np.int64(len(uniques))
            # md5 each unique term ONCE → (U, 64) ±1 bit matrix
            digs = np.frombuffer(
                b"".join(hashlib.md5(str(t).encode("utf-8")).digest()[:8] for t in uniques),
                dtype=np.uint8,
            ).reshape(-1, 8)
            bits_pm1 = np.unpackbits(digs, axis=1).astype(np.float64) * 2.0 - 1.0
            # all accumulations are exact integer sums in float64, so
            # both branches produce bit-identical fingerprints
            if n * u <= (1 << 23):
                # small vocabulary: dense doc×term count matrix + one
                # BLAS matmul — no per-pair scatter at all. The 2^23
                # cap bounds the transient matrix to ~64 MB/task so
                # standard 4-8 GB executors never spill on this path.
                counts = np.bincount(doc_idx * u + codes, minlength=int(n * u))
                acc = counts.astype(np.float64).reshape(n, int(u)) @ bits_pm1
            else:
                # large vocabulary: tf per (doc, term) pair, then one
                # segmented reduction over doc-major-sorted weighted
                # rows (np.add.reduceat ≫ np.add.at)
                key = doc_idx * u + codes
                uk, tf = np.unique(key, return_counts=True)
                g_doc = (uk // u).astype(np.int64)
                g_code = (uk % u).astype(np.int64)
                w = tf[:, None].astype(np.float64) * bits_pm1[g_code]
                starts = np.flatnonzero(
                    np.concatenate(([True], g_doc[1:] != g_doc[:-1]))
                )
                acc[g_doc[starts]] = np.add.reduceat(w, starts, axis=0)
        outbits = (acc > 0).astype(np.uint8)
        packed = np.packbits(outbits, axis=1)  # (n, 8) big-endian bytes
        u = packed.copy().view(">u8").ravel().astype(np.uint64)
        # unsigned - 2^63 → signed int64 (== flip the top bit, reinterpret)
        signed = (u ^ np.uint64(1 << 63)).view(np.int64)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].to_numpy(np.int64), "simhash": signed}
        )


def simhash_fingerprints(df: DataFrame, id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc (md5-derived term bits, tf-weighted),
    computed in an Arrow-batched kernel. Stored offset by 2^63 into
    signed int64."""
    src = df.select(F.col(id_col).alias("doc_id"), tokens_column(content_col).alias("toks"))
    return src.mapInPandas(_simhash_kernel, schema="doc_id long, simhash long")


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id", content_col: str = "text",
                       max_hamming: int = 3,
                       max_bucket_size: int | None = 10_000) -> DataFrame:
    """Near-dup candidates: banded SimHash (4×16-bit chunks; hamming ≤ 3
    guarantees at least one identical chunk), verified by exact popcount.

    Chunk buckets larger than ``max_bucket_size`` are dropped before the
    self-join (None disables) — the same skew guard as
    :func:`minhash_lsh_pairs`: a boilerplate-heavy corpus collapses many
    docs onto one 16-bit chunk value, and an uncapped bucket of M
    members yields M²/2 join pairs. Mega-bucket members are near-certain
    duplicates and belong to exact dedup; monitor drops with
    :func:`oversized_buckets` on ``["chunk", "cv"]``."""
    fp = simhash_fingerprints(df, id_col, content_col)
    chunks = [
        fp.select(
            "doc_id", "simhash",
            F.lit(ci).alias("chunk"),
            F.shiftright(F.col("simhash"), ci * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
        )
        for ci in range(4)
    ]
    stacked = chunks[0]
    for c in chunks[1:]:
        stacked = stacked.unionByName(c)
    if max_bucket_size is not None:
        stacked = _cap_buckets(stacked, ["chunk", "cv"], max_bucket_size)
    a, b = stacked.alias("a"), stacked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("s1"), F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc1", "doc2", "hamming")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): every node connects its LARGER
    neighbors to its minimum neighborhood label. One shuffle (window
    over node id)."""
    d = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    w = Window.partitionBy("u")
    m = F.least(F.min("v").over(w), F.col("u"))
    return (
        d.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient each edge toward its larger
    endpoint, then connect every smaller neighbor (and the node itself)
    to the minimum smaller neighbor. One shuffle."""
    o = edges.select(
        F.greatest("u", "v").alias("p"), F.least("u", "v").alias("c")
    )
    w = Window.partitionBy("p")
    o = o.withColumn("m", F.min("c").over(w))
    out = o.select(F.col("m").alias("u"), F.col("c").alias("v")).unionByName(
        o.select(F.col("m").alias("u"), F.col("p").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    max_rounds: int = 30,
) -> DataFrame:
    """Duplicate CLUSTERS from candidate pairs: connected components
    over the (doc1, doc2) edge graph → ``(doc_id, cluster_id,
    is_duplicate)`` where ``cluster_id`` is the smallest doc_id in the
    component (the keeper) — the step a 100 TB dedup pipeline runs
    after MinHash/SimHash pair generation so each near-dup GROUP keeps
    exactly one representative (transitively: A~B, B~C collapse to one
    cluster even if A~C was never emitted as a pair).

    Algorithm: alternating large-star / small-star (Kiveris et al.,
    SoCC'14 — the published MapReduce CC algorithm), expressed as pure
    DataFrame window/shuffle ops. Converges in O(log² n) rounds on ANY
    graph shape — including long chains, where naive min-label
    propagation needs O(diameter) rounds — and every round is two
    shuffles partitioned by node id (no driver-side graph state; the
    only driver action per round is a 2-value convergence checksum).
    ``localCheckpoint`` truncates lineage each round so plans stay
    bounded; on a real cluster swap in reliable ``checkpoint`` for
    executor-loss tolerance.

    ``docs`` (optional) adds singleton rows (cluster_id = own id) for
    docs that never appeared in a pair. Raises if not converged within
    ``max_rounds`` (the O(log² n) bound makes 30 astronomically safe).
    """
    edges = pairs.select(
        F.col("doc1").cast("long").alias("u"), F.col("doc2").cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))

    prev: tuple | None = None
    converged = False
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # bit_xor is order-independent and cannot overflow (ANSI-safe)
        chk = edges.agg(
            F.count("*").alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).collect()[0]
        cur = (chk["n"], chk["h"])
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged and prev is not None and prev[0] > 0:
        raise RuntimeError(f"dedup_clusters did not converge in {max_rounds} rounds")

    # At convergence the edge set is a star forest: (root=min, member).
    # The groupBy-min is a pure formality (each member has one root).
    assign = (
        edges.select(
            F.greatest("u", "v").alias("doc_id"), F.least("u", "v").alias("cluster_id")
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    roots = assign.select(F.col("cluster_id").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    clustered = assign.unionByName(roots)
    if docs is not None:
        clustered = (
            docs.select(F.col(id_col).cast("long").alias("doc_id"))
            .join(clustered, "doc_id", "left")
            .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
        )
    return clustered.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") != F.col("cluster_id")).alias("is_duplicate"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "text",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """The CUT step of ExactSubstr dedup (Lee et al. 2021 remove the
    duplicated substring, not the document): drop every token position
    covered by a :func:`duplicate_spans` span and emit the surviving
    token stream's digest — ``(doc_id, n_tokens, n_tokens_kept,
    kept_sha256)`` with kept_sha256 = sha256 of the space-joined kept
    tokens in order ('' hash when nothing survives).

    Scale shape: duplicate_spans' plan plus a covered-position explode
    (Σ span lengths ≤ token volume), one anti-join on the uniform
    (doc_id, pos) key, and one per-doc groupBy whose ordered
    reassembly is sort_array over collect_list (bounded by doc
    length). Pure Catalyst."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_column(content_col)).alias("pos", "w"),
    )
    spans = duplicate_spans(df, id_col, content_col, k=k, min_df=min_df)
    covered = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end") - 1)
        ).alias("pos"),
    )
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda s: s["w"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.size(tokens_column(content_col)).cast("long").alias("n_tokens"),
        )
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_tokens_kept", F.lit(0)).cast("long").alias("n_tokens_kept"),
            F.sha2(F.coalesce("kept_text", F.lit("")), 256).alias("kept_sha256"),
        )
    )
