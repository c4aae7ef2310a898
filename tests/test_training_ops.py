"""Training-data pipeline operators: dedup, ANN, text analysis,
multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from org_rdkit_lucene_spark.functions.text import (
    doc_fingerprints,
    lang_id,
    quality_scores,
    token_counts,
)
from org_rdkit_lucene_spark.operators.ann import (
    cosine_pairs,
    cosine_topk,
    lsh_cosine_topk,
)
from org_rdkit_lucene_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from org_rdkit_lucene_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog again and often"),  # near dup
        (3, "completely different content about sparkSession and shuffles"),
        (4, "der hund und die katze und das haus ist nicht hier"),
        (5, "le chat est dans la maison et les arbres pour toujours"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_dedup_exact(spark, docs_df):
    out = dedup_exact(docs_df).toPandas().sort_values("doc_id")
    assert list(out["is_duplicate"]) == [False, True, False, False, False, False]
    assert out[out.doc_id.isin([0, 1])]["content_hash"].nunique() == 1


def test_minhash_near_dup(spark, docs_df):
    pairs = minhash_lsh_pairs(docs_df).toPandas()
    tup = set(map(tuple, pairs[["doc1", "doc2"]].to_numpy()))
    assert (0, 1) in tup  # exact dup must share every band
    assert (0, 3) not in tup and (0, 4) not in tup


def test_minhash_signature_properties(spark, docs_df):
    sig = minhash_signatures(docs_df).toPandas().set_index("doc_id")
    assert (sig.loc[0] == sig.loc[1]).all()  # identical text → identical signature
    assert (sig.loc[0] != sig.loc[3]).any()


def test_ngram_jaccard(spark, docs_df):
    pairs = ngram_jaccard_pairs(docs_df, threshold=0.5).toPandas()
    tup = {(r.doc1, r.doc2): r.jacc_q for r in pairs.itertuples()}
    assert tup.get((0, 1)) == 1_000_000  # identical → J=1
    assert (0, 2) in tup and tup[(0, 2)] < 1_000_000  # near dup
    assert (0, 3) not in tup


def test_simhash(spark, docs_df):
    fp = simhash_fingerprints(docs_df).toPandas().set_index("doc_id")["simhash"]
    assert fp.loc[0] == fp.loc[1]
    # near-dup docs should be close in hamming space
    ham = bin((int(fp.loc[0]) ^ int(fp.loc[2])) & ((1 << 64) - 1)).count("1")
    assert ham <= 8
    pairs = simhash_near_pairs(docs_df, max_hamming=8).toPandas()
    tup = set(map(tuple, pairs[["doc1", "doc2"]].to_numpy()))
    assert (0, 1) in tup


def test_cosine_topk_exact(spark):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8))
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(50), "embedding": [v.tolist() for v in vecs]})
    )
    queries = [(0, vecs[0].tolist()), (1, vecs[7].tolist())]
    out = cosine_topk(emb, queries, k=5).toPandas()
    # self must rank first with cos≈1
    r1 = out[(out.query_id == 0) & (out["rank"] == 1)].iloc[0]
    assert r1.vec_id == 0 and r1.cos_q == 1_000_000
    # brute-force numpy check of full ranking
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.floor(nv @ nv[0] * 1_000_000 + 0.5).astype(np.int64)
    order = np.lexsort((np.arange(50), -sims))[:5]
    got = out[out.query_id == 0].sort_values("rank")
    assert list(got.vec_id) == list(order)
    assert list(got.cos_q) == list(sims[order])


def test_lsh_recall(spark):
    rng = np.random.default_rng(1)
    base = rng.standard_normal((200, 16))
    # plant near-duplicates of vec 0
    for i in range(1, 6):
        base[i] = base[0] + 0.01 * rng.standard_normal(16)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in base]})
    )
    q = [(0, base[0].tolist())]
    exact = cosine_topk(emb, q, k=5).toPandas()
    approx = lsh_cosine_topk(emb, q, k=5, n_planes=8).toPandas()
    # planted near-dups share the bucket with overwhelming probability
    recall = len(set(approx.vec_id) & set(exact.vec_id)) / 5
    assert recall >= 0.8


def test_cosine_pairs(spark):
    rng = np.random.default_rng(2)
    base = rng.standard_normal((40, 8))
    base[1] = base[0] + 1e-4 * rng.standard_normal(8)
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(40), "embedding": [v.tolist() for v in base]})
    )
    pairs = cosine_pairs(emb, threshold=0.99).toPandas()
    assert (0, 1) in set(map(tuple, pairs[["vec1", "vec2"]].to_numpy()))


def test_lang_id(spark, docs_df):
    out = lang_id(docs_df).toPandas().set_index("doc_id")
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[4, "pred_lang"] == "de"
    assert out.loc[5, "pred_lang"] == "fr"


def test_token_counts(spark, docs_df):
    out = token_counts(docs_df).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 12
    assert out.loc[0, "n_ws_tokens"] == 12
    assert out.loc[0, "n_distinct_tokens"] == 10  # 'the', 'again' repeat


def test_quality_scores(spark, docs_df):
    out = quality_scores(docs_df).toPandas().set_index("doc_id")
    assert (out["quality_q"] > 0).all()
    assert (out["quality_q"] <= 1_000_000).all()
    # doc 0 has english stopwords → higher stop_ratio than doc 4
    assert out.loc[0, "stop_ratio_q"] > out.loc[4, "stop_ratio_q"]


def test_doc_fingerprints(spark, docs_df):
    out = doc_fingerprints(docs_df).toPandas().set_index("doc_id")["fingerprint"]
    assert out.loc[0] == out.loc[1]
    assert out.loc[0] != out.loc[3]


def test_multimodal_stub_and_features(spark, docs_df):
    media = attach_fake_media(docs_df)
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)
    feats = extract_media_features(media, fake=True).toPandas().sort_values("doc_id")
    assert len(feats) == 6
    assert (feats["n_bytes"] > 0).all()
    img = feats[feats.media_type == "image"]
    vid = feats[feats.media_type == "video"]
    assert (img["width"] >= 64).all()
    assert (vid["n_frames"] >= 0).all()
    # deterministic: same text → same sig
    s = feats.set_index("doc_id")["sig"]
    assert s.loc[0] == s.loc[1]


def _toy_image_decoder(blob: bytes, media_type: str) -> dict:
    """Picklable stand-in 'real' decoder: metadata from the blob length
    instead of md5 — distinguishable from the fake path."""
    return {"sig": f"toy-{len(blob)}", "width": len(blob), "height": 1,
            "duration_ms": 0, "n_frames": 0}


def test_decoder_registry_plugs_into_operators(spark, docs_df):
    """register_decoder must reach the EXECUTOR-side kernel (snapshotted
    into the closure): registered types use the real decoder, others
    keep the fake; unregistering restores the stub."""
    from org_rdkit_lucene_spark.operators.multimodal import (
        register_decoder,
        unregister_decoder,
    )

    media = attach_fake_media(docs_df)
    register_decoder("image", _toy_image_decoder)
    try:
        # driver-side single-blob API honors the registry, even with fake=False
        assert decode_media(b"xyz", "image")["sig"] == "toy-3"
        feats = extract_media_features(media, fake=True).toPandas()
        img = feats[feats.media_type == "image"]
        other = feats[feats.media_type != "image"]
        assert len(img) and img["sig"].str.startswith("toy-").all()
        assert (img["width"] == img["n_bytes"]).all()
        assert len(other) and not other["sig"].str.startswith("toy-").any()
        # bad decoder contract is rejected eagerly
        register_decoder("audio", lambda b, mt: {"sig": "x"})
        with pytest.raises(ValueError, match="missing keys"):
            decode_media(b"xx", "audio")
    finally:
        unregister_decoder("image")
        unregister_decoder("audio")
    with pytest.raises(NotImplementedError):
        decode_media(b"xx", "image", fake=False)


def test_frame_sample_plan(spark, docs_df):
    media = attach_fake_media(docs_df)
    plan = frame_sample_plan(media, every_ms=50_000).toPandas()
    feats = extract_media_features(media, fake=True).toPandas()
    vids = feats[feats.media_type == "video"]
    for r in vids.itertuples():
        want = r.duration_ms // 50_000 + 1
        assert (plan.doc_id == r.doc_id).sum() == want


# ---------------------------------------------------------------------------
# SimHash vectorized-kernel parity + LSH bucket caps


def _simhash_scalar(text: str) -> int:
    """The scalar SimHash definition (per-term md5 loop) the vectorized
    Arrow kernel must reproduce byte-for-byte."""
    import hashlib

    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text

    toks = tokenize_text(text)
    acc = np.zeros(64, dtype=np.float64)
    if toks:
        terms, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        for term, tf in zip(terms, counts):
            digest = hashlib.md5(str(term).encode("utf-8")).digest()[:8]
            bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))
            acc += tf * (bits.astype(np.float64) * 2.0 - 1.0)
    bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(bits).tobytes(), "big", signed=False) - (1 << 63)


def test_simhash_vectorized_matches_scalar(spark):
    import random

    rng = random.Random(99)
    words = ["merge", "join", "spark", "hash", "TaBle", "scan_x", "q9", "ünïcode", ""]
    rows = [(i, " ".join(rng.choices(words, k=rng.randint(0, 30)))) for i in range(80)]
    rows.append((80, ""))  # token-less → all-zero fingerprint
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = simhash_fingerprints(df).toPandas().set_index("doc_id")["simhash"]
    for i, text in rows:
        assert int(got.loc[i]) == _simhash_scalar(text), (i, text)


def test_lsh_bucket_cap_bounds_pairs(spark):
    """Engineered mega-bucket (40 identical boilerplate docs): the cap
    must drop the oversized buckets — bounding the pair count — and the
    drop must be observable via oversized_buckets."""
    from org_rdkit_lucene_spark.operators.dedup import (
        minhash_band_buckets,
        oversized_buckets,
    )

    boiler = [(i, "apache license version two point zero all rights reserved") for i in range(40)]
    distinct = [(100 + i, f"unique content number {i} about topic {i * 7}") for i in range(5)]
    df = spark.createDataFrame(pd.DataFrame(boiler + distinct, columns=["doc_id", "text"]))

    uncapped = minhash_lsh_pairs(df, max_bucket_size=None).toPandas()
    assert len(uncapped) >= 40 * 39 // 2  # the blowup the cap prevents

    capped = minhash_lsh_pairs(df, max_bucket_size=10).toPandas()
    boiler_ids = set(range(40))
    assert not any(d1 in boiler_ids for d1 in capped["doc1"])  # mega-bucket gone

    stacked = minhash_band_buckets(df)
    over = oversized_buckets(stacked, ["band", "band_val"], 10).toPandas()
    assert len(over) == 4  # the boilerplate bucket in each of the 4 bands
    assert (over["bucket_size"] == 40).all()


def test_simhash_chunk_bucket_cap_bounds_pairs(spark):
    """Engineered SimHash mega-bucket (identical boilerplate docs share
    every 16-bit chunk): the chunk-join cap must drop the oversized
    buckets — bounding the pair count — exactly like the MinHash band
    cap, and the drop must be observable via oversized_buckets."""
    from org_rdkit_lucene_spark.operators.dedup import oversized_buckets

    boiler = [(i, "apache license version two point zero all rights reserved") for i in range(40)]
    # two near-identical docs that survive the cap (small bucket)
    near = [(200, "completely different unique payload alpha beta gamma"),
            (201, "completely different unique payload alpha beta gamma")]
    df = spark.createDataFrame(pd.DataFrame(boiler + near, columns=["doc_id", "text"]))

    uncapped = simhash_near_pairs(df, max_bucket_size=None).toPandas()
    assert len(uncapped) >= 40 * 39 // 2  # the blowup the cap prevents

    capped = simhash_near_pairs(df, max_bucket_size=10).toPandas()
    boiler_ids = set(range(40))
    assert not any(d1 in boiler_ids for d1 in capped["doc1"])  # mega-bucket gone
    assert {(200, 201)} <= set(map(tuple, capped[["doc1", "doc2"]].to_numpy()))

    fp = simhash_fingerprints(df)
    stacked = None
    for ci in range(4):
        c = fp.select(
            "doc_id", F.lit(ci).alias("chunk"),
            F.shiftright(F.col("simhash"), ci * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
        )
        stacked = c if stacked is None else stacked.unionByName(c)
    over = oversized_buckets(stacked, ["chunk", "cv"], 10).toPandas()
    assert len(over) == 4  # the boilerplate bucket in each of the 4 chunks
    assert (over["bucket_size"] == 40).all()


def test_cosine_pairs_bucket_cap(spark):
    from pyspark.sql import types as T

    vecs = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(30)]  # one mega-bucket
    # exactly collinear → same sign-LSH bucket guaranteed
    vecs += [(100, [0.0, 1.0, 0.0, 0.0]), (101, [0.0, 2.0, 0.0, 0.0])]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(vecs, schema)
    uncapped = cosine_pairs(emb, threshold=0.9, max_bucket_size=None).toPandas()
    assert len(uncapped) >= 30 * 29 // 2
    capped = cosine_pairs(emb, threshold=0.9, max_bucket_size=10).toPandas()
    assert not any(v in set(range(30)) for v in capped["vec1"])
    assert {(100, 101)} <= set(map(tuple, capped[["vec1", "vec2"]].to_numpy()))


def test_ivf_topk_recall_and_probe_monotone(spark):
    """IVF probe path: full probe (nprobe = n_centroids) must equal the
    exact brute force; recall grows (weakly) with nprobe."""
    from pyspark.sql import types as T

    from org_rdkit_lucene_spark.operators.ann import ivf_cosine_topk

    rng = np.random.default_rng(4)
    vecs = [(i, rng.standard_normal(16).tolist()) for i in range(400)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(vecs, schema)
    queries = [(i, vecs[i][1]) for i in (3, 77, 200)]
    exact = cosine_topk(emb, queries, k=10).toPandas()

    full = ivf_cosine_topk(emb, queries, k=10, n_centroids=8, nprobe=8).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["query_id", "rank"]).reset_index(drop=True),
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True),
        check_dtype=False,
    )

    def recall(n):
        approx = ivf_cosine_topk(emb, queries, k=10, n_centroids=8, nprobe=n).toPandas()
        got = set(map(tuple, approx[["query_id", "vec_id"]].to_numpy()))
        want = set(map(tuple, exact[["query_id", "vec_id"]].to_numpy()))
        return len(got & want) / len(want)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 0.5  # a 50% floor at nprobe=4 of 8 cells


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantee: documents sharing a token run of length >=
    window share at least one fingerprint; identical docs share the
    whole digest; the scalar digest is deterministic."""
    from org_rdkit_lucene_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"prefix one {shared} suffix one"),
        (1, f"other start {shared} different tail here"),
        (2, f"prefix one {shared} suffix one"),  # identical to 0
        (3, "completely unrelated words nothing matches at all"),
        (4, ""),  # token-less
        (5, "ab"),  # shorter than the window
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = winnow_fingerprints(df, window=4).toPandas().set_index("doc_id")
    assert tuple(out.loc[0]) == tuple(out.loc[2])  # identical docs
    assert out.loc[4, "n_fingerprints"] == 0 and out.loc[4, "fp_xor"] == 0
    assert out.loc[5, "n_fingerprints"] == 1  # one window over what exists

    # shared-run guarantee checked on the raw sets via a pandas replica
    import hashlib

    from org_rdkit_lucene_spark.functions.tokenizer import tokenize_text

    def fps(text, w=4):
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
              for t in tokenize_text(text)]
        if not hs:
            return set()
        ww = min(w, len(hs))
        return {min(hs[i:i + w]) for i in range(len(hs) - ww + 1)}

    assert fps(rows[0][1]) & fps(rows[1][1])  # shared run -> shared fp
    assert not (fps(rows[0][1]) & fps(rows[3][1]))
    # the Spark digest matches the replica's digest
    s0 = fps(rows[0][1])
    assert out.loc[0, "n_fingerprints"] == len(s0)
    assert out.loc[0, "fp_min"] == min(s0)
    x = 0
    for v in s0:
        x ^= v
    assert out.loc[0, "fp_xor"] == x


def _uf_clusters(pairs: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    """Brute-force union-find oracle: node -> min id in its component."""
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_dedup_clusters_matches_union_find(spark):
    """Star-contraction CC == union-find on a seeded random graph
    (transitive closure: A~B, B~C must share a cluster without A~C)."""
    from org_rdkit_lucene_spark.operators.dedup import dedup_clusters

    rng = np.random.RandomState(7)
    nodes = set(range(200))
    pairs = sorted(
        {
            (int(min(a, b)), int(max(a, b)))
            for a, b in rng.randint(0, 200, size=(150, 2))
            if a != b
        }
    )
    want = _uf_clusters(pairs, nodes)
    pdf = (
        dedup_clusters(
            spark.createDataFrame(pairs, "doc1 long, doc2 long"),
            docs=spark.createDataFrame([(n,) for n in sorted(nodes)], "doc_id long"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    assert len(pdf) == len(nodes)
    got = pdf["cluster_id"].to_dict()
    assert got == want
    assert (pdf["is_duplicate"] == (pdf.index != pdf["cluster_id"])).all()


def test_dedup_clusters_chain_converges(spark):
    """A 64-node CHAIN is the worst case for naive min-propagation
    (needs O(diameter) rounds); star contraction must still converge
    fast and label every node with the chain head."""
    from org_rdkit_lucene_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(63)]
    pdf = dedup_clusters(
        spark.createDataFrame(chain, "doc1 long, doc2 long"), max_rounds=12
    ).toPandas()
    assert len(pdf) == 64
    assert (pdf["cluster_id"] == 0).all()
    assert int(pdf["is_duplicate"].sum()) == 63


def test_dedup_clusters_empty_and_singletons(spark):
    """No pairs -> every doc is its own singleton cluster."""
    from org_rdkit_lucene_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(1,), (2,), (9,)], "doc_id long")
    empty = spark.createDataFrame([], "doc1 long, doc2 long")
    pdf = dedup_clusters(empty, docs=docs).toPandas().sort_values("doc_id")
    assert list(pdf["doc_id"]) == [1, 2, 9]
    assert (pdf["cluster_id"] == pdf["doc_id"]).all()
    assert not pdf["is_duplicate"].any()


def test_curate_corpus_equals_composition(spark, docs_df):
    """The fused single-scan curation pass must equal the composition
    of the three standalone operators under the documented precedence
    (dup > lang > quality > keep)."""
    from org_rdkit_lucene_spark.functions.text import curate_corpus, lang_id, quality_scores

    thr, langs = 300_000, ("en",)
    got = curate_corpus(docs_df, min_quality_q=thr, langs=langs).toPandas()
    dup = dedup_exact(docs_df, "doc_id", "text").toPandas().set_index("doc_id")
    lid = lang_id(docs_df).toPandas().set_index("doc_id")
    q = quality_scores(docs_df).toPandas().set_index("doc_id")

    def expected(d):
        if dup.loc[d, "is_duplicate"]:
            return "dup"
        if lid.loc[d, "pred_lang"] not in langs:
            return "lang"
        if q.loc[d, "quality_q"] < thr:
            return "quality"
        return "keep"

    want = {int(d): expected(int(d)) for d in got["doc_id"]}
    assert dict(zip(got["doc_id"], got["reason"])) == want
    assert (got["keep"] == (got["reason"] == "keep").astype(int)).all()
    # the fixture has an exact dup (docs 0/1), so 'dup' must fire
    assert "dup" in set(got["reason"]) and "keep" in set(got["reason"])


def test_curate_corpus_plan_single_scan_single_shuffle(spark, docs_df):
    """Fusion contract: one parquet/local scan, one Exchange (the
    sha256 keeper window), no per-row Python."""
    from org_rdkit_lucene_spark.functions.text import curate_corpus
    from org_rdkit_lucene_spark.plans import audit

    df = curate_corpus(docs_df)
    assert audit.count_nodes(df, "BatchEvalPython") == 0
    assert audit.count_nodes(df, "Exchange") <= 2  # hash partition (+AQE reuse)


def test_kmeans_embeddings_laws(spark):
    """Deterministic k-means: (a) every vector gets a cluster in
    [0, k); (b) each init vector vec_id < k stays nearest to a centroid
    seeded from the data; (c) the assignment is a fixpoint of its own
    law — re-assigning against centroids recomputed from the final
    assignment with the exact-int mean law reproduces the output for a
    well-separated fixture; (d) repeat runs are identical."""
    from org_rdkit_lucene_spark.operators.ann import kmeans_embeddings

    rng = np.random.RandomState(11)
    centers = rng.randn(4, 16) * 5
    rows = []
    for i in range(80):
        rows.append((i, (centers[i % 4] + rng.randn(16) * 0.05).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = kmeans_embeddings(emb, n_clusters=4, n_iters=2).toPandas()
    b = kmeans_embeddings(emb, n_clusters=4, n_iters=2).toPandas()
    assert a.equals(b)
    assert set(a["cid"]) <= set(range(4)) and len(a) == 80
    # well-separated fixture: clusters recover the generator classes
    lab = a.set_index("vec_id")["cid"]
    for gen in range(4):
        members = lab[[i for i in range(80) if i % 4 == gen]]
        assert members.nunique() == 1, f"generator class {gen} split"


def test_redact_pii_law(spark):
    from org_rdkit_lucene_spark.functions.text import redact_pii

    docs = spark.createDataFrame(
        [
            (0, "mail bob.smith+x@corp.example.org now"),
            (1, "host 192.168.0.1 and acct 123456789 ok"),
            (2, "clean text, no pii at all"),
            (3, "a@b.io c@d.net"),
        ],
        "doc_id long, text string",
    )
    out = redact_pii(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "redacted"] == "mail <EMAIL> now"
    assert out.loc[0, "n_redactions"] == 1
    assert out.loc[1, "redacted"] == "host <IP> and acct <NUM> ok"
    assert out.loc[1, "n_redactions"] == 2
    assert out.loc[2, "redacted"] == "clean text, no pii at all"
    assert out.loc[2, "n_redactions"] == 0
    assert out.loc[3, "redacted"] == "<EMAIL> <EMAIL>"
    assert out.loc[3, "n_redactions"] == 2
    # pure Catalyst — no Python stage
    from org_rdkit_lucene_spark.plans import audit

    assert audit.count_nodes(redact_pii(docs), "BatchEvalPython") == 0


def test_contamination_check_law(spark):
    from org_rdkit_lucene_spark.functions.text import contamination_check

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, bench_text),                                   # the benchmark doc itself
            (1, "prefix words then " + bench_text + " suffix"),  # copies the slice
            (2, "totally unrelated content about sparks and shuffles everywhere"),
        ],
        "doc_id long, text string",
    )
    bench = docs.filter("doc_id = 0")
    out = contamination_check(docs, bench, n=8, min_hits=1).toPandas().set_index("doc_id")
    assert out.loc[0, "is_contaminated"] == 1
    assert out.loc[1, "is_contaminated"] == 1  # transitive copy caught
    assert out.loc[2, "is_contaminated"] == 0 and out.loc[2, "n_hits"] == 0
    assert out.loc[1, "n_hits"] >= 1


def test_repetition_scores_law(spark):
    from org_rdkit_lucene_spark.functions.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, "a\na\na"),                    # 3 identical lines: line 2/3, char 1.0
            (1, "one\ntwo\nthree"),            # all distinct: 0 / 0
            (2, ""),                           # no content lines
            (3, "  \n \n   "),                 # space-only lines drop out (trim = spaces)
            (4, "dup\ndup\nx\ny\nz\nw\nv\nu\nt\ns"),  # 1/10 dup lines, 6/21 dup chars
            (5, "pad\nsolo line here"),        # two distinct lines
        ],
        "doc_id long, text string",
    )
    out = repetition_scores(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_lines"] == 3
    assert out.loc[0, "dup_line_frac_q"] == 666667
    assert out.loc[0, "dup_char_frac_q"] == 1000000
    assert out.loc[0, "repetitive"] == 1
    assert out.loc[1, "repetitive"] == 0
    assert out.loc[1, "dup_line_frac_q"] == 0
    assert (out.loc[2, ["n_lines", "dup_line_frac_q", "dup_char_frac_q", "repetitive"]] == 0).all()
    assert (out.loc[3, ["n_lines", "repetitive"]] == 0).all()
    # doc 4: 10 lines, 9 distinct -> 1/10 lines; dup chars 2*3=6 of 14
    assert out.loc[4, "dup_line_frac_q"] == 100000
    assert out.loc[4, "dup_char_frac_q"] == 428571
    assert out.loc[4, "repetitive"] == 1  # char frac 0.4286 > 0.20
    assert out.loc[5, "repetitive"] == 0
    # pure Catalyst — no Python stage, no shuffle in the plan
    from org_rdkit_lucene_spark.plans import audit

    assert audit.count_nodes(repetition_scores(docs), "BatchEvalPython") == 0
    assert audit.count_nodes(repetition_scores(docs), "Exchange") == 0


def test_semdedup_law_and_cap(spark):
    from org_rdkit_lucene_spark.operators.ann import QUANT, kmeans_embeddings, semdedup

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16))
    rows = [(i, base[i].tolist()) for i in range(20)]
    # exact duplicates of vectors 2 and 5, plus a near-dup of 7
    rows += [(20, base[2].tolist()), (21, base[5].tolist())]
    near = base[7] + rng.normal(scale=1e-4, size=16)
    rows += [(22, near.tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = semdedup(emb, n_clusters=4, n_iters=2, threshold=0.999).toPandas().set_index("vec_id")
    assert out.loc[20, "is_semdup"] == 1 and out.loc[21, "is_semdup"] == 1
    assert out.loc[22, "is_semdup"] == 1  # cosine ~ 0.9999+ clears 0.999
    assert out.loc[2, "is_semdup"] == 0 and out.loc[5, "is_semdup"] == 0  # keepers
    # brute-force within-cluster oracle: dup iff lower-id same-cluster
    # vector has quantized cosine >= threshold
    asg = kmeans_embeddings(emb, n_clusters=4, n_iters=2).toPandas().set_index("vec_id")["cid"]
    vecs = {i: np.array(v) / np.linalg.norm(v) for i, v in rows}
    thr = int(0.999 * QUANT)
    for v in vecs:
        want = any(
            int(np.floor(float(vecs[u] @ vecs[v]) * QUANT + 0.5)) >= thr
            for u in vecs if u < v and asg[u] == asg[v]
        )
        assert bool(out.loc[v, "is_semdup"]) == want, v
    # cluster assignment passes through unchanged
    assert (out["cid"] == asg).all()
    # a cap below every cluster size suppresses ALL pair generation
    capped = semdedup(emb, n_clusters=4, n_iters=2, threshold=0.999,
                      max_cluster_size=1).toPandas()
    assert capped["is_semdup"].sum() == 0
    assert len(capped) == len(rows)  # capped members keep their assignment row


def test_importance_weights_prefer_target_slice(spark):
    """DSIR law: docs sharing the target slice's n-grams weigh higher
    than out-of-slice docs; short/empty docs get zero rows-contrib."""
    from org_rdkit_lucene_spark.functions.text import importance_weights

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox sleeps under the old tree", "en"),
        (2, "a quick brown fox jumps over a lazy dog today", "fr"),  # en-like text
        (3, "der hund und die katze und das haus hier bleibt", "de"),
        (4, "le chat est dans la maison et les arbres hauts", "fr"),
        (5, "x", "en"),  # 1 token < bigram n -> no grams
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = (
        importance_weights(docs, target_langs=("en",))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == 6
    assert out.loc[5, "n_grams"] == 0 and out.loc[5, "weight_q"] == 0
    # en-vocabulary docs (incl. the mislabeled en-like doc 2) outrank
    # the de/fr-vocabulary docs
    assert min(out.loc[[0, 1, 2], "weight_q"]) > max(out.loc[[3, 4], "weight_q"])
    # determinism: second run bit-identical
    again = (
        importance_weights(docs, target_langs=("en",))
        .toPandas().set_index("doc_id").sort_index()
    )
    assert (again["weight_q"] == out["weight_q"]).all()


def test_lm_perplexity_prefers_frequent_bigrams(spark):
    """Bigram-LM law: docs made of corpus-frequent bigrams score a
    lower per-bigram NLL than a doc of one-off bigrams; gram-free docs
    get (0, 0); repeat runs are bit-identical."""
    from org_rdkit_lucene_spark.functions.text import lm_perplexity_scores

    common = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, common, "en"),
        (1, common, "en"),
        (2, common, "en"),
        (3, "zork blart quux fnord glorp wibble snark jabber", "en"),
        (4, "w", "en"),  # single token -> no bigrams
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    out = lm_perplexity_scores(docs).toPandas().set_index("doc_id").sort_index()
    assert out.loc[4, "n_bigrams"] == 0 and out.loc[4, "nll_q"] == 0
    per = out["nll_q"] / out["n_bigrams"].replace(0, 1)
    assert per.loc[0] == per.loc[1] == per.loc[2]
    assert per.loc[0] < per.loc[3]  # frequent bigrams -> lower NLL
    again = lm_perplexity_scores(docs).toPandas().set_index("doc_id").sort_index()
    assert (again["nll_q"] == out["nll_q"]).all()


def test_duplicate_spans_merge_law(spark):
    """ExactSubstr span law: overlapping/adjacent duplicate 8-token
    windows merge into one maximal span; unique text yields no rows;
    within-doc repeats count toward min_df; positions are 0-based with
    exclusive span_end."""
    from org_rdkit_lucene_spark.operators.dedup import duplicate_spans

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    uniq0 = "one two three four five six seven eight nine ten"
    uniq1 = "red orange yellow green blue indigo violet umber ochre teal"
    rows = [
        # doc 0: boiler at offset 0 (10 tokens -> windows 0..2 merge)
        (0, boiler + " " + uniq0),
        (1, uniq1 + " " + boiler),  # boiler at offset 10
        (2, "lone words nothing shared here at all everything distinct"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = duplicate_spans(docs, k=8, min_df=2).toPandas()
    out = out.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert set(out["doc_id"]) == {0, 1}
    d0 = out[out.doc_id == 0].iloc[0]
    # boiler = 10 tokens -> dup windows at pos 0,1,2 merge to [0, 10)
    assert (d0.span_start, d0.span_end, d0.n_windows) == (0, 10, 3)
    d1 = out[out.doc_id == 1].iloc[0]
    assert (d1.span_start, d1.span_end, d1.n_windows) == (10, 20, 3)
    # within-doc repetition alone reaches min_df=2
    solo = spark.createDataFrame(pd.DataFrame(
        [(7, boiler + " filler " + boiler)], columns=["doc_id", "text"]))
    out2 = duplicate_spans(solo, k=8, min_df=2).toPandas()
    assert len(out2) >= 1 and set(out2["doc_id"]) == {7}
    again = duplicate_spans(docs, k=8, min_df=2).toPandas()
    again = again.sort_values(["doc_id", "span_start"]).reset_index(drop=True)
    assert again.equals(out)


def test_token_budget_mix_law(spark):
    """Mix law: per-stratum budgets honored with INCLUSIVE running
    totals in (md5(text), doc_id) order; strata missing from weights
    keep nothing; every input doc appears exactly once."""
    from org_rdkit_lucene_spark.functions.text import token_budget_mix

    rows = [
        (0, "a b c d", "en"),       # 4 tokens each
        (1, "e f g h", "en"),
        (2, "i j k l", "en"),
        (3, "m n o p", "fr"),
        (4, "q r s t", "xx"),       # stratum not in weights
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    out = (
        token_budget_mix(docs, {"en": 0.8, "fr": 0.2}, 10)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert len(out) == 5
    # en budget = 8 -> exactly two 4-token docs fit (md5 order decides which)
    en = out[out.stratum == "en"]
    assert en["kept"].sum() == 2
    kept_cums = sorted(en[en.kept]["cum_tokens"])
    assert kept_cums == [4, 8]
    # fr budget = 2 < 4 tokens -> nothing kept (inclusive law)
    assert not out.loc[3, "kept"]
    assert not out.loc[4, "kept"]  # missing stratum -> budget 0
    again = (
        token_budget_mix(docs, {"en": 0.8, "fr": 0.2}, 10)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert (again["kept"] == out["kept"]).all()


def test_length_quantiles_nearest_rank_law(spark):
    """Exact nearest-rank quantiles: value at 0-based rank
    floor(q*(n-1)) in (n_tokens, doc_id) order — checked against a
    hand-computed stratum."""
    from org_rdkit_lucene_spark.functions.text import length_quantiles

    rows = [(i, " ".join(["tok"] * (i + 1)), "en") for i in range(10)]  # 1..10 tokens
    rows += [(100, "a b c", "fr")]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    out = (
        length_quantiles(docs, qs=(0.5, 0.9))
        .toPandas().set_index("stratum").sort_index()
    )
    # en: n=10, sorted lengths 1..10; p50 -> rank floor(.5*9)=4 -> 5;
    # p90 -> rank floor(.9*9)=8 -> 9
    assert out.loc["en", "n_docs"] == 10
    assert out.loc["en", "p50"] == 5 and out.loc["en", "p90"] == 9
    # single-doc stratum: every quantile is that doc's length
    assert out.loc["fr", "p50"] == 3 and out.loc["fr", "p90"] == 3


def test_remove_duplicate_spans_cut_law(spark):
    """The ExactSubstr CUT step: covered positions drop, survivors keep
    order; a fully-duplicated doc keeps nothing (sha256(''))."""
    import hashlib

    from org_rdkit_lucene_spark.operators.dedup import remove_duplicate_spans

    boiler = "alpha bravo charlie delta echo foxtrot golf hotel"  # exactly 8 tokens
    rows = [
        (0, boiler + " tail one two"),
        (1, boiler),                      # fully covered -> nothing kept
        (2, "all unique words here nothing shared at all ok"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = (
        remove_duplicate_spans(docs, k=8, min_df=2)
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[0, "n_tokens"] == 11 and out.loc[0, "n_tokens_kept"] == 3
    assert out.loc[0, "kept_sha256"] == hashlib.sha256(b"tail one two").hexdigest()
    assert out.loc[1, "n_tokens_kept"] == 0
    assert out.loc[1, "kept_sha256"] == hashlib.sha256(b"").hexdigest()
    assert out.loc[2, "n_tokens_kept"] == out.loc[2, "n_tokens"]


def test_training_mix_pipeline_precedence(spark):
    """Composed pipeline law: dup > lang > quality > budget > keep,
    and the budget stage sees ONLY curation survivors."""
    from org_rdkit_lucene_spark.functions.text import training_mix_pipeline

    good = "the quick brown fox and the lazy dog in a field of dreams " * 4
    rows = [
        (0, good, "en"),
        (1, good, "en"),                      # exact dup of 0 -> 'dup'
        (2, "el los las una y es que bueno " * 8, "es"),  # -> 'lang'
        # English-detectable (stopword present) but punctuation-heavy
        # and short -> fails the quality threshold, not the lang gate
        (3, "the @@@@@@@@ ######## !!!!!!!! %%%%%%%% ^^^^^^^^", "en"),
        (4, good + " extra tokens here", "en"),
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    out = (
        training_mix_pipeline(
            docs, {"en": 1.0}, budget_tokens=60,
            langs=("en",), min_quality_q=500_000,
        )
        .toPandas().set_index("doc_id").sort_index()
    )
    assert out.loc[1, "reason"] == "dup"
    assert out.loc[2, "reason"] == "lang"
    assert out.loc[3, "reason"] == "quality"
    # docs 0 and 4 survive curation; budget 60 fits one ~48-token doc
    surv = out.loc[[0, 4]]
    assert set(surv["reason"]) == {"keep", "budget"}
    assert (out["kept"] == (out["reason"] == "keep").astype(int)).all()


def test_ivfpq_exact_in_the_limit(spark):
    """IVF-PQ law: with n_candidates >= corpus size the exact re-rank
    covers everything, so the result equals brute-force cosine top-k;
    with a small candidate budget, recall@k stays useful (>0.5)."""
    import numpy as np
    from pyspark.sql import types as T

    from org_rdkit_lucene_spark.operators.ann import cosine_topk, ivfpq_cosine_topk

    rng = np.random.default_rng(9)
    vecs = [(i, rng.standard_normal(16).tolist()) for i in range(120)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(vecs, schema)
    queries = [(0, vecs[0][1]), (5, vecs[5][1])]
    want = cosine_topk(emb, queries, k=10).toPandas()
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = ivfpq_cosine_topk(
        emb, queries, k=10, m=4, n_centroids=8, n_iters=2, n_candidates=500
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.equals(want)
    small = ivfpq_cosine_topk(
        emb, queries, k=10, m=4, n_centroids=8, n_iters=2, n_candidates=30
    ).toPandas()
    for qid in (0, 5):
        w = set(want[want.query_id == qid]["vec_id"])
        g = set(small[small.query_id == qid]["vec_id"])
        assert len(w & g) / len(w) > 0.5


def test_lsh_multiprobe_recall_monotone(spark):
    """Multiprobe law: probe_hamming=0 candidates are a subset of
    probe_hamming=1's for every query, and recall vs exact brute force
    weakly improves with the probe radius."""
    rng = np.random.default_rng(4)
    base = rng.standard_normal((300, 16))
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(300), "embedding": [v.tolist() for v in base]})
    )
    q = [(0, base[0].tolist()), (9, base[9].tolist())]
    exact = cosine_topk(emb, q, k=10).toPandas()
    r = {}
    prev_hits = None
    for ph in (0, 1, 2):
        got = lsh_cosine_topk(emb, q, k=10, n_planes=8, probe_hamming=ph).toPandas()
        hits = sum(
            len(set(got[got.query_id == qid]["vec_id"])
                & set(exact[exact.query_id == qid]["vec_id"]))
            for qid in (0, 9)
        )
        r[ph] = hits
        if prev_hits is not None:
            assert hits >= prev_hits
        prev_hits = hits
    assert r[2] > r[0]  # wider probes must actually add recall here


def test_pq_persisted_identity(spark, tmp_path):
    """build_pq -> load -> search must be bit-identical to the
    in-memory ivfpq (codes exact ints; codebooks round-trip exactly
    through JSON float64 repr)."""
    from pyspark.sql import types as T

    from org_rdkit_lucene_spark.operators.ann import (
        build_pq,
        ivfpq_cosine_topk,
        pq_cosine_topk,
    )

    rng = np.random.default_rng(11)
    vecs = [(i, rng.standard_normal(16).tolist()) for i in range(90)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(vecs, schema)
    q = [(2, vecs[2][1]), (7, vecs[7][1])]
    want = ivfpq_cosine_topk(
        emb, q, k=8, m=4, n_centroids=8, n_iters=2, n_candidates=32
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    d = str(tmp_path / "pq")
    build_pq(emb, d, m=4, n_centroids=8, n_iters=2)
    got = pq_cosine_topk(
        emb, d, q, k=8, n_candidates=32
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.equals(want)


def test_ivfpq_default_recall_floor(spark):
    """The SHIPPED IVF-PQ defaults must clear recall@10 >= 0.9 vs exact
    brute force (round-3 defaults measured 0.675 — correct by the
    identity law but not recommendable). 600 random vectors, 8 held-out
    corpus queries, deterministic seed."""
    from pyspark.sql import types as T

    from org_rdkit_lucene_spark.operators.ann import cosine_topk, ivfpq_cosine_topk

    rng = np.random.default_rng(17)
    vecs = [(i, rng.standard_normal(32).tolist()) for i in range(600)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    emb = spark.createDataFrame(vecs, schema)
    q = [(i, vecs[i][1]) for i in range(0, 80, 10)]
    exact = cosine_topk(emb, q, k=10).toPandas()
    approx = ivfpq_cosine_topk(emb, q, k=10).toPandas()  # defaults on purpose
    hits = tot = 0
    for qid, g in exact.groupby("query_id"):
        want = set(g["vec_id"])
        hits += len(want & set(approx[approx.query_id == qid]["vec_id"]))
        tot += len(want)
    assert hits / tot >= 0.9, f"recall@10 {hits/tot:.3f} under the 0.9 floor"
