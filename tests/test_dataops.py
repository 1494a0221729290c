"""Training-data pipeline ops over the driver testdata tables."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_text_features(spark, documents):
    from openmldb_spark.operators.text import with_text_features

    out = with_text_features(documents).toPandas()
    assert (out["n_chars"] == out["text"].str.len()).all()
    exp_tokens = out["text"].str.strip().str.split(r"\s+").map(
        lambda t: 0 if t == [""] else len(t)
    )
    assert (out["n_tokens"] == exp_tokens).all()
    assert out["quality_score"].between(0, 1).all()
    assert out["fingerprint"].str.len().eq(32).all()
    assert set(out["lang_guess"]) <= {"en", "es", "de", "fr", "und"}


def test_exact_dedup(spark, documents):
    from openmldb_spark.operators.dedup import exact_dedup

    dup = documents.union(documents.limit(50))  # inject exact dups
    out = exact_dedup(dup, "text", "doc_id", normalized=False)
    pdf = out.toPandas()
    assert pdf["text"].is_unique or pdf.groupby("text").size().max() == 1
    # survivor is always the min doc_id of its text group
    src = dup.toPandas()
    exp = src.groupby("text")["doc_id"].min().sort_values()
    assert sorted(pdf["doc_id"]) == sorted(exp)


def test_minhash_finds_injected_near_dups(spark, documents):
    from openmldb_spark.operators.dedup import minhash_dedup, ngram_jaccard_pairs

    # build near-dups: copy 5 docs with one appended token
    base = documents.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing")).alias("text"),
    )
    both = documents.select("doc_id", "text").union(base)
    pairs = minhash_dedup(both, num_hashes=32, bands=16, jaccard_threshold=0.5).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for i in range(5):
        orig = documents.toPandas().iloc[i]["doc_id"] if False else None
    origs = [r["doc_id"] for r in documents.limit(5).collect()]
    hits = sum((o, o + 100000) in found for o in origs)
    assert hits >= 4, f"minhash missed near-dups: {found}"
    # jaccard values agree with the exact operator
    exact = ngram_jaccard_pairs(both, threshold=0.5).toPandas()
    em = {(r.id_a, r.id_b): r.jaccard for r in exact.itertuples()}
    for r in pairs.itertuples():
        if (r.id_a, r.id_b) in em:
            assert abs(r.jaccard - em[(r.id_a, r.id_b)]) < 1e-9


def test_simhash_dedup(spark, documents):
    from openmldb_spark.operators.dedup import simhash_dedup

    base = documents.limit(3).select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )
    both = documents.select("doc_id", "text").union(base)
    pairs = simhash_dedup(both, max_hamming=3).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    origs = [r["doc_id"] for r in documents.limit(3).collect()]
    for o in origs:
        assert (o, o + 100000) in found
    assert (pairs.hamming <= 3).all()


def test_cosine_topk_matches_numpy(spark, embeddings):
    from openmldb_spark.operators.similarity import cosine_topk

    qpdf = embeddings.limit(3).toPandas()
    queries = spark.createDataFrame(
        qpdf.rename(columns={"vec_id": "query_id", "embedding": "query_vec"})[
            ["query_id", "query_vec"]
        ]
    )
    got = cosine_topk(embeddings, queries, k=5).toPandas()

    corpus = embeddings.toPandas()
    M = np.stack(corpus["embedding"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for _, qr in qpdf.iterrows():
        qv = np.array(qr["embedding"], dtype=float)
        cos = Mn @ (qv / np.linalg.norm(qv))
        order = np.lexsort((corpus["vec_id"].to_numpy(), -cos))
        exp_ids = corpus["vec_id"].to_numpy()[order][:5].tolist()
        g = got[got.query_id == qr["vec_id"]].sort_values("rank")
        assert g["vec_id"].tolist() == exp_ids
        assert np.allclose(sorted(g["cosine"]), sorted(cos[order][:5]), atol=1e-9)


def test_lsh_topk_recall(spark, embeddings):
    from openmldb_spark.operators.similarity import cosine_topk, lsh_topk

    qpdf = embeddings.limit(5).toPandas()
    queries = spark.createDataFrame(
        qpdf.rename(columns={"vec_id": "query_id", "embedding": "query_vec"})[
            ["query_id", "query_vec"]
        ]
    )
    exact = cosine_topk(embeddings, queries, k=1).toPandas()
    approx = lsh_topk(embeddings, queries, k=1, n_planes=6, n_probes=4).toPandas()
    # self-match (cosine=1) must always be found: it shares the bucket
    hits = 0
    for qid in qpdf["vec_id"]:
        a = approx[approx.query_id == qid]
        if len(a) and a.iloc[0]["vec_id"] == exact[exact.query_id == qid].iloc[0]["vec_id"]:
            hits += 1
    assert hits == len(qpdf)


def test_embedding_cosine_dedup(spark, embeddings):
    from openmldb_spark.operators.dedup import embedding_cosine_dedup

    dup = embeddings.limit(4).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    both = embeddings.select("vec_id", "embedding").union(dup)
    pairs = embedding_cosine_dedup(both, threshold=0.999).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    origs = [r["vec_id"] for r in embeddings.limit(4).collect()]
    for o in origs:
        assert (o, o + 100000) in found, f"missed exact-dup pair for {o}"


def test_multimodal_stub_pipeline(spark):
    from openmldb_spark.operators.multimodal import (
        attach_media_meta,
        decode_image_features,
        sample_frames,
    )

    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "kind": ["image", "image", "video"],
            "duration_ms": [0, 0, 3500],
            "payload": [b"aaa", b"bbbb", None],
        }
    )
    df = spark.createDataFrame(pdf)
    meta = attach_media_meta(df).toPandas()
    assert meta["payload_bytes"].tolist() == [3, 4, None] or meta["payload_bytes"].fillna(-1).tolist() == [3, 4, -1]

    feats = decode_image_features(df, out_dim=8).toPandas()
    assert len(feats) == 3
    byid = {r.media_id: (None if r.feature is None else list(r.feature)) for r in feats.itertuples()}
    assert byid[3] is None
    assert len(byid[1]) == 8 and byid[1] != byid[2]
    # determinism
    feats2 = decode_image_features(df, out_dim=8).toPandas()
    byid2 = {r.media_id: (None if r.feature is None else list(r.feature)) for r in feats2.itertuples()}
    assert byid[1] == byid2[1]

    frames = sample_frames(df.filter("kind='video'"), every_ms=1000).toPandas()
    assert frames["frame_ts_ms"].tolist() == [0, 1000, 2000, 3000]


def test_multimodal_decode_real_or_stub():
    """_decode_one prefers a real PIL decode when the library is
    present and the payload is a valid image; otherwise (no PIL, or
    undecodable bytes) it falls back to the deterministic stub — the
    test passes in both environments."""
    from openmldb_spark.operators.multimodal import (
        _decode_one,
        _pil_decode,
        _stub_decode,
    )

    # garbage bytes: never a decodable image → always the stub
    garbage = b"not-an-image"
    assert _pil_decode(garbage, 8) is None
    assert list(_decode_one(garbage, 8)) == list(_stub_decode(garbage, 8))

    try:
        import io

        from PIL import Image
    except ImportError:
        import pytest

        pytest.skip("PIL not installed: real-decode path not exercisable "
                    "here (stub fallback verified above)")
    buf = io.BytesIO()
    Image.new("L", (4, 4), color=128).save(buf, format="PNG")
    png = buf.getvalue()
    real = _decode_one(png, 8)
    assert len(real) == 8
    assert all(abs(v - 128 / 255.0) < 1e-6 for v in real)


def test_minhash_degenerate_bucket_capped(spark):
    """A viral bucket (many identical docs) must not go quadratic: the
    bucket cap drops it from the band join while distinct near-dups in
    healthy buckets are still found."""
    from openmldb_spark.operators.dedup import minhash_dedup

    viral = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do") for i in range(300)]
    near = [
        (1000, "the quick brown fox jumps over the lazy dog in the morning sun"),
        (1001, "the quick brown fox jumps over the lazy dog in the evening sun"),
    ]
    df = spark.createDataFrame(viral + near, "doc_id long, text string")
    pairs = minhash_dedup(df, "text", "doc_id", num_hashes=32, bands=8,
                          jaccard_threshold=0.5, max_bucket_size=50).toPandas()
    # the viral block's candidate pairs were capped away entirely...
    assert not ((pairs.id_a < 1000) & (pairs.id_b < 1000)).any()
    # ...while the healthy near-dup pair survives
    assert ((pairs.id_a == 1000) & (pairs.id_b == 1001)).any()


def test_cosine_topk_query_cap_guard(spark, embeddings):
    """cosine_topk is exact brute force; oversized query sets must be
    rejected with a pointer to lsh_topk (VERDICT r4 #6)."""
    import pytest
    from pyspark.sql import functions as F

    from openmldb_spark.operators.similarity import cosine_topk

    queries = embeddings.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    with pytest.raises(ValueError, match="lsh_topk"):
        cosine_topk(embeddings, queries, k=1, max_queries=3)
    # opt-out still works
    assert cosine_topk(embeddings.limit(20),
                       queries.limit(5), k=1, max_queries=None).count() == 5
