"""Training-data pipeline operators: ANN, multimodal plumbing, word-cooc."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from productbert_intermediate_spark.operators.ann import brute_force_topk, lsh_topk
from productbert_intermediate_spark.operators.multimodal import (
    decode_image_stub,
    extract_image_features,
    frame_sample_plan,
)
from productbert_intermediate_spark.operators.wordcooc import (
    build_vocabulary,
    class_ratio,
    wordcooc_features,
)

from tests.conftest import TESTDATA_SF_DIR as SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def _queries(emb, n=5):
    return (
        emb.where(F.col("vec_id") < n)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )


def test_brute_force_topk_matches_numpy_oracle(spark, emb):
    k = 10
    got = brute_force_topk(emb, _queries(emb), k=k).toPandas()
    pdf = emb.toPandas()
    mat = np.vstack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    norms = np.linalg.norm(mat, axis=1)
    for qid in range(5):
        qvec = mat[ids == qid][0]
        cos = mat @ qvec / (norms * np.linalg.norm(qvec))
        order = sorted(zip(-cos, ids))[:k]
        want = [int(i) for _, i in order]
        g = got[got["query_id"] == qid].sort_values("rank")["vec_id"].tolist()
        assert g == want, qid


def test_lsh_topk_recall_vs_bruteforce(spark, emb):
    """LSH recall must far exceed the random-candidate baseline.

    The driver's synthetic embeddings are near-isotropic (weak neighborhood
    structure), which bounds any LSH family's absolute top-k recall; the
    meaningful property is lift over random candidate selection of the same
    size. With 4 tables × 5 bits × multiprobe the candidate set is ~25-40%
    of this 500-vector corpus → random recall ≈ 0.3; we require ≥ 0.35 avg
    and positive recall for every query.
    """
    k = 10
    exact = brute_force_topk(emb, _queries(emb), k=k).toPandas()
    approx = lsh_topk(emb, _queries(emb), k=k, dim=64).toPandas()
    recalls = []
    for qid in range(5):
        want = set(exact[exact["query_id"] == qid]["vec_id"])
        have = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(want & have) / len(want))
    assert sum(recalls) / len(recalls) >= 0.35, recalls
    assert all(r > 0 for r in recalls), recalls
    # the query itself (cosine 1.0) must always be found
    self_hits = approx[approx["vec_id"] == approx["query_id"]]
    assert len(self_hits) == 5


def test_lsh_topk_deterministic(spark, emb):
    a = sorted(map(tuple, lsh_topk(emb, _queries(emb), k=5).collect()))
    b = sorted(map(tuple, lsh_topk(emb, _queries(emb), k=5).collect()))
    assert a == b


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"abc")


def test_extract_image_features_plumbing(spark):
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(50)]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    out = extract_image_features(media, batch_partitions=4).toPandas()
    assert len(out) == 50
    assert set(out.columns) == {
        "media_id", "n_bytes", "width", "height", "channel_means", "digest",
    }
    assert (out["n_bytes"] == out["media_id"] + 100).all()
    assert out["width"].between(64, 255).all()
    assert out["channel_means"].map(len).eq(3).all()
    # determinism
    out2 = extract_image_features(media, batch_partitions=4).toPandas()
    assert out.sort_values("media_id").reset_index(drop=True).equals(
        out2.sort_values("media_id").reset_index(drop=True)
    )


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        [(1, b"x" * 5000), (2, b"y" * 100)], "media_id long, payload binary"
    )
    got = frame_sample_plan(media, every_n=2).toPandas()
    f1 = got[got["media_id"] == 1]["frame_index"].tolist()
    assert f1 == [0, 2, 4]  # 5000 bytes → 5 frames (0..4), step 2
    f2 = got[got["media_id"] == 2]["frame_index"].tolist()
    assert f2 == [0]


def test_vocabulary_and_wordcooc(spark):
    pairs = spark.createDataFrame(
        [
            ("red fast car", "red slow car"),
            ("green bike", "green bike fast"),
            ("one-off text", "totally different"),
        ],
        "text_left string, text_right string",
    )
    vocab = build_vocabulary(
        pairs.select(F.col("text_left").alias("text")).unionAll(
            pairs.select(F.col("text_right").alias("text"))
        ),
        min_df=2,
    )
    vocab_set = {r["token"] for r in vocab.collect()}
    # df ≥ 2 over the 6 strings
    assert "red" in vocab_set and "car" in vocab_set and "green" in vocab_set
    assert "one-off" not in vocab_set

    feats = wordcooc_features(pairs).toPandas().sort_values("text_left")
    by_left = dict(zip(feats["text_left"], feats["cooc_count"]))
    assert by_left["red fast car"] == 2  # red, car (fast df≥2 but not shared? fast appears in both sides rows 1&2 → df=2; shared only left)
    assert by_left["green bike"] == 2  # green, bike
    assert by_left["one-off text"] == 0


def test_class_ratio(spark):
    labeled = spark.createDataFrame(
        [(1,)] * 10 + [(0,)] * 31, "label int"
    )
    assert class_ratio(labeled) == 3


def test_embedding_neardup_subset_of_bruteforce_with_recall(spark, emb):
    """embedding_neardup emits only true cosine>=t pairs (verify step is
    exact) and its LSH-bucket prefilter keeps a usable fraction of them."""
    from productbert_intermediate_spark.plans.testdata_queries import (
        _NEARDUP_THRESHOLD,
        q_embedding_neardup_pairs,
    )

    got = {
        (r.vec_a, r.vec_b)
        for r in q_embedding_neardup_pairs(spark, SF_DIR).collect()
    }

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    cos = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), k=1)
    mask = cos[iu, ju] >= _NEARDUP_THRESHOLD
    truth = {
        (min(a, b), max(a, b))
        for a, b in zip(ids[iu[mask]], ids[ju[mask]])
    }

    assert got, "bucketed near-dup join found no pairs"
    assert got <= truth, "emitted a pair below the cosine threshold"
    # 4 bands x 4 bits at cos 0.4 keeps ~half the true pairs; well above
    # the floor asserted here, which only guards against a broken prefilter.
    assert len(got) / len(truth) >= 0.25


def _media_df(spark, n=20):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(n)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
    )


def test_resize_images_plumbing(spark):
    from productbert_intermediate_spark.operators.multimodal import resize_images

    media = _media_df(spark)
    out = resize_images(media, target=(128, 96)).collect()
    assert len(out) == 20
    assert all(r.out_width == 128 and r.out_height == 96 for r in out)
    # deterministic: identical input bytes + target → identical output
    again = {r.media_id: r.payload for r in resize_images(media, target=(128, 96)).collect()}
    assert {r.media_id: r.payload for r in out} == again
    # target participates in the output payload (a resize, not a copy)
    other = {r.media_id: r.payload for r in resize_images(media, target=(64, 64)).collect()}
    assert all(other[r.media_id] != r.payload for r in out)


def test_audio_features_plumbing(spark):
    from productbert_intermediate_spark.operators.multimodal import (
        decode_audio_stub,
        extract_audio_features,
    )

    media = _media_df(spark)
    out = extract_audio_features(media).collect()
    assert len(out) == 20
    for r in out:
        assert r.sample_rate in (8000, 16000, 22050, 44100)
        assert r.duration_s == pytest.approx(r.n_bytes / r.sample_rate)
        assert 0.0 <= r.rms <= 1.0
    with pytest.raises(NotImplementedError):
        decode_audio_stub(b"xx", fake=False)


def test_mlm_mask_rates_and_hand_computed_rows(spark):
    """Independent check of mlm_mask (the DuckDB oracle shares the md5
    construction, so it can't catch a wrong constant): empirical 15% /
    80-10-10 rates over the corpus, plus per-row agreement with a hashlib
    re-derivation of the draw for every token of one document."""
    import hashlib as _hl

    from productbert_intermediate_spark.plans.testdata_queries import (
        _MLM_RANDOM_VOCAB,
        q_mlm_mask,
    )

    rows = q_mlm_mask(spark, SF_DIR).collect()
    n = len(rows)
    targets = [r for r in rows if r.is_target == 1]
    assert abs(len(targets) / n - 0.15) < 0.01
    masked = sum(1 for r in targets if r.masked_token == "[MASK]")
    unchanged = sum(1 for r in targets if r.masked_token == r.token)
    randomed = len(targets) - masked - unchanged
    assert abs(masked / len(targets) - 0.80) < 0.03
    # "unchanged" includes random draws that happen to hit the original
    # token, so allow a little asymmetry around 0.10
    assert abs(randomed / len(targets) - 0.10) < 0.03
    assert abs(unchanged / len(targets) - 0.10) < 0.03
    assert all(
        r.masked_token in (_MLM_RANDOM_VOCAB + ["[MASK]", r.token])
        for r in targets
    )
    # non-targets pass through untouched
    assert all(r.masked_token == r.token for r in rows if r.is_target == 0)

    # hand-derive every draw for one document with hashlib alone
    doc = [r for r in rows if r.doc_id == 0]
    for r in doc:
        h = _hl.md5(f"{r.doc_id}:{r.pos}:mlm".encode()).hexdigest()
        u_target = int(h[0:8], 16) / 2**32
        u_action = int(h[8:16], 16) / 2**32
        if u_target >= 0.15:
            assert (r.is_target, r.masked_token) == (0, r.token)
        elif u_action < 0.80:
            assert (r.is_target, r.masked_token) == (1, "[MASK]")
        elif u_action < 0.90:
            expect = _MLM_RANDOM_VOCAB[int(h[16], 16)]
            assert (r.is_target, r.masked_token) == (1, expect)
        else:
            assert (r.is_target, r.masked_token) == (1, r.token)


def test_ivf_topk_full_probe_equals_brute_force(spark, emb):
    """Probing every cell makes IVF exact: the re-rank is exact cosine, so
    candidates == corpus ⇒ identical (query_id, vec_id, rank) rows."""
    from productbert_intermediate_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
    )

    q = _queries(emb, n=4)
    exact = {tuple(r) for r in brute_force_topk(emb, q, k=8).collect()}
    full = {
        tuple(r)
        for r in ivf_topk(emb, q, k=8, n_centroids=8, n_probe=8, n_iters=3).collect()
    }
    assert full == exact


def test_ivf_topk_recall_and_determinism(spark, emb):
    from productbert_intermediate_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    q = _queries(emb, n=5)
    exact = {
        (r.query_id, r.vec_id) for r in brute_force_topk(emb, q, k=10).collect()
    }
    cents = train_ivf_centroids(emb, n_centroids=16, n_iters=4)
    got1 = ivf_topk(emb, q, k=10, n_probe=4, centroids=cents).collect()
    got2 = ivf_topk(emb, q, k=10, n_probe=4, centroids=cents).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))
    hits = {(r.query_id, r.vec_id) for r in got1}
    recall = len(hits & exact) / len(exact)
    # 4-of-16 cells probed: the dial is recall-vs-cost; assert a usable
    # floor well above the 0.25 a uniform random cell subset would give.
    assert recall >= 0.5
    # retraining from scratch reproduces the same centroids bit-for-bit
    cents2 = train_ivf_centroids(emb, n_centroids=16, n_iters=4)
    assert (cents == cents2).all()


def test_ivf_topk_corpus_smaller_than_n_centroids(spark, emb):
    """A corpus with fewer rows than n_centroids must degrade to one cell
    per row, not crash with a shape mismatch in the Lloyd update."""
    from productbert_intermediate_spark.operators.ann import (
        brute_force_topk,
        ivf_topk,
    )

    tiny = emb.where(F.col("vec_id") < 10)
    q = _queries(tiny, n=2)
    # every cell probed (n_probe >= actual cells) → must equal brute force
    got = {
        tuple(r)
        for r in ivf_topk(
            tiny, q, k=5, n_centroids=16, n_probe=16, n_iters=2
        ).collect()
    }
    exact = {tuple(r) for r in brute_force_topk(tiny, q, k=5).collect()}
    assert got == exact
