import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators import dedup as dd
from emiproc_spark.operators import similarity as sim
from emiproc_spark.operators.multimodal import (
    attach_binary,
    decode_image,
    extract_features,
    frame_sample,
)
from emiproc_spark.operators.text import quality_features


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over a lazy dog"),  # near dup
        (3, "completely different text with other words entirely here now"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = dd.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_doc_id"] == 0


def test_ngram_jaccard(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == pytest.approx(1.0)
    assert 0.3 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_minhash_lsh(docs):
    sigs = dd.minhash_signatures(docs, k=8)
    cands = {(r["doc_a"], r["doc_b"]) for r in dd.lsh_candidate_pairs(sigs).collect()}
    assert (0, 1) in cands  # identical docs always collide
    assert (0, 3) not in cands


def test_verify_candidate_pairs(spark, docs):
    # seed candidates with a band-collision false positive (0,3): the
    # exact-Jaccard confirm must keep the true pairs and drop it
    cands = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "doc_a long, doc_b long"
    )
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           dd.verify_candidate_pairs(docs, cands, threshold=0.3).collect()}
    assert out[(0, 1)] == pytest.approx(1.0)
    assert 0.3 <= out[(0, 2)] < 1.0
    assert (0, 3) not in out
    # agrees with the full self-join on the surviving pairs
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
            dd.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    for k, v in out.items():
        assert full[k] == pytest.approx(v)
    with pytest.raises(ValueError, match="threshold"):
        dd.verify_candidate_pairs(docs, cands, threshold=0.0)
    # duplicated input pairs must not double-count common shingles
    dup_cands = cands.unionByName(cands)
    out2 = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
            dd.verify_candidate_pairs(docs, dup_cands, threshold=0.3).collect()}
    assert out2 == pytest.approx(out)


def test_simhash_and_hamming(docs):
    fp = dd.simhash(docs)
    rows = {r["doc_id"]: r["simhash_bits"] for r in fp.collect()}
    assert all(len(b) == 64 for b in rows.values())
    assert rows[0] == rows[1]
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in
             dd.hamming_pairs(fp, max_distance=3).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs


def test_dedup_keep_first(docs):
    sigs = dd.minhash_signatures(docs, k=8)
    pairs = dd.lsh_candidate_pairs(sigs)
    kept = dd.dedup_keep_first(docs, pairs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 0 in ids and 1 not in ids and 3 in ids


def test_cosine_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    top = sim.cosine_topk(emb, [1.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in top] == [0, 1]
    assert top[0]["cos"] == pytest.approx(1.0)


def test_knn_join(spark):
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    out = sim.knn_join(emb.where(F.col("vec_id") == 0), emb, k=2).collect()
    assert len(out) == 2
    assert out[0]["neighbor_id"] == 0  # self is nearest


def test_ann_topk_contains_self(spark):
    import random

    random.seed(7)
    rows = [(i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(50)]
    emb = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    q = rows[5][1]
    top = sim.ann_topk(emb, q, dim=16, k=5, planes=4).collect()
    assert top and top[0]["vec_id"] == 5  # query's own bucket contains it, cos=1


def test_quality_features(docs):
    out = quality_features(docs).collect()[0]
    assert out["n_tokens"] == 9
    assert out["stopword_ratio"] == pytest.approx(2 / 9)  # 'the' twice


def test_multimodal_stub(spark, docs):
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)
    media = attach_binary(docs)
    feats = {r["doc_id"]: r for r in extract_features(media, fake=True).collect()}
    assert feats[0]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert feats[0]["checksum"] == feats[1]["checksum"]
    frames = frame_sample(media, every_n_bytes=16)
    assert frames.where(F.col("doc_id") == 0).count() == 3  # 43 bytes → offsets 0,16,32
    # empty and NULL payloads have no frames; bad stride raises
    degenerate = spark.createDataFrame(
        [(100, b""), (101, None)], "doc_id long, payload binary"
    )
    assert frame_sample(degenerate, every_n_bytes=16).count() == 0
    with pytest.raises(ValueError, match="every_n_bytes"):
        frame_sample(media, every_n_bytes=0)


def test_resize_image():
    import numpy as np

    from emiproc_spark.operators.multimodal import resize_image

    img = np.arange(24 * 24, dtype=np.uint8).reshape(24, 24)
    small = resize_image(img, 10, 6)
    assert small.shape == (10, 6)
    # exact integer lattice: (r*24)//10 rows, (c*24)//6 = 4c cols
    assert small[3, 2] == img[(3 * 24) // 10, 8]
    # upscale repeats pixels; identity is exact
    assert resize_image(img, 24, 24).tolist() == img.tolist()
    big = resize_image(img, 48, 48)
    assert big.shape == (48, 48) and big[1, 1] == img[0, 0]
    # 3-channel arrays keep the channel axis
    rgb = np.stack([img, img, img], axis=-1)
    assert resize_image(rgb, 5, 5).shape == (5, 5, 3)
    with pytest.raises(ValueError, match="target"):
        resize_image(img, 0, 5)
    with pytest.raises(ValueError, match="2-D or 3-D"):
        resize_image(np.arange(5, dtype=np.uint8), 2, 2)


def test_embedding_dup_pairs(spark):
    import numpy as np

    from emiproc_spark.operators.similarity import embedding_dup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 16)).astype("float32")
    rows = [(i, [float(v) for v in base[i]]) for i in range(20)]
    # near-duplicate of vec 0 (tiny perturbation -> same bucket, cos ~1)
    rows.append((100, [float(v) for v in base[0] + 1e-4]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_dup_pairs(emb, dim=16, threshold=0.99).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100) in found
    for r in pairs:
        assert r["cos"] >= 0.99


def test_ivf_assign_and_topk(spark):
    import random

    random.seed(11)
    # three well-separated clusters around axis vectors
    centers = [[5.0, 0.0, 0.0, 0.0], [0.0, 5.0, 0.0, 0.0], [0.0, 0.0, 5.0, 0.0]]
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, [v + random.uniform(-0.3, 0.3) for v in c]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # seed centroids = vec_ids 0,1,2 — one per cluster by construction
    cent = sim.ivf_seed_centroids(emb, k=3)
    assert [cid for cid, _ in cent] == [0, 1, 2]

    assigned = sim.ivf_assign(emb, cent)
    cells = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    for i in range(60):
        assert cells[i] == i % 3  # every vector lands with its cluster seed

    q = centers[1]
    top = sim.ivf_topk(emb, q, cent, k=5, nprobe=1).collect()
    assert len(top) == 5
    assert all(r["vec_id"] % 3 == 1 for r in top)  # probe scans cluster 1 only

    # exact brute-force and IVF agree on the top-5 in the probed cell
    brute = sim.cosine_topk(emb, q, k=20).collect()
    brute_in_cell = [r["vec_id"] for r in brute if r["vec_id"] % 3 == 1][:5]
    assert [r["vec_id"] for r in top] == brute_in_cell


def test_ivf_refine_moves_centroids(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = sim.ivf_seed_centroids(emb, k=2)
    refined = sim.ivf_refine(emb, cent, steps=1)
    # cell 0 absorbed vecs {0,2}, cell 1 absorbed {1,3}: centroid = mean
    assert refined[0][1] == pytest.approx([0.95, 0.05])
    assert refined[1][1] == pytest.approx([0.05, 0.95])


def test_bpe_token_count(spark):
    from emiproc_spark.operators.text import bpe_token_count, bpe_tokens

    rows = [(0, "It's 42 degrees, isn't it?"), (1, "hello   world")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["toks"], r["n"])
        for r in d.select(
            "doc_id",
            bpe_tokens(F.col("text")).alias("toks"),
            bpe_token_count(F.col("text")).alias("n"),
        ).collect()
    }
    # It|'s| 42| degrees|,| isn|'t| it|?
    assert out[0][0] == ["It", "'s", " 42", " degrees", ",", " isn", "'t", " it", "?"]
    assert out[0][1] == 9
    # hello|   |world (no-lookahead variant: \s+ is greedy, so the run of
    # spaces is one token and 'world' carries no leading space)
    assert out[1][0] == ["hello", "   ", "world"]
    assert out[1][1] == 3


def test_passage_spans_fold_tail(spark):
    from pyspark.sql import functions as F

    from emiproc_spark.operators.dedup import passage_duplicates, passage_spans

    # 25 tokens at win=10 → 2 spans: [0..9], [10..24] (tail folded)
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25)))], "doc_id long, text string"
    )
    spans = passage_spans(docs, win=10).orderBy("p_idx").collect()
    assert [r["p_idx"] for r in spans] == [0, 1]

    # two docs sharing only a 5-token tail must NOT collide: doc 2's
    # tail is folded into its (longer) final span
    base = " ".join(f"a{i}" for i in range(10))
    tail = "x1 x2 x3 x4 x5"
    d2 = spark.createDataFrame(
        [(1, tail), (2, base + " " + tail)], "doc_id long, text string"
    )
    dup = passage_duplicates(d2, win=10)
    assert dup.count() == 0

    # full-window copies are still caught across docs (both docs have
    # two spans; span 0 is the shared window)
    mid1 = " ".join(f"b{i}" for i in range(12))
    mid2 = " ".join(f"c{i}" for i in range(12))
    d3 = spark.createDataFrame(
        [(1, base + " " + mid1), (2, base + " " + mid2)],
        "doc_id long, text string",
    )
    hits = passage_duplicates(d3, win=10).collect()
    assert len(hits) == 1 and hits[0]["n_copies"] == 2


def test_knn_classify_majority_vote(spark):
    from pyspark.sql import functions as F

    from emiproc_spark.operators.similarity import knn_classify

    # corpus: label 0 clustered near +x, label 1 near +y; one noisy
    # label-1 point near +x makes the vote 4:1, not unanimous
    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0], 0), (11, [0.9, 0.1], 0), (12, [1.0, 0.1], 0),
            (13, [0.95, 0.0], 0), (14, [0.9, 0.2], 1),
            (20, [0.0, 1.0], 1), (21, [0.1, 0.9], 1), (22, [0.0, 0.9], 1),
            (23, [0.1, 1.0], 1), (24, [0.2, 0.9], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.05]), (1, [0.05, 1.0])], "vec_id long, embedding array<float>"
    )
    out = {r["query_id"]: (r["pred_label"], r["votes"])
           for r in knn_classify(q, corpus, k=5).collect()}
    assert out[0] == (0, 4)
    assert out[1] == (1, 4)


def test_lsh_bucket_cap_star_preserves_components(spark):
    """The max_bucket_size skew guard: with the star policy, oversize
    buckets produce linear star edges whose connected components match
    the uncapped all-pairs components exactly; drop removes them."""
    from pyspark.sql import functions as F

    from emiproc_spark.operators.cluster import connected_components
    from emiproc_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    # 40 identical docs (one fat bucket) + 3 small clone pairs + noise
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 40, F.lit("all these documents are the same text"))
        .when(F.col("id") < 46, F.concat(F.lit("pair text number "), ((F.col("id") - 40) / 2).cast("int").cast("string")))
        .otherwise(F.concat(F.lit("unique "), F.md5(F.col("id").cast("string"))))
        .alias("text"),
    )
    sigs = minhash_signatures(docs, k=8).localCheckpoint()
    full = lsh_candidate_pairs(sigs)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=10)
    n_full, n_capped = full.count(), capped.count()
    assert n_capped < n_full  # 40-doc bucket: 780 pairs → 39 star edges

    def comps(pairs):
        return {
            (r["node"], r["component"])
            for r in connected_components(pairs).collect()
        }

    assert comps(full) == comps(capped)

    dropped = lsh_candidate_pairs(sigs, max_bucket_size=10, oversize_policy="drop")
    assert dropped.count() < n_capped  # fat bucket contributes nothing

    with pytest.raises(ValueError, match="oversize_policy"):
        lsh_candidate_pairs(sigs, max_bucket_size=10, oversize_policy="sample")


def test_diversity_sample_one_rep_per_bucket(spark):
    from emiproc_spark.operators.sampling import diversity_sample
    from emiproc_spark.operators.similarity import lsh_buckets

    emb = spark.createDataFrame(
        [(i, [float(i % 3 == 0) * 2 - 1.0, float(i % 2) * 2 - 1.0, 0.5])
         for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = diversity_sample(emb, dim=3, planes=4).collect()
    buckets = lsh_buckets(emb, 3, 4).select("bucket").distinct().count()
    assert len(out) == buckets
    assert sum(r["n_members"] for r in out) == 30
    # keeper is the min id of its bucket
    assign = {
        r["vec_id"]: r["bucket"]
        for r in lsh_buckets(emb, 3, 4).select("vec_id", "bucket").collect()
    }
    for r in out:
        members = [v for v, b in assign.items() if b == r["bucket"]]
        assert r["keeper"] == min(members)


def test_ann_topk_multiprobe_recall(spark):
    """probe_bits=1 scans the query bucket plus all 1-bit-flip buckets:
    its candidate set strictly contains single-probe's, so recall vs the
    brute-force top-k can only improve."""
    import numpy as np

    from emiproc_spark.operators.similarity import ann_topk, cosine

    rng = [(i, [((i * 31 + j * 7) % 19 - 9) / 9.0 for j in range(8)])
           for i in range(200)]
    emb = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    q = rng[0][1]
    brute = [
        r["vec_id"]
        for r in emb.select(
            "vec_id",
            cosine(F.col("embedding"), F.array(*[F.lit(v) for v in q])).alias("cos"),
        ).orderBy(F.col("cos").desc(), "vec_id").limit(10).collect()
    ]
    single = {r["vec_id"] for r in ann_topk(emb, q, dim=8, k=10).collect()}
    multi = {r["vec_id"] for r in ann_topk(emb, q, dim=8, k=10, probe_bits=1).collect()}
    r_single = len(single & set(brute))
    r_multi = len(multi & set(brute))
    assert r_multi >= r_single
    assert 0 in multi  # the query vector itself always survives


def test_hamming_pairs_rejects_incomplete_blocking(spark, docs):
    """max_distance > 3 would silently lose pairs under 16-bit-quarter
    blocking (4 blocks only guarantee agreement up to distance 3)."""
    fp = dd.simhash(docs)
    with pytest.raises(ValueError, match="distances <= 3"):
        dd.hamming_pairs(fp, max_distance=10)


def test_lsh_candidate_pairs_validates_banding(spark, docs):
    """Signatures whose seed count does not band into bands x
    rows_per_band raise instead of silently bucketing differently."""
    sigs = dd.minhash_signatures(docs, k=8)
    with pytest.raises(Exception, match="bands"):
        dd.lsh_candidate_pairs(sigs, bands=2, rows_per_band=2).collect()


def test_quality_filter_null_text_fails(spark):
    from emiproc_spark.operators.text import quality_filter

    docs = spark.createDataFrame(
        [(0, None), (1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in quality_filter(docs).collect()}
    assert out[0] == (False, "null_text")
    assert out[1][0] is True


def test_fingerprint_collapses_whitespace(spark):
    from emiproc_spark.operators.text import fingerprint

    docs = spark.createDataFrame(
        [(0, "a  b"), (1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_pack_sequences_validates_ctx_len(spark):
    from emiproc_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(0, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="ctx_len"):
        pack_sequences(docs, ctx_len=0)


def test_lsh_incremental_matches_filtered_full(spark):
    import random

    random.seed(11)
    words = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(40):
        base = " ".join(random.choices(words, k=18))
        rows.append((i, base))
        # duplicates BOTH within the old corpus (old×old — must be
        # excluded) and across the old/new boundary
        if i % 5 == 0:
            rows.append((i + 500, base))      # old twin of an old doc
        if i % 4 == 0:
            rows.append((i + 1000, base))     # new twin of an old doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dd.minhash_signatures(df, k=8)
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dd.lsh_candidate_pairs(sigs, 4, 2).collect()
    }
    new = df.where(F.col("doc_id") >= 1000).select("doc_id")
    expected = {(a, b) for (a, b) in full if a >= 1000 or b >= 1000}
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd.lsh_candidate_pairs_incremental(sigs, new, 4, 2).collect()
    }
    assert got == expected
    # sanity: the fixture really has old×old pairs the incremental
    # output must omit, and boundary pairs it must keep
    assert any(a < 1000 and b < 1000 for (a, b) in full)
    assert any(b >= 1000 for (_, b) in expected)
    assert all(a < b for (a, b) in got)


def test_lsh_incremental_empty_batch(spark, docs):
    sigs = dd.minhash_signatures(docs, k=8)
    empty = docs.sparkSession.createDataFrame([], "doc_id long")
    assert dd.lsh_candidate_pairs_incremental(sigs, empty).count() == 0


def test_lsh_rejects_whole_band_short_signature(spark, docs):
    # k=6 bands cleanly into 3 bands of 2 — every group is individually
    # valid, but band 3 of the requested 4 is missing entirely
    sigs = dd.minhash_signatures(docs, k=6)
    with pytest.raises(Exception, match="bands missing"):
        dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2).collect()


def test_edit1_pairs_recall_and_guard(spark):
    rows = [
        (1, "spark"), (2, "spork"),   # substitution
        (3, "sparks"),               # insertion vs 1
        (4, "park"),                 # deletion vs 1
        (5, "spark"),                # identical -> dist 0 with 1
        (6, "totally"),              # unrelated
        (7, ""), (8, "a"),           # empty matches 1-char at dist 1
        (9, None),                   # NULL excluded
    ]
    keys = spark.createDataFrame(rows, "doc_id long, key string")
    out = {(r["doc_a"], r["doc_b"]): r["dist"] for r in
           dd.edit1_pairs(keys).collect()}
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1 and out[(1, 4)] == 1
    assert out[(1, 5)] == 0
    assert out[(7, 8)] == 1
    assert not any(6 in p or 9 in p for p in out)
    # brute-force agreement on the full set
    import itertools
    def lev(a, b):
        if len(a) < len(b): a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]
    expect = {}
    clean = [(i, k) for i, k in rows if k is not None]
    for (i, ka), (j, kb) in itertools.combinations(clean, 2):
        d = lev(ka, kb)
        if d <= 1:
            expect[(min(i, j), max(i, j))] = d
    assert out == expect
    # hot-variant cap drops the crowded bucket ("spark" self-variant
    # shared by ids 1,3,5 and more via deletions)
    capped = dd.edit1_pairs(keys, max_bucket_size=1)
    assert capped.count() < len(out)
    with pytest.raises(ValueError, match="max_bucket_size"):
        dd.edit1_pairs(keys, max_bucket_size=0)


def test_quantize_int8_and_topk(spark):
    import numpy as np

    from emiproc_spark.operators.similarity import int8_topk, quantize_int8

    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),      # zero vector -> all-zero q
        (2, [-2.0, 1.0, 0.5, -0.25]),   # negative peak
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = {r["vec_id"]: (r["qvec"], r["max_abs"]) for r in
         quantize_int8(emb).collect()}
    assert q[0][0] == [127, -63, 32, 0]   # floor(-63.5+0.5) = -63
    assert q[0][1] == 1.0
    assert q[1][0] == [0, 0, 0, 0] and q[1][1] == 0.0
    assert q[2][0] == [-127, 64, 32, -16]  # floor(-15.875 + 0.5) = -16
    # recompute expectations with numpy to avoid hand arithmetic slips
    for vid, vec in rows:
        v = np.array(vec, dtype=np.float64)
        m = np.abs(v).max()
        expect = (np.floor(v * 127.0 / m + 0.5).astype(int).tolist()
                  if m > 0 else [0] * len(vec))
        assert q[vid][0] == expect, (vid, q[vid][0], expect)

    qq = [1, 2, -1, 3]
    top = int8_topk(emb, qq, k=3).collect()
    scores = {r["vec_id"]: r["score"] for r in top}
    for vid, vec in rows:
        v = np.array(vec, dtype=np.float64)
        m = np.abs(v).max()
        qv = np.floor(v * 127.0 / m + 0.5) if m > 0 else np.zeros(len(vec))
        assert scores[vid] == int((qv * np.array(qq)).sum())
    assert [r["vec_id"] for r in top] == sorted(
        scores, key=lambda i: (-scores[i], i)
    )
    with pytest.raises(ValueError, match="k must be"):
        int8_topk(emb, qq, k=0)
    with pytest.raises(ValueError, match="non-empty"):
        int8_topk(emb, [], k=1)


def test_kmeans_iterations_planted_clusters(spark):
    from emiproc_spark.operators.similarity import kmeans_iterations

    # two tight planted clusters around (0,0,..) and (1,1,..); seeds are
    # the 2 lowest-id vectors, one drawn from each cluster
    rows = []
    for i in range(40):
        base = 0.0 if i % 2 == 0 else 1.0
        rows.append((i, [base + 0.01 * ((i * 7) % 5)] * 4))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_iterations(emb, k=2, n_iter=3)
    got = {
        r["vec_id"]: r["cluster"] for r in out.collect()
    }
    # seed 0 is even (cluster 0 side), seed 1 odd (cluster 1 side)
    assert all(got[i] == (i % 2) for i in range(40))
    # dist is engine-reproducible int64 micro-units
    d = out.select("dist_q12").first()["dist_q12"]
    assert isinstance(d, int)

    with pytest.raises(ValueError, match="k and n_iter"):
        kmeans_iterations(emb, k=0)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_iterations(emb, k=100)


def test_kmeans_assign_map_only(spark):
    from emiproc_spark.operators.similarity import kmeans_assign_q

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    df = kmeans_assign_q(emb, cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # assignment is a pure scan
    got = {r["vec_id"]: (r["cluster"], r["dist_q12"]) for r in df.collect()}
    assert got == {0: (0, 0), 1: (1, 0)}


def test_verify_pairs_canonicalizes_reversed_duplicates(spark):
    """(1,2) and (2,1) are the SAME candidate: one output row, else a
    keep-lowest pass downstream would drop both docs."""
    from emiproc_spark.operators.dedup import (
        dedup_keep_first,
        verify_candidate_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words here")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 3)], "doc_a long, doc_b long"
    )
    out = verify_candidate_pairs(docs, pairs, threshold=0.5).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(1, 2)]
    kept = dedup_keep_first(
        docs, verify_candidate_pairs(docs, pairs, threshold=0.5)
    )
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}


def test_exact_duplicates_ignore_null_text(spark):
    from emiproc_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1 and rows[0]["keep_doc_id"] == 3


def test_passage_spans_skip_null_and_empty_docs(spark):
    from emiproc_spark.operators.dedup import passage_duplicates, passage_spans

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, ""), (4, "real words " * 30),
         (5, "real words " * 30)],
        "doc_id long, text string",
    )
    assert passage_spans(docs).where(F.col("doc_id") <= 3).count() == 0
    dup = passage_duplicates(docs).collect()
    # only the real twins duplicate; the empties form no md5('') group
    assert all(r["keep_doc"] == 4 for r in dup) and len(dup) > 0


def test_setsim_join_custom_id_next_to_doc_id(spark):
    """A frame carrying BOTH a custom id_col and an unrelated doc_id
    column must not produce an ambiguous reference."""
    from emiproc_spark.operators.dedup import setsim_join

    docs = spark.createDataFrame(
        [(10, 99, "alpha beta gamma delta epsilon"),
         (11, 98, "alpha beta gamma delta epsilon")],
        "page_id long, doc_id long, text string",
    )
    out = setsim_join(docs, threshold=0.5, id_col="page_id").collect()
    assert [(r["doc_a"], r["doc_b"]) for r in out] == [(10, 11)]


def test_edit1_pairs_non_identifier_column(spark):
    from emiproc_spark.operators.dedup import edit1_pairs

    keys = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "xyz")], "id long, `url-key` string"
    )
    out = edit1_pairs(keys, key_col="url-key", id_col="id")
    # abc~abd within edit distance 1 via the 'ab' deletion bucket
    assert {(r["doc_a"], r["doc_b"]) for r in out.collect()} == {(1, 2)}


def test_ngram_jaccard_rejects_bad_threshold(spark):
    import pytest

    from emiproc_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        ngram_jaccard_pairs(docs, threshold=0.0)


def test_incremental_lsh_raises_on_dangling_new_doc(spark):
    import pytest

    from emiproc_spark.operators.dedup import (
        lsh_candidate_pairs_incremental,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(4)],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(docs, k=8)
    ok = spark.createDataFrame([(3,)], "doc_id long")
    dangling = spark.createDataFrame([(3,), (99,)], "doc_id long")
    assert lsh_candidate_pairs_incremental(sigs, ok).count() > 0
    with pytest.raises(Exception, match="99 has no signature rows"):
        lsh_candidate_pairs_incremental(sigs, dangling).count()
    # opt-out restores the silent shape for pre-reconciled callers
    n = lsh_candidate_pairs_incremental(
        sigs, dangling, validate_new_docs=False
    ).count()
    assert n > 0
