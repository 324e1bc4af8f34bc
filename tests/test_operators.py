"""Training-data pipeline operators over the driver testdata
(documents/embeddings at sf0.001) + planted duplicates, cross-checked
against DuckDB / numpy oracles."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_nlp_classifier_spark.operators import (
    cosine_topk,
    exact_dedup,
    exact_dup_groups,
    extract_features,
    lsh_cosine_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    synthetic_media,
)
from elasticsearch_nlp_classifier_spark.operators.textstats import (
    document_fingerprints,
    lang_id,
    quality_stats,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """documents + planted exact dups + near dups (one word changed)."""
    exact = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 10_000)
    near = (
        docs.where("doc_id between 5 and 9")
        .withColumn("doc_id", F.col("doc_id") + 20_000)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(" zzyzx")),
        )
    )
    return docs.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(docs_with_dups):
    base = docs_with_dups.count()
    dd = exact_dedup(docs_with_dups, "text", "doc_id")
    assert dd.count() == base - 5
    groups = exact_dup_groups(docs_with_dups, "text", "doc_id").toPandas()
    assert len(groups) == 5
    assert (groups.n_dups == 2).all()
    assert (groups.keep_id < 10_000).all()  # keep-first


def test_minhash_lsh_finds_planted_near_dups(docs_with_dups):
    pairs = minhash_lsh_pairs(
        docs_with_dups, "text", "doc_id", threshold=0.5
    ).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    # exact dups (jaccard 1.0) and appended-word near dups must surface
    for i in range(5):
        assert (i, i + 10_000) in found
    for i in range(5, 10):
        assert (i, i + 20_000) in found
    assert (pairs.jaccard >= 0.5).all()


def test_ngram_jaccard_matches_duckdb(spark, docs_with_dups):
    got = (
        ngram_jaccard_pairs(docs_with_dups, "text", "doc_id", k=3, threshold=0.4)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pdf = docs_with_dups.select("doc_id", "text").toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.sql("""
        WITH toks AS (
          SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                                     x -> x <> '') AS w
          FROM docs
        ), sh0 AS (
          SELECT doc_id, unnest(CASE WHEN len(w) >= 3
                 THEN [array_to_string(w[i:i+2], ' ') for i in range(1, len(w)-1)]
                 ELSE [array_to_string(w, ' ')] END) AS shingle
          FROM toks
        ), sh AS (
          SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle <> ''
        ), sizes AS (
          SELECT doc_id, count(*) n FROM sh GROUP BY doc_id
        ), inter AS (
          SELECT l.doc_id a, r.doc_id b, count(*) i
          FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
          GROUP BY 1, 2
        )
        SELECT a AS id_a, b AS id_b,
               i::DOUBLE / (sa.n + sb.n - i) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = a
        JOIN sizes sb ON sb.doc_id = b
        WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.4
        ORDER BY id_a, id_b
    """).df()
    assert got[["id_a", "id_b"]].values.tolist() == \
        want[["id_a", "id_b"]].values.tolist()
    np.testing.assert_allclose(got.jaccard, want.jaccard, atol=1e-12)


def test_simhash_near_dups(docs_with_dups):
    pairs = simhash_near_dup_pairs(
        docs_with_dups, "text", "doc_id", max_hamming=3
    ).toPandas()
    found = set(zip(pairs.id_a, pairs.id_b))
    for i in range(5):  # identical text -> hamming 0
        assert (i, i + 10_000) in found
    exact_rows = pairs[(pairs.id_a < 5) & (pairs.id_b >= 10_000)]
    assert (exact_rows.hamming == 0).all()


def test_cosine_topk_vs_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = cosine_topk(emb, queries, k=5).toPandas()

    pdf = emb.toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    ids = pdf.vec_id.to_numpy()
    for qid in got.query_id.unique():
        qv = m[ids == qid][0]
        cos = (m @ qv) / (norms * np.linalg.norm(qv))
        cos[ids == qid] = -np.inf
        order = np.lexsort((ids, -cos))[:5]
        want_ids = ids[order].tolist()
        got_ids = got[got.query_id == qid].vec_id.tolist()
        assert got_ids == want_ids, qid


def test_lsh_recall_vs_brute(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = cosine_topk(emb, queries, k=10).toPandas()
    approx = lsh_cosine_topk(emb, queries, dim=64, k=10, n_bits=32, bands=8).toPandas()
    recalls = []
    for qid in brute.query_id.unique():
        b = set(brute[brute.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.5  # 8 bands of 4 bits: recall>>0


def test_lang_id_on_real_language_samples(spark):
    samples = spark.createDataFrame(
        [
            ("en", "the cat sat on the mat and it was happy with that"),
            ("de", "der hund ist nicht mit der katze und das ist gut"),
            ("fr", "le chat est dans la maison et il ne dort pas"),
            ("es", "el perro es un animal y las casas son grandes para todos"),
            ("zh", "这是一个测试文档 机器学习 数据"),
            ("und", "qwvz xkjh zzz"),
        ],
        "lang string, text string",
    )
    got = samples.select("lang", lang_id(F.col("text")).alias("pred")).collect()
    for r in got:
        assert r.pred == r.lang, (r.lang, r.pred)


def test_textstats(spark, docs):
    # synthetic corpus text is English-ish token soup -> must label en/und
    out = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("pred_lang"),
        token_count(F.col("text")).alias("n_tok"),
    )
    preds = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert preds <= {"en", "und"}

    q = quality_stats(docs, "text").select(
        "doc_id", "n_tokens", "quality_score"
    ).toPandas()
    assert ((q.quality_score >= 0) & (q.quality_score <= 1)).all()

    fp = document_fingerprints(docs, "text", "doc_id").toPandas()
    assert fp.sha256.nunique() == len(fp)  # all distinct texts
    assert fp.rolling_fp.nunique() == len(fp)


def test_codec_roundtrips():
    """Pure-numpy BMP/WAV/Y4M codecs: encode -> decode is identity, and
    decoders reject malformed payloads."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators.codecs import (
        decode_bmp, decode_wav, decode_y4m,
        encode_bmp, encode_wav, encode_y4m, resize_image,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)  # odd w -> padding
    assert (decode_bmp(encode_bmp(px)) == px).all()

    samples = rng.integers(-32768, 32767, 501, dtype=np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and (out == samples).all()

    frames = rng.integers(0, 256, (4, 12, 16), dtype=np.uint8)
    fr, fps = decode_y4m(encode_y4m(frames, fps=30))
    assert fps == 30 and (fr == frames).all()

    # exact area-mean downscale: 4x4 blocks of a constant image
    const = np.full((16, 16, 3), 100, dtype=np.uint8)
    small = resize_image(const, 4, 4)
    assert small.shape == (4, 4, 3) and (small == 100).all()
    # nearest-neighbor path (non-divisible target) keeps dtype/shape
    nn = resize_image(px, 5, 7)
    assert nn.shape == (7, 5, 3) and nn.dtype == np.uint8

    for bad in (b"", b"BMnot-a-real-bmp", b"RIFFxxxxWAVE", b"YUV4MPEG2 W0\n"):
        with pytest.raises(ValueError):
            decode_bmp(bad)
        with pytest.raises(ValueError):
            decode_wav(bad)
        with pytest.raises(ValueError):
            decode_y4m(bad)


def test_multimodal_closed_form_decode_matches_formula(spark):
    """The closed-form media table (the mm_feature_extract oracle's
    subject) decodes back to exactly the integer formula — container
    encode→decode is the identity on content."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators.codecs import (
        decode_bmp, decode_wav, decode_y4m,
    )
    from elasticsearch_nlp_classifier_spark.operators.multimodal import (
        synthetic_media_closed_form,
    )

    rows = synthetic_media_closed_form(spark, 9).collect()
    for r in rows:
        i = r["doc_id"]
        if r["kind"] == "image":
            px = decode_bmp(bytes(r["payload"]))
            h, w, _ = px.shape
            yy, xx = np.mgrid[0:h, 0:w]
            cc = np.arange(3)
            want = (17 * xx[:, :, None] + 29 * yy[:, :, None]
                    + 43 * cc[None, None, :] + 7 * i) % 256
            assert (px == want).all()
        elif r["kind"] == "audio":
            s, rate = decode_wav(bytes(r["payload"]))
            t = np.arange(len(s), dtype=np.int64)
            want = ((2654435761 * t + 97 * i) % 65536) - 32768
            assert rate == 8000 and (s == want).all()
        else:
            fr, fps = decode_y4m(bytes(r["payload"]))
            n, h, w = fr.shape
            tt = np.arange(n)
            yy, xx = np.mgrid[0:h, 0:w]
            want = (7 * xx[None] + 11 * yy[None]
                    + 13 * tt[:, None, None] + 5 * i) % 256
            assert fps == 25 and (fr == want).all()


def test_multimodal_real_decode(spark):
    import numpy as np

    media = synthetic_media(spark, 32)
    feats = extract_features(media).toPandas()  # default = real_decode
    assert len(feats) == 32
    assert all(len(f) == 16 for f in feats.features)
    # deterministic: same payload -> same features
    feats2 = extract_features(media).toPandas()
    assert feats.features.map(tuple).tolist() == feats2.features.map(tuple).tolist()

    # features reflect decoded payload truth: image dims come from the
    # BMP header and must match the synthetic meta
    meta = media.select("doc_id", "kind", "meta.*").toPandas().set_index("doc_id")
    for _, r in feats.iterrows():
        m = meta.loc[r.doc_id]
        if r.kind == "image":
            assert (r.features[0], r.features[1]) == (m.width, m.height)
        elif r.kind == "video":
            assert r.features[0] == m.frames
            # moving-bar clips have nonzero temporal motion
            assert r.features[6] > 0
        else:
            samples_dur = r.features[0]
            assert 0.04 < samples_dur < 0.15  # synthetic 50-110 ms clips
            assert r.features[1] > 0.1        # sine RMS


def test_multimodal_resize_and_frames(spark):
    from elasticsearch_nlp_classifier_spark.operators import frame_sample_plan
    from elasticsearch_nlp_classifier_spark.operators.multimodal import (
        extract_frames, resize_images,
    )

    media = synthetic_media(spark, 18)
    resized = resize_images(media, 8, 6)
    rp = extract_features(resized).toPandas()
    for _, r in rp[rp.kind == "image"].iterrows():
        assert (r.features[0], r.features[1]) == (8, 6)  # decoded BMP dims
    # non-image rows pass through byte-identical
    orig_audio = media.where("kind = 'audio'").select("doc_id", "payload").toPandas()
    res_audio = resized.where("kind = 'audio'").select("doc_id", "payload").toPandas()
    assert orig_audio.set_index("doc_id").payload.map(bytes).to_dict() == \
        res_audio.set_index("doc_id").payload.map(bytes).to_dict()

    # metadata-only plan rows == real decoded frame rows (every_nth=2)
    plan = frame_sample_plan(media, every_nth=2).toPandas()
    real = extract_frames(media, every_nth=2).toPandas()
    assert sorted(map(tuple, plan[["doc_id", "frame_idx"]].values.tolist())) == \
        sorted(map(tuple, real[["doc_id", "frame_idx"]].values.tolist()))
    # each extracted frame is a decodable image whose features match the
    # source frame (moving bar -> bright column present)
    from pyspark.sql import functions as F

    frame_imgs = extract_frames(media, every_nth=2).select(
        "doc_id", F.lit("image").alias("kind"), "meta", "payload"
    )
    fr_feats = extract_features(frame_imgs).toPandas()
    assert (fr_feats.features.map(lambda f: f[13]) == 255).all()  # luma max


def test_cosine_near_dup_lsh_recall_vs_brute(spark):
    """LSH near-dup path must recover (nearly) all brute-force pairs at
    the working threshold; every returned pair is exact-verified."""
    import numpy as np

    from elasticsearch_nlp_classifier_spark.operators import (
        cosine_near_dup_pairs,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    # plant 10 near-dups: tiny perturbations of the first 10 vectors
    near = base[:10] + 0.02 * rng.standard_normal((10, 16)).astype(np.float32)
    vecs = np.vstack([base, near])
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    brute = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(emb, 0.95, method="brute").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_near_dup_pairs(
            emb, 0.95, method="lsh", dim=16, n_bits=32, bands=16
        ).collect()
    }
    assert lsh <= brute            # no false positives (exact verify)
    assert len(brute) >= 10
    assert len(lsh) / len(brute) >= 0.9   # recall


def test_dup_clusters_matches_union_find(spark):
    """Alternating large-star/small-star closure vs a driver union-find
    oracle, on a graph with a long chain (forces multiple rounds), a
    triangle, an isolated pair, and shared-min collisions."""
    from elasticsearch_nlp_classifier_spark.operators import dup_clusters

    edges = (
        [(i, i + 1) for i in range(100, 140)]       # 41-node chain
        + [(1, 2), (2, 3), (1, 3)]                  # triangle
        + [(50, 60)]                                # pair
        + [(7, 200), (7, 300), (300, 8)]            # star + bridge
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["cluster_id"]) for r in dup_clusters(pairs).collect()
    }

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    want = {
        (n, min(members))
        for members in comp.values()
        for n in members
    }
    assert got == want


def test_dedup_by_clusters_transitive(spark, docs_with_dups):
    """A~B and B~C (A,C not directly paired) must still collapse to one
    kept row — the closure semantics pairs alone don't give."""
    from elasticsearch_nlp_classifier_spark.operators import (
        dedup_by_clusters, minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(docs_with_dups, "text", "doc_id", threshold=0.5)
    kept = dedup_by_clusters(docs_with_dups, pairs, "doc_id")
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    # every planted dup (exact +10k, near +20k) is dropped; originals kept
    assert not {i + 10_000 for i in range(5)} & kept_ids
    assert not {i + 20_000 for i in range(5, 10)} & kept_ids
    assert set(range(10)) <= kept_ids
    # transitive chain: doc0 == doc0+10000 (exact), and a doc0 variant
    # pairing with the copy but built from the copy's text
    chain = docs_with_dups.unionByName(
        docs_with_dups.where("doc_id = 10000")
        .withColumn("doc_id", F.lit(30_000).cast("long"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" qqq")))
    )
    pairs2 = minhash_lsh_pairs(chain, "text", "doc_id", threshold=0.5)
    kept2 = {r["doc_id"] for r in
             dedup_by_clusters(chain, pairs2, "doc_id").select("doc_id").collect()}
    assert 0 in kept2 and 10_000 not in kept2 and 30_000 not in kept2


def test_ivf_assign_partitions_and_recall(spark):
    """IVF: every corpus vector lands in exactly one of n_cells cells;
    probing enough cells recovers brute top-k with high recall."""
    from elasticsearch_nlp_classifier_spark.operators import (
        ivf_cosine_topk, ivf_train_centroids,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        ivf_assign,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    cents = ivf_train_centroids(emb, dim=64, n_cells=8, iters=3)
    assert cents.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)

    assigned = ivf_assign(emb, cents, "embedding").toPandas()
    assert assigned.cid.between(0, 7).all()
    assert len(assigned) == emb.count()

    queries = emb.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = cosine_topk(emb, queries, k=10).toPandas()
    approx = ivf_cosine_topk(
        emb, queries, dim=64, k=10, n_cells=8, n_probe=4, centroids=cents
    ).toPandas()
    recalls = []
    for qid in brute.query_id.unique():
        b = set(brute[brute.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.6  # probing half the cells


def test_semantic_dedup_pairs_within_cell_exact(spark):
    """SemDeDup pairs == brute cosine pairs restricted to same cell
    (numpy oracle), and keep-first dedup drops exactly the id_b set."""
    from elasticsearch_nlp_classifier_spark.operators import (
        semantic_dedup, semantic_dedup_pairs,
    )
    from elasticsearch_nlp_classifier_spark.operators.similarity import (
        ivf_assign, ivf_train_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # plant 3 exact copies -> guaranteed same cell, cos == 1
    copies = emb.where(F.col("vec_id") < 3).withColumn(
        "vec_id", F.col("vec_id") + 10_000
    )
    emb = emb.unionByName(copies).cache()
    cents = ivf_train_centroids(emb, dim=64, n_cells=8, iters=3)

    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in semantic_dedup_pairs(emb, cents,
                                      threshold=0.4).collect()
    }

    pdf = ivf_assign(emb, cents, "embedding").toPandas()
    m = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    ids, cids = pdf.vec_id.to_numpy(), pdf.cid.to_numpy()
    want = {}
    n = len(pdf)
    for i in range(n):
        for j in range(n):
            a, b = ids[i], ids[j]
            if a < b and cids[i] == cids[j] and sims[i, j] >= 0.4:
                want[(a, b)] = sims[i, j]
    assert set(got) == set(want)
    for k_ in got:
        assert got[k_] == pytest.approx(want[k_], abs=1e-9)

    # planted copies are near-dups of their originals at cos ~ 1
    assert all((v, v + 10_000) in got for v in range(3))

    kept = semantic_dedup(emb, dim=64, n_cells=8, iters=3,
                          threshold=0.9999, centroids=cents)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert all(v + 10_000 not in kept_ids for v in range(3))
    assert all(v in kept_ids for v in range(3))


def test_web_clean(spark):
    from elasticsearch_nlp_classifier_spark.operators import (
        clean_web_docs, normalize_unicode, strip_html,
    )

    df = spark.createDataFrame(
        [
            (1, "<html><head><style>p{color:red}</style></head>"
                "<body><p>Hello   <b>world</b></p>"
                "<script>alert('x');\nmore()</script>"
                "&lt;tag&gt; &amp;amp; &nbsp;done</body></html>"),
            (2, "no markup at all"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.t for r in
           df.select("doc_id", strip_html("text").alias("t")).collect()}
    assert got[1] == "Hello world <tag> &amp; done"  # amp decoded LAST
    assert got[2] == "no markup at all"
    assert got[3] is None

    # NFC: combining accent composes; NFKC also folds compatibility
    nf = spark.createDataFrame([(1, "café ﬁne")],
                               "doc_id bigint, text string")
    nfc = normalize_unicode(nf).head().text
    assert nfc == "café ﬁne"          # é composed, ligature kept
    nfkc = normalize_unicode(nf, form="NFKC").head().text
    assert nfkc == "café fine"              # ligature folded

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown normalization"):
        normalize_unicode(nf, form="XXX")

    both = clean_web_docs(
        spark.createDataFrame([(1, "<p>café</p>")],
                              "doc_id bigint, text string")
    ).head().text
    assert both == "café"


# --- repeated k-gram span dedup (exact-substring, Lee et al. shape) ---

def test_repeated_kgram_spans_keep_first(spark):
    from elasticsearch_nlp_classifier_spark.operators.dedup import (
        repeated_kgram_spans,
    )

    boiler = "alpha bravo charlie delta echo"       # the repeated 5-gram
    rows = [
        (0, f"{boiler} unique zero tail words"),     # first occurrence
        (1, f"lead one {boiler} trailing bits"),     # dup at pos 2
        (2, "totally unrelated text with no reuse"),
        (3, f"{boiler} mid {boiler}"),               # two dups, disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_kgram_spans(df, k=5).collect()
    }
    assert (1, 2, 7) in got
    assert (3, 0, 5) in got and (3, 6, 11) in got
    assert all(d != 0 and d != 2 for d, _, _ in got)


def test_repeated_kgram_spans_merge_overlaps(spark):
    from elasticsearch_nlp_classifier_spark.operators.dedup import (
        repeated_kgram_spans,
    )

    # doc 1 repeats a 7-token run from doc 0: its three overlapping
    # 5-grams must merge into ONE [0, 7) span
    run = "a b c d e f g"
    rows = [(0, f"{run} first home"), (1, f"{run} different ending")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = [
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in repeated_kgram_spans(df, k=5).collect()
    ]
    assert got == [(1, 0, 7)]


def test_remove_repeated_spans_rebuilds(spark):
    from elasticsearch_nlp_classifier_spark.operators.dedup import (
        remove_repeated_spans,
        repeated_kgram_spans,
    )

    boiler = "alpha bravo charlie delta echo"
    rows = [
        (0, f"{boiler} zero tail"),
        (1, f"keep one {boiler} keep two"),
        (2, "untouched document text"),
        (3, boiler),                                 # loses everything
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = repeated_kgram_spans(df, k=5)
    out = {r["doc_id"]: r["text"]
           for r in remove_repeated_spans(df, spans).collect()}
    assert out[0] == f"{boiler} zero tail"           # first copy kept
    assert out[1] == "keep one keep two"             # span excised
    assert out[2] == "untouched document text"       # no-span passthrough
    assert out[3] == ""                              # fully duplicated
    assert set(out) == {0, 1, 2, 3}


def test_media_session_conf_restores_byte_cap(spark):
    """ADVICE r3: the fat-row Arrow caps are programmatic (not just a
    docstring) — a conf dict for new sessions, an applier for live
    ones, and `get_spark(fat_rows=True)` wiring."""
    import inspect

    from elasticsearch_nlp_classifier_spark.operators.multimodal import (
        apply_media_conf,
        media_session_conf,
    )
    from elasticsearch_nlp_classifier_spark.session import get_spark

    conf = media_session_conf()
    assert conf["spark.sql.execution.arrow.maxBytesPerBatch"] == \
        str(64 * 1024 * 1024)
    assert "fat_rows" in inspect.signature(get_spark).parameters

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key)
    prior = apply_media_conf(spark)
    try:
        assert spark.conf.get(key) == "256"
        assert prior[key] == before
    finally:
        for k, v in prior.items():
            if v is not None:
                spark.conf.set(k, v)
    assert spark.conf.get(key) == before
