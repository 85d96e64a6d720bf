"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sjot_spark.datapipe import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "web"),
        (2, "the quick brown fox jumps over the lazy dog", "web"),   # exact dup of 1
        (3, "the quick brown fox jumps over a lazy dog", "books"),   # near dup
        (4, "completely different content about spark engines", "web"),
        (5, "le chat et le chien et le oiseau", "web"),              # fr-ish
        (6, "der hund und die katze und der vogel", "web"),          # de-ish
        (7, "", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs, "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["keep_id"] == 1


def test_shingles_and_jaccard(docs):
    pairs = {
        (r.doc_a, r.doc_b): (r.inter, r.uni)
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text",
                                           threshold=0.3).collect()
    }
    assert (1, 2) in pairs  # identical: inter == uni
    i, u = pairs[(1, 2)]
    assert i == u
    # one-word edit: 4 common 3-grams of 10 total -> jaccard 0.4
    assert pairs[(1, 3)] == (4, 10)
    assert not any({a, b} == {1, 4} for a, b in pairs)


def test_minhash_lsh_finds_near_dups(docs):
    got = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    assert (1, 2) in got  # identical text always collides
    assert all({a, b} != {1, 4} for a, b in got)


def test_simhash_near_pairs(docs):
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text",
                                          max_hamming=3).collect()
    }
    assert got.get((1, 2)) == 0  # identical -> same signature
    assert all({a, b} != {1, 4} for a, b in got)


def test_token_count_and_stopwords(docs, spark):
    out = {
        r.doc_id: (r.n, r.s)
        for r in docs.select(
            "doc_id",
            text.token_count(F.col("text")).alias("n"),
            text.stopword_hits(F.col("text")).alias("s"),
        ).collect()
    }
    assert out[1][0] == 9
    assert out[7][0] == 0
    assert out[1][1] == 2  # 'the' twice ('a' appears zero times delimited)


def test_lang_id(docs):
    out = {
        r.doc_id: r.lang
        for r in docs.select(
            "doc_id", text.lang_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert out[1] == "en"
    assert out[5] == "fr"
    assert out[6] == "de"
    assert out[7] == "und"
    assert out[4] == "und"  # no markers


def test_knn_bruteforce_and_lsh_agree_on_top1(spark):
    # 40 vectors in 8-d: two tight clusters + noise
    rng = np.random.RandomState(7)
    base_a = rng.rand(8)
    base_b = -rng.rand(8)
    rows = []
    for i in range(40):
        base = base_a if i % 2 == 0 else base_b
        v = base + rng.rand(8) * 0.05
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = similarity.knn_bruteforce(df, "vec_id", "embedding", [0, 1], k=3)
    ex = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    # same-cluster neighbors only
    assert ex[(0, 1)] % 2 == 0 and ex[(1, 1)] % 2 == 1
    approx = similarity.ann_lsh(df, "vec_id", "embedding", [0, 1], k=3,
                                dim=8, n_planes=12, max_hamming=3)
    ap = {(r.query_id, r.rank): r.neighbor_id for r in approx.collect()}
    # LSH with generous hamming must recover the exact top-1
    assert ap[(0, 1)] == ex[(0, 1)]
    assert ap[(1, 1)] == ex[(1, 1)]


def test_cosine_dup_candidates(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = {(r.doc_a, r.doc_b) for r in similarity.cosine_dup_candidates(
        df, "vec_id", "embedding", dim=4, n_planes=8, threshold=0.95
    ).collect()}
    assert (1, 2) in got
    assert all({a, b} != {1, 3} for a, b in got)


def test_multimodal_feature_plumbing(spark):
    media = multimodal.make_media_fixture(spark, 32)
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 32
    for r in rows:
        assert r.n_bytes == 64  # 4 x md5-hex -> 64 bytes
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-5
    # determinism: same seed -> same features
    again = multimodal.extract_features(multimodal.make_media_fixture(spark, 32))
    assert sorted(map(tuple, (r.feature for r in rows))) == \
           sorted(map(tuple, (r.feature for r in again.collect())))


def test_multimodal_frame_sampling(spark):
    media = multimodal.make_media_fixture(spark, 12)
    frames = multimodal.sample_frames(media, every_ms=1000)
    per = {}
    for r in frames.collect():
        per.setdefault(r.media_id, []).append(r.frame_idx)
    # duration_ms = (id%5)*1000+1000 -> id%5+1 frames
    for mid, idxs in per.items():
        i = int(mid[1:])
        assert sorted(idxs) == list(range(i % 5 + 1))


def test_real_decode_is_gated(spark):
    if multimodal.HAVE_PIL:
        pytest.skip("PIL installed; stub gate not applicable")
    with pytest.raises(NotImplementedError, match="requires PIL"):
        multimodal.decode_image(b"xx")


def test_winnowed_fingerprints(spark, docs):
    from sjot_spark.datapipe import fingerprint as fpm

    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in fpm.fingerprint_overlap_pairs(
            docs, "doc_id", "text", k=3, w=2, min_shared=1).collect()
    }
    assert (1, 2) in pairs        # identical docs share everything
    assert (1, 3) in pairs        # one-word edit still overlaps
    assert all({a, b} != {1, 4} for a, b in pairs)
    # winnowing guarantee: shared fps of (1,2) >= shared of (1,3)
    assert pairs[(1, 2)] >= pairs[(1, 3)]
    # determinism
    again = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in fpm.fingerprint_overlap_pairs(
            docs, "doc_id", "text", k=3, w=2, min_shared=1).collect()
    }
    assert pairs == again


def test_short_docs_fingerprint_gracefully(spark):
    from sjot_spark.datapipe import fingerprint as fpm
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d e f g h")],
        "doc_id int, text string")
    rows = df.select(
        "doc_id", fpm.fingerprints(F.col("text"), k=3, w=2).alias("fp")
    ).collect()
    by = {r.doc_id: r.fp for r in rows}
    assert by[1] == [] and by[2] == []   # shorter than k
    assert len(by[3]) >= 1


def test_ann_ivf_recovers_bruteforce_top1(spark):
    import numpy as np

    from sjot_spark.datapipe import similarity
    from sjot_spark.datapipe.ivf import ann_ivf

    rng = np.random.RandomState(11)
    bases = [rng.rand(8) * s for s in (1, -1, 2)]
    rows = [
        (i, [float(x) for x in (bases[i % 3] + rng.rand(8) * 0.05)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.knn_bruteforce(
            df, "vec_id", "embedding", [0, 1], k=3).collect()
    }
    approx = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ann_ivf(df, "vec_id", "embedding", [0, 1], k=3,
                         nlist=6, nprobe=3).collect()
    }
    assert approx[(0, 1)] == exact[(0, 1)]
    assert approx[(1, 1)] == exact[(1, 1)]
    # full recall@3: with nprobe=3 of 6 tight clusters, every true
    # neighbor sits in a probed cell
    exact_sets = {q: {v for (qq, _), v in exact.items() if qq == q}
                  for q in (0, 1)}
    approx_sets = {q: {v for (qq, _), v in approx.items() if qq == q}
                   for q in (0, 1)}
    assert exact_sets == approx_sets


def test_build_ivf_fits_on_bounded_sample(spark):
    """The KMeans fit must see at most ~max_fit_rows rows while the
    assignment still covers the full corpus (SCALING.md: 100 TB gets
    one assignment pass, never 20 Lloyd passes)."""
    import numpy as np

    from sjot_spark.datapipe.ivf import build_ivf

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.rand(4)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    assigned, centroids = build_ivf(
        df, "vec_id", "embedding", nlist=4, max_fit_rows=50,
        approx_rows=400)
    assert assigned.count() == 400          # full corpus assigned
    assert len(centroids) == 4
    assert assigned.select("cell").distinct().count() <= 4


def test_build_ivf_never_counts_the_corpus(spark, monkeypatch):
    """Round-2 finding: build_ivf spent a full corpus pass on
    ml.count() just to size the sample. The fit must now derive its
    sample without ANY count job (approx_rows comes from table
    metadata at scale; a limit caps the fit input either way)."""
    import numpy as np

    from pyspark.sql import DataFrame

    from sjot_spark.datapipe.ivf import build_ivf

    def boom(self):
        raise AssertionError("build_ivf must not run a count() job")

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.rand(4)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    monkeypatch.setattr(DataFrame, "count", boom)
    _, centroids = build_ivf(df, "vec_id", "embedding", nlist=4,
                             max_fit_rows=100, approx_rows=300)
    assert len(centroids) == 4


def test_fingerprint_window_and_array_formulations_agree(spark, docs):
    from sjot_spark.datapipe import fingerprint as fpm

    arr = {
        (r.doc_id, fp)
        for r in docs.select(
            "doc_id", fpm.fingerprints(F.col("text"), k=3, w=2).alias("fps")
        ).collect()
        for fp in r.fps
    }
    win = {
        (r.doc, r.fp)
        for r in fpm.fingerprints_exploded(docs, "doc_id", "text",
                                           k=3, w=2).collect()
    }
    assert arr == win


def test_ppm_image_decode_roundtrip_and_features():
    import numpy as np

    from sjot_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 12, 3), dtype=np.uint8)
    payload = mm.encode_ppm(img)
    back = mm.decode_image(payload)
    assert back.shape == (16, 12, 3)
    assert np.array_equal(back, img)
    # grayscale PGM too
    gray = rng.randint(0, 256, (8, 8), dtype=np.uint8)
    assert np.array_equal(mm.decode_image(mm.encode_ppm(gray))[:, :, 0], gray)
    # comments in header (valid PPM) must parse
    commented = b"P6\n# a comment\n12 16\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_image(commented), img)
    feat = mm.image_feature(payload, thumb=2)
    assert feat.shape == (3 + 3 + 4,) and feat.dtype == np.float32
    assert np.all((feat >= 0) & (feat <= 1))
    small = mm.resize_image(img, 4, 4)
    assert small.shape == (4, 4, 3)


def test_wav_audio_decode_roundtrip_and_features():
    import numpy as np

    from sjot_spark.datapipe import multimodal as mm

    t = np.arange(1600, dtype=np.float32) / 16000.0
    stereo = np.stack([np.sin(2 * np.pi * 440 * t),
                       0.5 * np.sin(2 * np.pi * 220 * t)], axis=1)
    payload = mm.encode_wav(stereo, rate=16000)
    samples, rate = mm.decode_audio(payload)
    assert rate == 16000 and samples.shape == (1600, 2)
    # PCM16 quantization: half-step rounding + the 32767/32768 scale
    assert np.allclose(samples, stereo, atol=2.0 / 32768)
    feat = mm.audio_feature(payload, n_windows=4)
    assert feat.shape == (5,) and feat.dtype == np.float32
    assert feat[4] > 0.5  # peak of a 440Hz sine ~ amplitude
    # non-WAV payloads stay library-gated, not silently wrong
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        mm.decode_audio(b"\x00\x01\x02")


def test_real_decode_kernels_through_spark_plumbing(spark):
    """The decode path end-to-end in mapInPandas: PPM payloads built
    per-row, image_feature as the kernel — real decode, real Arrow
    batches, one row per input."""
    import numpy as np

    from sjot_spark.datapipe import multimodal as mm

    rng = np.random.RandomState(9)
    rows = []
    for i in range(12):
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        rows.append((f"m{i}", "image", bytearray(mm.encode_ppm(img)),
                     8, 8, 0))
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.extract_features(media, kernel=mm.image_feature).collect()
    assert len(out) == 12
    for r in out:
        assert len(r.feature) == 10
        assert all(0.0 <= v <= 1.0 for v in r.feature)


def test_bpe_pretokenize_shapes(spark):
    from sjot_spark.datapipe.tokenize import pretokenize

    df = spark.createDataFrame(
        [("it's rain-ing 42 times!!",), ("",), ("  spaced  out  ",)],
        "text string")
    rows = df.select(pretokenize(F.col("text")).alias("t")).collect()
    assert rows[0].t == ["it", "'s", " rain", "-", "ing", " 42",
                         " times", "!!"]
    assert rows[1].t == []
    # multi-space runs are eaten by \s+ (leftmost-first), so words
    # after them carry no space prefix — same as the GPT-2 splitter
    assert rows[2].t == ["spaced", "out"]


def test_malformed_ppm_headers_raise_not_implemented():
    """Truncated/garbage P6/P5 headers must raise NotImplementedError,
    never a raw ValueError/IndexError that kills a Spark task."""
    from sjot_spark.datapipe import multimodal as mm

    for payload in (b"P6 12", b"P6\n", b"P6\n3 3\n255\nxy", b"P5#"):
        with pytest.raises(NotImplementedError):
            mm.decode_image(payload)


def test_ann_ivf_hashseed_recovers_clustered_neighbors(spark):
    """The hash-seeded IVF variant (oracle-checkable pipeline) must
    still recover same-cluster neighbors on clustered data."""
    import numpy as np

    from sjot_spark.datapipe import similarity
    from sjot_spark.datapipe.ivf import ann_ivf_hashseed

    rng = np.random.RandomState(5)
    bases = [rng.rand(8) * s for s in (1, -1, 2)]
    rows = [(i, [float(x) for x in (bases[i % 3] + rng.rand(8) * 0.05)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    exact = {(r.query_id, r.rank): r.neighbor_id
             for r in similarity.knn_bruteforce(
                 df, "vec_id", "embedding", [0, 1], k=3).collect()}
    approx = {(r.query_id, r.rank): r.neighbor_id
              for r in ann_ivf_hashseed(df, "vec_id", "embedding", [0, 1],
                                        k=3, nlist=6, nprobe=4).collect()}
    assert approx[(0, 1)] == exact[(0, 1)]
    assert approx[(1, 1)] == exact[(1, 1)]


def test_quantize_int8_roundtrip_bound(spark):
    """quantize/dequantize: |x - q*scale| <= scale/2 per coordinate;
    values stay in [-127, 127]; zero vector -> zeros, scale 0."""
    from sjot_spark.datapipe.quantize import dequantize, quantize_int8

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0]), (3, [3.0]),
         (4, []), (5, None)],
        "id long, v array<double>")
    q = dequantize(quantize_int8(df, "v"), "q", "scale", "back")
    rows = {r.id: r for r in q.collect()}
    assert rows[2].q == [0, 0] and rows[2].scale == 0.0
    assert rows[3].q == [127]
    # empty vector: empty q, scale pinned to 0 (not NULL)
    assert rows[4].q == [] and rows[4].scale == 0.0
    # NULL vector propagates NULL
    assert rows[5].q is None and rows[5].scale is None
    del rows[4], rows[5]
    for r in rows.values():
        assert all(-127 <= x <= 127 for x in r.q)
        for orig, back in zip(r.v, r.back):
            assert abs(orig - back) <= r.scale / 2 + 1e-12
