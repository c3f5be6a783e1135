"""Unit tests: near-dedup (MinHash/LSH, SimHash, Jaccard), similarity
search, text analysis, multimodal plumbing — the rows-only operators whose
exact behavior the DuckDB oracle can't pin."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from retail_datalakehouse_spark.operators import multimodal
from retail_datalakehouse_spark.operators.minhash import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64_df,
)
from retail_datalakehouse_spark.operators.similarity import (
    seeded_centroids,
    ivf_topk,
    topk_cosine,
)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near-dup of 0
    (2, "completely different content about spark sql engines and parquet files"),
    (3, "another unrelated document mentioning streaming watermarks and windows"),
    (4, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_jaccard_exact_values(spark, docs_df):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in
             jaccard_pairs(docs_df, "doc_id", "text", w=3, threshold=0.0).collect()}
    assert pairs[(0, 4)] == 1.0  # exact duplicate
    # docs 0/1 share all but the final 3-gram region
    assert 0.5 < pairs[(0, 1)] < 1.0
    assert (0, 2) not in pairs  # no shared 3-grams at all


def test_minhash_lsh_finds_near_dups(spark, docs_df):
    sig = minhash_signature(docs_df, "text", k=64, w=3)
    cand = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sig, "doc_id", 16, 4).collect()}
    assert (0, 4) in cand  # identical signature → must collide
    assert (0, 1) in cand  # high-jaccard pair collides w.h.p. with 16 bands
    # verification stage kills false positives:
    verified = jaccard_pairs(
        docs_df, "doc_id", "text", w=3, threshold=0.5,
        candidates=lsh_candidate_pairs(sig, "doc_id", 16, 4),
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    assert got == {(0, 1), (0, 4), (1, 4)}


def test_jaccard_autoroutes_through_lsh_above_limit(spark, docs_df):
    """Without candidates, jaccard_pairs must NOT run its quadratic
    shingle self-join once the corpus exceeds quadratic_limit — it
    auto-routes through MinHash-LSH and still finds the true near-dups."""
    pairs = jaccard_pairs(
        docs_df, "doc_id", "text", w=3, threshold=0.5, quadratic_limit=3
    )  # 5 docs > limit of 3 → LSH route
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(0, 1), (0, 4), (1, 4)}  # same verified set as the LSH pipeline


def test_simhash_hamming_reflects_similarity(spark, docs_df):
    from retail_datalakehouse_spark.operators.minhash import hamming64

    sh = simhash64_df(docs_df, "doc_id", "text")
    rows = {r.doc_id: r.sh for r in sh.collect()}
    assert rows[0] == rows[4]  # identical docs → identical simhash
    df = spark.createDataFrame([(rows[0], rows[1], rows[2])], ["a", "b", "c"])
    h01, h02 = df.select(
        hamming64(F.col("a"), F.col("b")).alias("h01"),
        hamming64(F.col("a"), F.col("c")).alias("h02"),
    ).collect()[0]
    assert h01 < h02  # near-dup is closer in hamming space than unrelated


def test_simhash_multiband_catches_top_bit_diffs(spark):
    """A pair whose only differing bits sit in the TOP 16 bits is invisible
    to a single 16-bit-prefix band but must be caught by 4-band probing
    (the lower three bands match exactly)."""
    from retail_datalakehouse_spark.operators.minhash import simhash_near_dup_pairs

    base = 0x0123456789ABCDEF
    top_diff = base ^ (0b101 << 60)  # 2 bits flipped, both in bits 60-62
    low_diff = base ^ 0b11  # 2 bits flipped in the lowest band
    far = base ^ ((1 << 50) - 1)  # hamming 50 — never a near-dup
    df = spark.createDataFrame(
        [(0, base), (1, top_diff), (2, low_diff), (3, far)], ["doc_id", "sh"]
    )
    got = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(df, max_hamming=12).collect()}
    assert got[(0, 1)] == 2  # top-band diff: missed by prefix banding, caught here
    assert got[(0, 2)] == 2
    assert got[(1, 2)] == 4  # differs from each other in both bands
    assert not any(3 in p for p in got)  # far hash excluded by hamming verify


def test_topk_cosine_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)], ["vec_id", "embedding"]
    )
    q = vecs[0]
    got = [r.vec_id for r in topk_cosine(df, [float(x) for x in q], k=5).collect()]
    cos = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    expected = [int(i) for i in np.lexsort((np.arange(50), -np.round(cos, 8)))[:5]]
    assert got == expected


def test_ivf_topk_subset_of_probed_clusters(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)], ["vec_id", "embedding"]
    )
    cents = seeded_centroids(df, c=4)
    out = ivf_topk(df, cents, [float(x) for x in vecs[0]], k=5, nprobe=2)
    rows = out.collect()
    assert len(rows) == 5
    assert rows[0].vec_id == 0  # the query vector itself lives in a probed cluster
    assert rows[0].cos_sim == 1.0


def test_multimodal_feature_extraction_deterministic(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "")], ["doc_id", "text"])
    media = multimodal.attach_media(df)
    feats = {r.doc_id: r for r in multimodal.extract_features(media).collect()}
    assert feats[1].n_bytes == 3
    assert feats[1].checksum == ord("a") + ord("b") + ord("c")
    assert feats[1].features[2] == float(ord("a"))
    assert feats[2].n_bytes == 0 and feats[2].features[2] == 0.0


def test_multimodal_codec_dispatch():
    """PNG decodes natively (stdlib codec — tests/test_png.py pins the
    pixel math); codecs that genuinely need native libraries (JPEG) raise
    ValueError at dispatch, as does a non-PNG frame container."""
    import numpy as np

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(multimodal.decode_image(multimodal.encode_png(arr)), arr)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xffjpeg-ish")
    with pytest.raises(ValueError):
        multimodal.sample_frames(b"not-a-png-container", 2)


def test_raw_rgb_decode_resize_exact():
    """Raw-format kernels are REAL: decode is a reshape, nearest-neighbor
    resize picks the exact floor(dst*scale) source pixels."""
    import numpy as np

    # 4x4 gradient image: pixel (r, c) has value 16*r + c in all channels
    img = np.stack(
        [(np.arange(4, dtype=np.uint8)[:, None] * 16 + np.arange(4, dtype=np.uint8))] * 3,
        axis=-1,
    )
    payload = img.tobytes()
    back = multimodal.decode_raw_rgb(payload, 4, 4)
    assert (back == img).all()
    thumb = multimodal.resize_nearest(back, 2, 2)
    # nearest grid: rows/cols [0, 2] → values 0, 2, 32, 34
    assert thumb[:, :, 0].tolist() == [[0, 2], [32, 34]]


def test_raw_frame_sampling_exact():
    import numpy as np

    frames = np.arange(5 * 2 * 2 * 3, dtype=np.uint8).reshape(5, 2, 2, 3)
    sampled = multimodal.sample_frames_raw(frames.tobytes(), w=2, h=2, every=2)
    assert sampled.shape == (3, 2, 2, 3)
    assert (sampled == frames[::2]).all()


def test_thumbnail_frame_pipeline(spark):
    """End-to-end mapInPandas thumbnail: known gradient payloads produce
    exact pixel sums and corners."""
    import numpy as np

    img = np.stack(
        [(np.arange(4, dtype=np.uint8)[:, None] * 16 + np.arange(4, dtype=np.uint8))] * 3,
        axis=-1,
    )
    df = spark.createDataFrame([(1, bytearray(img.tobytes()))], ["doc_id", "payload"])
    out = multimodal.thumbnail_frame(df, src_w=4, src_h=4, out_w=2, out_h=2).collect()[0]
    assert (out["out_w"], out["out_h"]) == (2, 2)
    assert out["px_sum"] == 3 * (0 + 2 + 32 + 34)
    assert out["top_left"] == 0 and out["bottom_right"] == 34


def test_approx_count_distinct_within_bound(spark, sf_dir):
    from retail_datalakehouse_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert math.isclose(row.approx, row.exact, rel_tol=0.05)


def test_approx_percentile_within_bound(spark, sf_dir):
    """GK-sketch percentiles must land within 1% relative error of the
    exact interpolated percentiles at accuracy 10000."""
    from retail_datalakehouse_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    row = o.agg(
        F.approx_percentile(
            "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(10000)
        ).alias("approx"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("e50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("e90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("e99"),
    ).collect()[0]
    for got, exact in zip(row.approx, (row.e50, row.e90, row.e99)):
        assert math.isclose(got, exact, rel_tol=0.01)


def test_kmeans_recovers_blob_centers(spark):
    import numpy as np

    from retail_datalakehouse_spark.operators.kmeans import kmeans_fit

    rng = np.random.RandomState(0)
    blobs = np.vstack(
        [rng.randn(40, 4) * 0.1 + c for c in [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]]]
    ).astype("float32")
    idx = rng.permutation(len(blobs))
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in blobs[j]]) for i, j in enumerate(idx)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_fit(df, k=3, max_iters=8)
    # each true center recovered to within the blob noise
    for true in ([5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]):
        best = min(sum((a - b) ** 2 for a, b in zip(c, true)) for c in cents)
        assert best < 0.1


def test_ivf_with_kmeans_improves_over_seeded(spark):
    """Trained centroids must give ≥ recall of arbitrary seeded ones for
    the same nprobe (on clustered data, strictly better in general)."""
    import numpy as np

    from retail_datalakehouse_spark.operators.kmeans import centroids_df, kmeans_fit
    from retail_datalakehouse_spark.operators.similarity import (
        ivf_topk,
        seeded_centroids,
        topk_cosine,
    )

    rng = np.random.RandomState(1)
    blobs = np.vstack([rng.randn(50, 8) * 0.2 + c for c in np.eye(8)[:4] * 4]).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in blobs[i]]) for i in range(len(blobs))], ["vec_id", "embedding"]
    )
    q = [float(x) for x in blobs[10]]
    truth = {r.vec_id for r in topk_cosine(df, q, k=5).collect()}
    trained = centroids_df(spark, kmeans_fit(df, k=4, max_iters=6))
    got_trained = {r.vec_id for r in ivf_topk(df, trained, q, k=5, nprobe=1).collect()}
    got_seeded = {
        r.vec_id for r in ivf_topk(df, seeded_centroids(df, c=4), q, k=5, nprobe=1).collect()
    }
    assert len(got_trained & truth) >= len(got_seeded & truth)
    assert len(got_trained & truth) == 5  # with clean blobs, trained IVF is exact


def test_winnowing_detects_partial_overlap(spark):
    """Winnowing guarantee: docs sharing a substring >= k+w-1 chars share
    at least one fingerprint; disjoint docs share none."""
    from retail_datalakehouse_spark.operators.text import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (0, "AAAA " + shared + " BBBB"),
        (1, "CCCCCCC " + shared + " DDDDDDDD"),
        (2, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {
        r.doc_id: set(r.fps)
        for r in df.select("doc_id", winnow_fingerprints(F.col("text"), k=8, w=4).alias("fps")).collect()
    }
    assert fps[0] & fps[1], "overlapping docs must share a fingerprint"
    assert not (fps[0] & fps[2]), "disjoint docs must not share fingerprints"


def test_winnow_stats_matches_array_form(spark):
    """r14 opt pin: the explode+window winnow_fingerprint_stats must be
    value-identical to aggregating the HOF array form — including the
    short-doc (< k chars, < w grams) and empty-text edge cases."""
    from retail_datalakehouse_spark.operators.text import (
        winnow_fingerprint_stats,
        winnow_fingerprints,
    )

    rows = [
        (0, "AAAA the quick brown fox jumps over the lazy dog BBBB"),
        (1, "short"),  # n < k: one gram, one window
        (2, ""),  # empty text: hash of "" once
        (3, "abcdefghij"),  # n_grams=3 < w: one partial window
        (4, "x" * 200 + "yz" * 50),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    old = {
        r.doc_id: (len(set(r.fps)), min(r.fps), max(r.fps))
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=8, w=4).alias("fps")
        ).collect()
    }
    new = {
        r.doc_id: (r.n_fingerprints, r.min_fp, r.max_fp)
        for r in winnow_fingerprint_stats(df, "doc_id", "text", k=8, w=4).collect()
    }
    assert new == old


def test_topk_cosine_join_matches_per_query_topk(spark):
    """The batch similarity join must equal running topk_cosine per query."""
    import numpy as np

    from retail_datalakehouse_spark.operators.similarity import (
        topk_cosine,
        topk_cosine_join,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(float)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(3)], ["q_id", "q_vec"]
    )
    joined = topk_cosine_join(queries, corpus, k=4)
    got = {
        q: [(r.vec_id, r.cos_sim) for r in joined.filter(F.col("q_id") == q).orderBy(F.desc("cos_sim"), "vec_id").collect()]
        for q in range(3)
    }
    for q in range(3):
        want = [
            (r.vec_id, r.cos_sim)
            for r in topk_cosine(corpus, [float(x) for x in vecs[q]], k=4).collect()
        ]
        assert got[q] == want


def test_connected_components_labels_min_id(spark):
    """Two chains + a singleton: every node gets its component's min id."""
    from retail_datalakehouse_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    #  0-1-2 chain, 3-4 pair plus 4-5, 6 isolated
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (3, 4), (5, 4)], ["src", "dst"]
    )
    got = {r.id: r.component for r in connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}


def test_planted_neardup_recall_at_production_threshold(spark, sf_dir):
    """l3_embedding_neardup at cos >= 0.9 must recover EXACTLY the 20
    planted near-dup pairs (jitter clones) — recall 1.0, zero false
    positives among the random corpus."""
    from retail_datalakehouse_spark.queries.llm import l3_embedding_neardup

    rows = l3_embedding_neardup(spark, sf_dir).collect()
    got = {(r.id_a, r.id_b) for r in rows}
    expected = {(i, i + 1_000_000) for i in range(20)}
    assert got == expected


def test_banded_lsh_beats_single_bucket_recall(spark):
    """The banding rationale: near-identical vectors split across a single
    24-bit bucket more often than across 3x8 bands (any-band match)."""
    import math

    from retail_datalakehouse_spark.operators.similarity import lsh_near_dup_pairs

    # 40 base vectors + jitter clones => 40 true near-dup pairs
    n, dim = 40, 16
    rows = []
    for i in range(n):
        base = [math.sin(0.7 * i * (j + 1)) + 0.1 * j for j in range(dim)]
        clone = [x * (1.0 + 0.04 * math.sin(i + j)) for j, x in enumerate(base)]
        rows.append((i, base))
        rows.append((i + 1000, clone))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    banded = lsh_near_dup_pairs(df, n_planes=24, n_bands=3, threshold=0.9, dim=dim)
    single = lsh_near_dup_pairs(df, n_planes=24, n_bands=1, threshold=0.9, dim=dim)
    n_banded = banded.count()
    n_single = single.count()
    assert n_banded >= n_single
    assert n_banded >= 38  # ~all 40 planted pairs survive banding


def test_wav_roundtrip_and_chunk_walk():
    """WAV codec: encode->decode is sample-exact; decoder walks RIFF
    chunks (tolerates an extra chunk before data), rejects non-PCM16."""
    import numpy as np
    import struct

    from retail_datalakehouse_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32768, size=333, dtype=np.int16)
    payload = encode_wav(samples, sample_rate=8000)
    got, rate, ch = decode_wav(payload)
    assert rate == 8000 and ch == 1
    assert np.array_equal(got, samples)

    # odd-sized LIST chunk between fmt and data (word-alignment path)
    head, data_chunk = payload[:12], payload[12:]
    fmt_size = struct.unpack("<I", data_chunk[4:8])[0]
    fmt_chunk = data_chunk[: 8 + fmt_size]
    rest = data_chunk[8 + fmt_size:]
    extra = b"LIST" + struct.pack("<I", 3) + b"ab\x00" + b"\x00"  # padded to even
    with_extra = head + fmt_chunk + extra + rest
    got2, _, _ = decode_wav(with_extra)
    assert np.array_equal(got2, samples)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    # non-PCM fmt tag must be rejected
    bad_fmt = bytearray(payload)
    bad_fmt[20] = 3  # IEEE float
    with _pytest.raises(ValueError):
        decode_wav(bytes(bad_fmt))


def _ref_bpe(word_freqs: dict, n_merges: int):
    """Pure-Python reference BPE (subword-nmt semantics): max-count pair
    with lexicographic tie-break, greedy left-to-right merge application."""
    toks = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            t = toks[w]
            for i in range(len(t) - 1):
                counts[(t[i], t[i + 1])] = counts.get((t[i], t[i + 1]), 0) + f
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, t in toks.items():
            out = []
            for tok in t:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            toks[w] = out
    return merges, toks


def test_bpe_train_matches_reference(spark):
    """Distributed BPE must learn the exact merge sequence (and produce
    the exact token counts) of the classic in-memory algorithm."""
    from collections import Counter

    from retail_datalakehouse_spark.operators.bpe import bpe_encode_counts, bpe_train

    texts = [
        (0, "low low low low low lower lower newest newest newest"),
        (1, "newest newest newest widest widest lowest lower new"),
        (2, "the the the the lowest newest wider low low"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    merges = bpe_train(df, "text", n_merges=8)

    word_freqs = Counter(w for _, t in texts for w in t.lower().split() if w)
    ref_merges, ref_toks = _ref_bpe(dict(word_freqs), 8)
    assert merges == ref_merges

    enc = {r.doc_id: r.n_bpe_tokens for r in bpe_encode_counts(df, merges).collect()}
    for doc_id, text in texts:
        expected = sum(len(ref_toks[w]) for w in text.lower().split() if w)
        assert enc[doc_id] == expected, (doc_id, enc[doc_id], expected)


def test_bpe_merge_fold_greedy_left_to_right(spark):
    """The columnar fold must implement greedy non-overlapping merging:
    (a,a) over 'aaa' gives [aa, a], never [a, aa] or [aa, aa]."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame([(["a", "a", "a"],)], "toks array<string>")
    out = df.select(_merge_fold(F.col("toks"), "a", "a").alias("m")).head()[0]
    assert out == ["aa", "a"]


def test_documents_text_ascii_invariant():
    """TESTDATA invariant pinning the l5 media oracles' byte arithmetic.

    The four l5 oracles (l5_feature_extraction / image_thumbnail /
    audio_features / video_framesample, queries/llm.py) equate DuckDB
    CHARACTER arithmetic (LENGTH/substr/ord on text) with Spark's UTF-8
    BYTE arithmetic on encode(text) — identical only while documents.text
    is pure ASCII. If a testdata refresh introduces non-ASCII text this
    fails HERE with a clear message instead of as four silent driver
    hash mismatches; the fix then is switching those oracles to
    octet-based functions."""
    import pyarrow.parquet as pq

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        texts = (
            pq.read_table(f"{sf}/documents.parquet", columns=["text"])
            .column("text")
            .to_pylist()
        )
        non_ascii = [t for t in texts if t is not None and not t.isascii()]
        assert not non_ascii, (
            f"{sf}/documents.parquet: {len(non_ascii)} non-ASCII text values — "
            "the l5 byte-arithmetic oracles' ASCII assumption no longer holds; "
            "switch them to octet-based DuckDB functions"
        )


def test_bpe_local_and_distributed_paths_agree(spark):
    """bpe_train's driver-local merge loop (vocab fits driver) and the
    distributed per-merge loop (vocab_driver_threshold=0 forces it) must
    learn the identical merge sequence — same argmax, lexicographic
    tie-break, and support>=2 stop rule."""
    from retail_datalakehouse_spark.operators.bpe import bpe_train

    texts = [
        (0, "low low low low low lower lower newest newest newest"),
        (1, "newest newest newest widest widest lowest lower new"),
        (2, "the the the the lowest newest wider low low"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    local = bpe_train(df, "text", n_merges=8)
    distributed = bpe_train(df, "text", n_merges=8, vocab_driver_threshold=0)
    assert local == distributed


def test_select_probe_ids_local_matches_dataframe_path(spark):
    """Driver-side probe selection (collected centroid list, zero Spark
    jobs) must pick exactly the centroids the DataFrame path picks — same
    cosine fold order, same round(·, 8), same (score desc, id asc)
    ordering."""
    from retail_datalakehouse_spark.operators.kmeans import centroids_df
    from retail_datalakehouse_spark.operators.similarity import select_probe_ids

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = seeded_centroids(e, c=8)
    rows = [(r["centroid_id"], list(r["centroid_vec"])) for r in cents.collect()]
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 3).select("embedding").head()[0]]
    df_path = select_probe_ids(
        centroids_df(spark, [v for _, v in sorted(rows)]), qvec, nprobe=3
    )
    local_tuples = select_probe_ids(sorted(rows), qvec, nprobe=3)
    local_bare = select_probe_ids([v for _, v in sorted(rows)], qvec, nprobe=3)
    assert df_path == local_tuples == local_bare


def test_connected_components_paths_agree(spark):
    """The driver-side union-find shortcut (bounded edge set) and the
    distributed min-label loop (driver_edge_threshold=None forces it) must
    produce the identical (node → min-id component) labeling, including
    isolated singletons and edges referencing undeclared nodes (ignored
    by both paths)."""
    from retail_datalakehouse_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    # chain 0-1-2-3, triangle 4-5-6, pair 7-8, 9 isolated,
    # plus an edge to undeclared node 99 (must not merge anything through it)
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4), (8, 7), (3, 99), (99, 9)],
        ["src", "dst"],
    )
    local = {
        r.id: r.component for r in connected_components(nodes, edges).collect()
    }
    dist = {
        r.id: r.component
        for r in connected_components(
            nodes, edges, driver_edge_threshold=None
        ).collect()
    }
    assert local == dist == {
        0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7, 8: 7, 9: 9
    }


# ---------------------------------------------------------------- round 5:
# boilerplate removal, chunking, incremental near-dup, containment


def test_incremental_probe_matches_exact(spark):
    """The 100 TB incremental path (sign new batch, probe persisted banded
    index, exact-verify candidates) must find the same ≥-threshold pairs as
    the exact bipartite join."""
    from retail_datalakehouse_spark.operators.minhash import (
        banded_signatures,
        bipartite_jaccard_pairs,
        minhash_signature,
        probe_lsh_index,
    )

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    new = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (101, "totally novel text with no counterpart in the existing corpus at all"),
        ],
        ["doc_id", "text"],
    )
    exact = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in bipartite_jaccard_pairs(new, corpus, "doc_id", w=3, threshold=0.5).collect()
    }
    index = banded_signatures(
        minhash_signature(corpus, "text", k=64, w=3, id_cols=["doc_id"]), "doc_id"
    )
    probe = banded_signatures(
        minhash_signature(new, "text", k=64, w=3, id_cols=["doc_id"]), "doc_id"
    )
    cand = probe_lsh_index(probe, index, "doc_id")
    probed = {
        (r.new_id, r.corpus_id): r.jaccard
        for r in bipartite_jaccard_pairs(
            new, corpus, "doc_id", w=3, threshold=0.5, candidates=cand
        ).collect()
    }
    assert exact == probed
    assert (100, 0) in probed and probed[(100, 0)] == 1.0  # exact dup found
    assert all(k[0] != 101 for k in probed)  # novel doc matches nothing


def test_containment_finds_embedded_doc(spark):
    """A doc fully embedded in a longer one has containment 1.0 in that
    direction and < 1.0 the other way; unrelated docs never pair."""
    from retail_datalakehouse_spark.operators.minhash import containment_pairs

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "prefix words alpha beta gamma delta epsilon suffix words here"),
            (2, "entirely unrelated tokens about something else whatsoever"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(df, "doc_id", w=3, threshold=0.0).collect()
    }
    assert pairs[(0, 1)] == 1.0  # every trigram of 0 appears in 1
    assert pairs[(1, 0)] < 1.0  # but 1 has many trigrams 0 lacks
    assert (0, 2) not in pairs and (2, 0) not in pairs


def test_empty_docs_never_pair(spark):
    """Empty / whitespace-only docs must yield ZERO shingles, so they pair
    with nothing — not even each other. The DuckDB oracles unnest an empty
    shingle list and drop such docs entirely; an '' shingle on the Spark
    side would pair two empty docs at jaccard 1.0 (advice r5)."""
    from retail_datalakehouse_spark.operators.minhash import (
        bipartite_jaccard_pairs,
        containment_pairs,
        shingles,
    )

    df = spark.createDataFrame(
        [
            (0, ""),
            (1, "   "),
            (2, "alpha beta gamma delta epsilon"),
            (3, "alpha beta gamma delta epsilon"),
        ],
        ["doc_id", "text"],
    )
    shs = {r.doc_id: r.s for r in df.select("doc_id", shingles("text").alias("s")).collect()}
    assert shs[0] == [] and shs[1] == []
    assert len(shs[2]) == 3  # 5 tokens, w=3

    jac = {
        (r.new_id, r.corpus_id)
        for r in bipartite_jaccard_pairs(df, df, "doc_id", w=3, threshold=0.5).collect()
    }
    assert (0, 1) not in jac and (1, 0) not in jac
    assert (0, 0) not in jac  # empty docs match nothing, not even themselves
    assert (2, 3) in jac  # real dups still found

    cont = {
        (r.id_a, r.id_b)
        for r in containment_pairs(df, "doc_id", w=3, threshold=0.0).collect()
    }
    assert all(0 not in p and 1 not in p for p in cont)
    assert (2, 3) in cont


def test_containment_refuses_unbounded_exact(spark):
    from retail_datalakehouse_spark.operators.minhash import containment_pairs

    df = spark.range(30).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e f").alias("text")
    )
    with pytest.raises(ValueError, match="quadratic_limit"):
        containment_pairs(df, "doc_id", threshold=0.5, quadratic_limit=10).collect()


def test_chunks_cover_and_overlap(spark):
    """Chunks must cover every token, overlap by size−stride, and
    reconstruct the doc by concatenating each chunk's non-overlapping
    tail."""
    from retail_datalakehouse_spark.operators.text import chunks, tokens

    text = " ".join(f"t{i}" for i in range(75))  # 75 tokens: 3 chunks of 32@24
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    rows = df.select(
        F.posexplode(chunks("text", 32, 24)).alias("idx", "ct"),
        F.size(tokens("text")).alias("n"),
    ).collect()
    assert len(rows) == 3
    toks = text.split(" ")
    rebuilt = list(rows[0].ct)
    for r in rows[1:]:
        assert list(r.ct[:8]) == rebuilt[-8:]  # 8-token overlap (32-24)
        rebuilt.extend(r.ct[8:])
    assert rebuilt == toks
    # short doc: exactly one whole-doc chunk
    short = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    srows = short.select(F.posexplode(chunks("text", 32, 24)).alias("idx", "ct")).collect()
    assert len(srows) == 1 and list(srows[0].ct) == ["a", "b", "c"]


def test_segments_partition_tokens_exactly(spark):
    """Non-overlapping segments partition the token list: concatenation
    reconstructs the doc, remainder segment keeps the tail."""
    from retail_datalakehouse_spark.operators.text import segments

    df = spark.createDataFrame([(0, "a b c d e f g h")], ["doc_id", "text"])
    segs = df.select(segments("text", 3).alias("s")).collect()[0].s
    assert [list(x) for x in segs] == [["a", "b", "c"], ["d", "e", "f"], ["g", "h"]]


def test_boilerplate_removal_flags_recurring_segments(spark, sf_dir):
    """Segments repeated across ≥5 docs are removed; unique docs keep all
    their tokens (kept_tokens == n_tokens when n_boiler == 0)."""
    from retail_datalakehouse_spark.queries.base import REGISTRY

    out = REGISTRY["l4_boilerplate_removal"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    clean = [r for r in rows if r.n_boiler == 0]
    assert clean, "expected at least one boilerplate-free doc"
    # spot-check token accounting on a clean doc against the raw text
    docs = {r.doc_id: r for r in rows}
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    for d in raw[:20]:
        n_tokens = len([t for t in d.text.split(" ") if t])
        r = docs[d.doc_id]
        assert r.kept_tokens <= n_tokens
        if r.n_boiler == 0:
            assert r.kept_tokens == n_tokens


def test_weighted_sample_reproducible_and_calibrated(spark, sf_dir):
    """Sampling is a pure function of doc_id (two runs identical), biased
    toward long docs (avg sampled length > corpus avg), with inclusion
    count in the k ± 4σ band for k=50."""
    from retail_datalakehouse_spark.queries.base import REGISTRY

    fn = REGISTRY["l7_weighted_sample"].fn
    a = {r.doc_id: r.p_include for r in fn(spark, sf_dir).collect()}
    b = {r.doc_id: r.p_include for r in fn(spark, sf_dir).collect()}
    assert a == b
    assert 50 - 4 * 50**0.5 <= len(a) <= 50 + 4 * 50**0.5
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lens = {r.doc_id: len([t for t in r.text.split(" ") if t]) for r in docs.collect()}
    corpus_avg = sum(lens.values()) / len(lens)
    sample_avg = sum(lens[i] for i in a) / len(a)
    assert sample_avg > corpus_avg  # token-weighted ⇒ long docs overrepresented


def test_length_batching_invariants(spark, sf_dir):
    """Batches hold ≤8 docs of one 16-token bucket; padding_waste is
    n_docs·max_tokens − Σtokens and every doc lands in exactly one batch."""
    from retail_datalakehouse_spark.queries.base import REGISTRY

    rows = REGISTRY["l7_length_batching"].fn(spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == docs
    for r in rows:
        assert 1 <= r.n_docs <= 8
        assert 0 <= r.padding_waste <= r.n_docs * 15  # bucket width bounds waste
        assert r.max_tokens // 16 == r.bucket


def test_dhash_png_detects_perceptual_neardups(spark):
    """A re-encoded identical tile hashes identically (hamming 0); a tile
    with one flipped gradient differs by exactly that bit; an unrelated
    tile is far. The banded search returns exactly the ≤6 pairs."""
    import numpy as np

    from retail_datalakehouse_spark.operators.minhash import simhash_near_dup_pairs
    from retail_datalakehouse_spark.operators.multimodal import (
        dhash64_png,
        encode_gray_png,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, size=(16, 16)).astype("uint8")
    twin = base.copy()  # identical content, separately encoded
    nudged = base.copy()
    # flip the (r=0, c=0) gradient: bit 0 compares px[0,0] < px[0,1]
    nudged[0, 0], nudged[0, 1] = nudged[0, 1], nudged[0, 0]
    if base[0, 0] == base[0, 1]:  # equal pixels → swap is a no-op; force it
        nudged[0, 1] = base[0, 0] + 1
    other = rng.randint(0, 255, size=(16, 16)).astype("uint8")
    df = spark.createDataFrame(
        [(0, base.tobytes()), (1, twin.tobytes()), (2, nudged.tobytes()), (3, other.tobytes())],
        ["doc_id", "payload"],
    )
    phashes = dhash64_png(encode_gray_png(df, 16, 16), w=16, h=16)
    h = {r.doc_id: r.phash for r in phashes.collect()}
    assert h[0] == h[1]  # codec roundtrip is lossless → identical hash
    assert h[0] != h[3]
    assert bin(h[0] ^ h[2]).count("1") <= 2  # one swapped gradient: ≤2 bits
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(
            phashes, id_col="doc_id", sh_col="phash", max_hamming=6, bands=8
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 2
    assert (0, 3) not in pairs


def test_ivf_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Appending a new batch into a persisted IVF index (fixed centroids)
    must produce the identical index content — and identical probe
    results — as a full rebuild over the union."""
    from retail_datalakehouse_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_topk_indexed,
        seeded_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    old = e.filter(F.col("vec_id") % 10 != 0)
    new = e.filter(F.col("vec_id") % 10 == 0)

    inc_path = str(tmp_path / "ivf_inc")
    full_path = str(tmp_path / "ivf_full")
    build_ivf_index(old, cents, inc_path)
    append_to_ivf_index(new, cents, inc_path)
    build_ivf_index(e, cents, full_path)

    inc = {(r.vec_id, r.centroid_id) for r in spark.read.parquet(inc_path).select("vec_id", "centroid_id").collect()}
    full = {(r.vec_id, r.centroid_id) for r in spark.read.parquet(full_path).select("vec_id", "centroid_id").collect()}
    assert inc == full and len(inc) == e.count()

    q = e.filter(F.col("vec_id") == 3).collect()[0].embedding
    a = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, inc_path, cents, list(q), k=5, nprobe=2).collect()]
    b = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, full_path, cents, list(q), k=5, nprobe=2).collect()]
    assert a == b


def test_ivf_append_replay_is_noop(spark, sf_dir, tmp_path):
    """A retried/replayed ingest batch (same writer, same batch id) must
    NOT double-append its vectors into the persisted IVF index — the
    txn=(writer, batch_id) guard makes the second delivery a no-op, the
    same exactly-once discipline VersionedTable.append uses (advice r5)."""
    from retail_datalakehouse_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        seeded_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    old = e.filter(F.col("vec_id") % 10 != 0)
    new = e.filter(F.col("vec_id") % 10 == 0)

    path = str(tmp_path / "ivf_txn")
    build_ivf_index(old, cents, path)
    assert append_to_ivf_index(new, cents, path, txn=("ingest", 1)) is True
    n_after_first = spark.read.parquet(path).count()
    # replay of batch 1 and a stale batch 0: both no-ops
    assert append_to_ivf_index(new, cents, path, txn=("ingest", 1)) is False
    assert append_to_ivf_index(new, cents, path, txn=("ingest", 0)) is False
    assert spark.read.parquet(path).count() == n_after_first == e.count()
    # the NEXT batch id still commits
    assert append_to_ivf_index(new.limit(0), cents, path, txn=("ingest", 2)) is True


def test_ivf_append_txn_markers_are_per_writer(spark, sf_dir, tmp_path):
    """Two writers interleaving appends must not clobber each other's
    watermark (advice r6: the shared _txn_state.json read-modify-write was
    last-writer-wins, so writer B's commit could erase writer A's marker
    and re-enable A's double-append)."""
    from retail_datalakehouse_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        seeded_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=4)
    batch = e.limit(5)
    path = str(tmp_path / "ivf_two_writers")
    build_ivf_index(e.limit(20), cents, path)

    assert append_to_ivf_index(batch, cents, path, txn=("writer-a", 1)) is True
    # B commits AFTER A — under the shared-file scheme B's state write
    # started from a snapshot and could drop A's entry
    assert append_to_ivf_index(batch, cents, path, txn=("writer-b", 1)) is True
    n = spark.read.parquet(path).count()
    # A's replay must STILL be a no-op; B's own replay likewise
    assert append_to_ivf_index(batch, cents, path, txn=("writer-a", 1)) is False
    assert append_to_ivf_index(batch, cents, path, txn=("writer-b", 1)) is False
    assert spark.read.parquet(path).count() == n


def test_pq_train_sparse_hashed_ids(spark):
    """pq_train's strided sample assumed dense ids; hashed/sparse ids made
    `id % stride == 0` select zero rows -> IndexError (advice r6). The
    hash-stride fallback must train a usable codebook on any id
    distribution."""
    import random

    from retail_datalakehouse_spark.operators.pq import pq_encode, pq_train

    rnd = random.Random(7)
    # sparse ids: huge, irregular, none divisible by small strides
    rows = [
        (rnd.randrange(10**14, 10**15) * 2 + 1, [rnd.random() for _ in range(8)])
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train(df, m=2, k=4, sample_cap=64)
    assert len(cb) == 2 and all(len(c) == 4 for c in cb)
    enc = pq_encode(df, cb)
    assert (
        enc.filter(F.col("code_0").isNotNull() & F.col("code_1").isNotNull()).count()
        == 300
    )


def test_chunk_and_segment_arithmetic_sweep(spark):
    """One Spark pass over synthetic docs of every token count 1..100:
    chunk count matches 1+ceil((n-32)/24), chunks cover all tokens with
    exactly size-stride overlap, and segments partition the tokens."""
    import math

    from retail_datalakehouse_spark.operators.text import chunks, segments

    df = spark.createDataFrame(
        [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 101)],
        ["n", "text"],
    )
    rows = df.select(
        "n", chunks("text", 32, 24).alias("ch"), segments("text", 3).alias("sg")
    ).collect()
    for r in rows:
        n = r.n
        want_chunks = 1 + max(0, math.ceil((n - 32) / 24))
        assert len(r.ch) == want_chunks, (n, len(r.ch))
        rebuilt = list(r.ch[0])
        for c in r.ch[1:]:
            assert list(c[:8]) == rebuilt[-8:], n  # size-stride overlap
            rebuilt.extend(c[8:])
        assert rebuilt == [f"w{i}" for i in range(n)], n  # full coverage
        assert len(r.sg) == max(1, math.ceil(n / 3)), n
        flat = [t for seg in r.sg for t in seg]
        assert flat == [f"w{i}" for i in range(n)], n  # exact partition


def test_weighted_sample_always_includes_dominant_doc(spark):
    """When k·w_i ≥ Σw the integer inclusion test is unconditionally true
    (probability capped at 1) — a corpus-dominating document can never be
    sampled out, matching the Horvitz-Thompson min(1, k·w/Σw) design."""
    from retail_datalakehouse_spark.queries.base import REGISTRY
    import tempfile, os

    big = " ".join(f"t{i}" for i in range(5000))
    rows = [(0, big, "en", "src0", len(big))] + [
        (i, "tiny doc here", "en", "src0", 13) for i in range(1, 40)
    ]
    d = tempfile.mkdtemp(prefix="rdl_ws_dom_")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r.p_include for r in REGISTRY["l7_weighted_sample"].fn(spark, d).collect()}
    assert 0 in out and out[0] == 1.0


def test_ivf_delete_excludes_from_any_probe(spark, sf_dir, tmp_path):
    """After delete_from_ivf_index, no probe (any nprobe) may return a
    deleted id; undeleted results are unchanged vs a rebuilt-without-them
    index. The data files must not be rewritten (O(deleted) commit)."""
    from retail_datalakehouse_spark.operators.similarity import (
        build_ivf_index,
        delete_from_ivf_index,
        ivf_topk_indexed,
        seeded_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    p_mor = str(tmp_path / "ivf_mor")
    p_rebuild = str(tmp_path / "ivf_rebuild")
    build_ivf_index(e, cents, p_mor)
    deleted = e.filter(F.col("vec_id") % 5 == 0)
    delete_from_ivf_index(deleted, p_mor)
    build_ivf_index(e.filter(F.col("vec_id") % 5 != 0), cents, p_rebuild)

    q = list(e.filter(F.col("vec_id") == 3).head()["embedding"])
    for nprobe in (1, 2, 8):
        a = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, p_mor, cents, q, k=10, nprobe=nprobe).collect()]
        b = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, p_rebuild, cents, q, k=10, nprobe=nprobe).collect()]
        assert a == b
        assert all(v % 5 != 0 for v, _ in a)


def test_bloom_no_false_negatives(spark):
    """Every inserted element must probe true (Bloom's guarantee); a
    disjoint probe set must see a low false-positive rate at these
    parameters — and the Python build must agree with the Spark probe
    bit-for-bit (the modular-arithmetic contract in operators/bloom.py)."""
    from retail_datalakehouse_spark.operators.bloom import (
        bloom_probe,
        build_bloom,
        shingle_hash,
    )

    inserted = spark.range(0, 2000).select(
        shingle_hash(F.concat(F.lit("in-"), F.col("id"))).alias("h")
    )
    words = build_bloom([r.h for r in inserted.collect()])
    n_in = inserted.filter(bloom_probe(words, F.col("h"))).count()
    assert n_in == 2000  # zero false negatives, build/probe bit-parity

    other = spark.range(0, 20000).select(
        shingle_hash(F.concat(F.lit("out-"), F.col("id"))).alias("h")
    )
    fp = other.filter(bloom_probe(words, F.col("h"))).count()
    assert fp / 20000 < 0.05, f"false-positive rate too high: {fp}/20000"


def test_bloom_build_agg_equivalence(spark):
    """The distributed build (groupBy word_idx + bit_or, ~2 KB collect)
    must produce the EXACT word array the driver-local literal builder
    does — including duplicate hashes (bit_or idempotence), negative
    xxhash-free inputs, and the signed-int64 top-bit edge — so swapping
    it into l4_bloom_decontamination changes nothing but the collect
    size."""
    from retail_datalakehouse_spark.operators.bloom import (
        build_bloom,
        build_bloom_agg,
        shingle_hash,
    )

    hashes_df = (
        spark.range(0, 3000)
        # id % 1000 injects duplicates: every hash inserted three times
        .select(shingle_hash((F.col("id") % 1000).cast("string")).alias("h"))
    )
    local = build_bloom(sorted({r.h for r in hashes_df.collect()}))
    dist = build_bloom_agg(hashes_df)
    assert dist == local
    # smaller array exercises the dense-fill path (most words untouched)
    local_s = build_bloom([r.h for r in hashes_df.limit(5).collect()], m_bits=1 << 12)
    dist_s = build_bloom_agg(hashes_df.limit(5), m_bits=1 << 12)
    assert dist_s == local_s


def test_ivf_recluster_restores_balance_and_loses_nothing(spark, sf_dir, tmp_path):
    """Drift drill: skewed appends pile rows into one frozen centroid's
    cluster; re-clustering must (a) keep exactly the same vector ids,
    (b) reduce the imbalance ratio, and (c) leave all-probe search
    exactly equal to brute force over the reclustered index."""
    from pyspark.sql import functions as F

    from retail_datalakehouse_spark.catalog import load_table
    from retail_datalakehouse_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_balance,
        ivf_topk_indexed,
        read_ivf_index,
        recluster_ivf_index,
        seeded_centroids,
        topk_cosine,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    idx = str(tmp_path / "ivf")
    build_ivf_index(e, cents, idx)

    # skewed ingest: clones of ONE vector flood its cluster
    hot = e.filter(F.col("vec_id") == 3).head()["embedding"]
    clones = spark.range(100_000, 100_150).select(
        F.col("id").alias("vec_id"),
        F.lit([float(x) for x in hot]).cast("array<float>").alias("embedding"),
    )
    assert append_to_ivf_index(clones, cents, idx, txn=("skew", 0)) is True

    before = ivf_balance(spark, idx).head()["imbalance_pct"]
    new_cents = recluster_ivf_index(spark, idx, str(tmp_path / "ivf2"), c=8)
    after = ivf_balance(spark, str(tmp_path / "ivf2")).head()["imbalance_pct"]
    assert after < before  # drift repaired

    old_ids = {r.vec_id for r in read_ivf_index(spark, idx).select("vec_id").collect()}
    new_ids = {
        r.vec_id
        for r in read_ivf_index(spark, str(tmp_path / "ivf2")).select("vec_id").collect()
    }
    assert new_ids == old_ids  # nothing lost, nothing invented

    # all-probe search over the new index == exact brute force
    q = [float(x) for x in e.filter(F.col("vec_id") == 11).head()["embedding"]]
    exact = topk_cosine(read_ivf_index(spark, str(tmp_path / "ivf2")), q, k=10).collect()
    probed = ivf_topk_indexed(
        spark, str(tmp_path / "ivf2"), new_cents, q, k=10, nprobe=8
    ).collect()
    assert [r.vec_id for r in probed] == [r.vec_id for r in exact]


def test_ivf_compaction_reclaims_tombstones_same_results(spark, sf_dir, tmp_path):
    """Offline compaction must (a) rewrite ONLY partitions holding
    tombstoned rows, (b) physically drop the deleted rows and the
    tombstone table, (c) leave every probe's results bit-identical, and
    (d) stay read-correct at the documented crash points (tombstones
    removed last; interrupted partition swaps healed)."""
    import os
    import shutil

    from retail_datalakehouse_spark.operators.similarity import (
        build_ivf_index,
        compact_ivf_index,
        delete_from_ivf_index,
        ivf_topk_indexed,
        read_ivf_index,
        seeded_centroids,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    cents = seeded_centroids(e, c=8)
    path = str(tmp_path / "ivf_compact")
    build_ivf_index(e, cents, path)

    # delete a slice that does NOT touch every cluster
    victims = read_ivf_index(spark, path).filter("centroid_id = 0 and vec_id % 2 = 0")
    n_victims = victims.count()
    assert n_victims > 0
    delete_from_ivf_index(victims.select("vec_id"), path)

    q = list(e.filter(F.col("vec_id") == 3).head()["embedding"])
    before = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, path, cents, q, k=10, nprobe=8).collect()]
    n_live = read_ivf_index(spark, path).count()

    stats = compact_ivf_index(spark, path)
    assert stats["rows_removed"] == n_victims
    assert 0 < stats["partitions_rewritten"] < 8  # untouched clusters kept
    assert not os.path.isdir(os.path.join(path, "_tombstones"))
    # physical rows now equal live rows; probe results unchanged
    assert spark.read.parquet(path).count() == n_live == read_ivf_index(spark, path).count()
    after = [(r.vec_id, r.cos_sim) for r in ivf_topk_indexed(spark, path, cents, q, k=10, nprobe=8).collect()]
    assert after == before
    # idempotent when nothing to do
    assert compact_ivf_index(spark, path) == {"partitions_rewritten": 0, "rows_removed": 0}

    # crash drill: partition renamed away, replacement never landed
    part = os.path.join(path, "centroid_id=1")
    os.rename(part, part + ".old")
    healed = read_ivf_index(spark, path)  # reader heals the swap
    assert os.path.isdir(part) and healed.count() == n_live


def test_oph_signature_dedup_recall(spark, docs_df):
    """One-permutation signatures: identical docs → identical signatures;
    the 16x4 banding over OPH bins must surface every true near-dup of
    the fixture, and the verify stage yields exactly the classic
    pipeline's pair set."""
    from retail_datalakehouse_spark.operators.minhash import oph_signature

    sig = oph_signature(docs_df, "text", k=64, w=3, id_cols=["doc_id"])
    rows = {r.doc_id: list(r.signature) for r in sig.collect()}
    assert all(len(s) == 64 for s in rows.values())
    assert rows[0] == rows[4]  # exact dup: bit-identical signature
    cand = lsh_candidate_pairs(sig, "doc_id", 16, 4)
    verified = jaccard_pairs(
        docs_df, "doc_id", "text", w=3, threshold=0.5, candidates=cand
    )
    got = {(r.id_a, r.id_b) for r in verified.collect()}
    assert got == {(0, 1), (0, 4), (1, 4)}  # same set as the k-perm pipeline
