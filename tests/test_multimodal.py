"""Multimodal plumbing tests: schema, batch shapes, determinism of the
stubbed decode, frame-schedule correctness, and composition with the
similarity operators."""

import hashlib

import pytest
from pyspark.sql import functions as F

from py_sema_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_stats,
    frame_sample,
    media_features,
    media_from_documents,
    phash,
    phash_neardup,
    resize_images,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return media_from_documents(docs).persist()


def test_media_table_shape(media):
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.where(F.col("kind") == "video").first()
    assert row["meta"]["mime"] == "video/mp4"
    assert row["meta"]["duration_ms"] > 0
    assert isinstance(row["content"], bytearray) or isinstance(
        row["content"], bytes
    )


def test_decode_stats_deterministic(media):
    a = {r["media_id"]: (r["mean"], r["std"]) for r in decode_stats(media).collect()}
    b = {r["media_id"]: (r["mean"], r["std"]) for r in decode_stats(media).collect()}
    assert a == b and len(a) == media.count()
    assert all(0.0 <= m <= 1.0 for m, _ in a.values())


def test_media_features_feed_similarity(media):
    from py_sema_spark.operators.similarity import cosine_topk

    feats = media_features(media)
    row = feats.first()
    assert len(row["feature"]) == FEATURE_DIM
    queries = feats.limit(2).select(
        F.col("media_id").alias("q_id"), F.col("feature").alias("q_vec")
    )
    topk = cosine_topk(
        feats, queries, k=3, id_col="media_id", vec_col="feature"
    )
    got = topk.where(F.col("rank") == 1).collect()
    # self-similarity wins rank 1 (cos == 1 with deterministic features)
    assert all(r["q_id"] == r["media_id"] for r in got)


def test_resize_only_touches_images(media):
    out = resize_images(media, 64, 64).persist()
    img = out.where(F.col("kind") == "image").first()
    assert bytes(img["content"])[:4] == b"RSZ0"
    assert img["meta"]["width"] == 64 and img["meta"]["height"] == 64
    aud = out.where(F.col("kind") == "audio").first()
    orig = media.where(F.col("media_id") == aud["media_id"]).first()
    assert bytes(aud["content"]) == bytes(orig["content"])


def test_frame_sample_schedule_and_content(media):
    frames = frame_sample(media, every_ms=500).persist()
    vids = media.where(F.col("kind") == "video").collect()
    # ceil(duration/500): timestamps live in [0, duration)
    expected = sum(-(-r["meta"]["duration_ms"] // 500) for r in vids)
    assert frames.count() == expected
    one = frames.where(F.col("frame_idx") == 1).first()
    assert one["ts_ms"] == 500
    src = media.where(F.col("media_id") == one["media_id"]).first()
    want = hashlib.sha256(
        bytes(src["content"]) + int(500).to_bytes(8, "big")
    ).digest()
    assert bytes(one["frame"]) == want

    capped = frame_sample(media, every_ms=500, max_frames=3)
    assert capped.groupBy("media_id").count().agg(
        F.max("count")
    ).collect()[0][0] <= 3

    # max_frames=0: no frames at all — not a bogus [0, -1] descending
    # sequence (round-3 review fix)
    assert frame_sample(media, every_ms=500, max_frames=0).count() == 0


def test_phash_banding_matches_all_pairs(media):
    """The (max_hamming+1)-band pigeonhole join must find exactly the
    pairs an all-pairs Hamming scan finds — banding is a candidate
    *generator*, never a filter on true pairs."""
    hashes = {r["media_id"]: r["phash"] for r in phash(media).collect()}
    ids = sorted(hashes)
    want = {
        (a, b, bin(hashes[a] ^ hashes[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 2
    }
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in phash_neardup(media, max_hamming=2).collect()
    }
    assert got == want and len(want) > 0


def test_phash_deterministic_and_bounded(media):
    a = {r["media_id"]: r["phash"] for r in phash(media).collect()}
    b = {r["media_id"]: r["phash"] for r in phash(media).collect()}
    assert a == b
    assert all(0 <= h < 2**FEATURE_DIM for h in a.values())


class TestLinkFollow:
    """Discovery J8: describedby links found in HTML pages re-enter
    extraction as a bounded frontier join (discovery.py:195-207)."""

    def test_seeded_link_follow(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.operators.extract import (
            extract_structured,
            extract_with_link_follow,
            links_of,
        )
        from py_sema_spark.sources.corpus import (
            _h,
            page_kind,
            page_url,
            synth_corpus,
        )

        corpus = synth_corpus(spark, 150, seed=42).persist()
        # seed: an html page whose describedby target is itself a page
        # with structured data (noise targets legitimately add nothing)
        html_idx = next(
            i
            for i in range(150)
            if page_kind(42, i) == "html"
            and page_kind(42, (_h(42, i, "desc") % 150) or 1) in ("ttl", "jsonld")
        )
        seed_url = page_url(html_idx)
        seeds = spark.createDataFrame([(seed_url,)], "url string")

        trips = extract_with_link_follow(corpus, seeds, max_hops=1).persist()
        # the seed page's own JSON-LD script triples are present …
        assert trips.where(F.col("src_url") == seed_url).count() > 0
        # … and the describedby target got dereferenced too
        linked = links_of(
            extract_structured(
                corpus.where(F.col("url") == seed_url)
            )
        ).collect()
        assert linked, "html fixture page should carry a describedby link"
        target = linked[0]["link_url"]
        assert trips.where(F.col("src_url") == target).count() > 0
        srcs = {r["src_url"] for r in trips.select("src_url").distinct().collect()}
        assert srcs == {seed_url, target}


class TestScalePrimitives:
    def test_ivf_topk_recall(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from py_sema_spark.operators.similarity import (
            cosine_topk,
            ivf_cosine_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
        queries = emb.where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = ivf = None
        exact = {
            (r["q_id"], r["vec_id"])
            for r in cosine_topk(emb, queries, k=3).collect()
        }
        ivf = {
            (r["q_id"], r["vec_id"])
            for r in ivf_cosine_topk(
                emb, queries, k=3, n_lists=8, n_probe=4
            ).collect()
        }
        # self-match always survives (query's own list is its nearest)
        assert all((q, q) in ivf for q in range(5))
        recall = len(exact & ivf) / len(exact)
        assert recall >= 0.4  # probe 4/8 lists → partial recall by design
        # degrades to brute force when probing every list
        full = {
            (r["q_id"], r["vec_id"])
            for r in ivf_cosine_topk(
                emb, queries, k=3, n_lists=8, n_probe=8
            ).collect()
        }
        assert full == exact

    def test_hub_salting_spreads_subject(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.model import with_subject_bucket

        # one hub subject with 5k rows + background subjects
        hub = spark.range(5000).select(
            F.lit("urn:hub").alias("s"),
            F.lit("urn:p:member").alias("p"),
            F.concat(F.lit("urn:m:"), F.col("id").cast("string")).alias("o"),
        )
        out = with_subject_bucket(hub, n_buckets=64, hub_salt=16)
        # the hub's rows land in ONE s_bucket but spread over the salts
        assert out.select("s_bucket").distinct().count() == 1
        salt_counts = out.groupBy("salt").count().collect()
        assert len(salt_counts) == 16
        sizes = [r["count"] for r in salt_counts]
        assert max(sizes) < 5000 * 0.2  # no salt partition dominates

    def test_materialize_roundtrip(self, spark, tmp_path):
        """materialize_triples: dedup + bucket/salt + partitioned write;
        read-back equals the deduped input and partition dirs exist."""
        import os

        from pyspark.sql import functions as F

        from py_sema_spark.model import materialize_triples

        df = spark.range(200).select(
            F.concat(F.lit("urn:s:"), (F.col("id") % 40).cast("string")).alias("s"),
            F.lit("urn:p").alias("p"),
            F.concat(F.lit("o"), (F.col("id") % 100).cast("string")).alias("o"),
            F.lit("literal").alias("o_kind"),
            F.lit(None).cast("string").alias("o_datatype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
        dup = df.unionByName(df)  # set semantics must collapse this
        path = str(tmp_path / "mat")
        materialize_triples(dup, path, n_buckets=8, hub_salt=4)
        back = spark.read.parquet(path)
        assert back.count() == df.distinct().count()
        assert any(d.startswith("s_bucket=") for d in os.listdir(path))
        # deterministic skolem-free content roundtrip
        a = {tuple(r) for r in df.distinct().select("s", "p", "o").collect()}
        b = {tuple(r) for r in back.select("s", "p", "o").collect()}
        assert a == b

    def test_skolemize_determinism(self, spark):
        from pyspark.sql import functions as F

        from py_sema_spark.model import skolemize

        df = spark.createDataFrame(
            [
                ("_:b0", "urn:p", "_:b1", "bnode", None, None, "https://x/1"),
                ("_:b0", "urn:p", "lit", "literal", None, None, "https://x/1"),
                ("_:b0", "urn:p", "lit", "literal", None, None, "https://x/2"),
            ],
            "s string, p string, o string, o_kind string,"
            " o_datatype string, o_lang string, src_url string",
        )
        out = skolemize(df).collect()
        subs = {r["src_url"]: r["s"] for r in out}
        # same (url, label) → same IRI; different url → different IRI
        assert subs["https://x/1"].startswith("urn:skolem:")
        assert subs["https://x/1"] != subs["https://x/2"]
        o_kinds = {r["o_kind"] for r in out}
        assert "bnode" not in o_kinds
        again = {r["src_url"]: r["s"] for r in skolemize(df).collect()}
        assert again == subs


def test_frame_schedule_excludes_duration_boundary(spark):
    """A duration that is an exact multiple of every_ms must NOT get a
    frame at ts == duration (no decodable frame there), and a zero-
    duration video gets no frames at all."""
    rows = [
        (1, "video", b"x", (1000,)),
        (2, "video", b"y", (1200,)),
        (3, "video", b"z", (0,)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary,"
        " meta struct<duration_ms:int>",
    )
    got = {
        r["media_id"]: r["ts"]
        for r in frame_sample(media, every_ms=500)
        .groupBy("media_id")
        .agg(F.collect_list("ts_ms").alias("ts"))
        .collect()
    }
    assert sorted(got[1]) == [0, 500]
    assert sorted(got[2]) == [0, 500, 1000]
    assert 3 not in got
