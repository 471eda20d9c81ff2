"""Curation operators: decontamination, stratified sampling, shard
packing (operators/curation.py)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from py_sema_spark.operators.curation import (
    blocklist_filter,
    decontaminate,
    domain_cap,
    domain_stats,
    repetition_metrics,
    stratified_sample,
    token_budget_pack,
    word_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "en"),
        (1, "alpha beta gamma delta epsilon eta", "en"),
        (2, "one two three four five six seven", "en"),
        (3, "uno dos tres cuatro cinco seis", "de"),
        (4, "alpha beta gamma delta epsilon zeta extra", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestDecontaminate:
    def test_flags_overlapping_docs(self, spark, docs):
        bench = docs.where(F.col("doc_id") == 0)
        out = decontaminate(docs, bench, n=5).orderBy("doc_id").collect()
        flags = {r.doc_id: r.contaminated for r in out}
        # doc 0 is the benchmark itself; 1 shares the 5-gram
        # "alpha beta gamma delta epsilon"; 4 shares two 5-grams
        assert flags == {0: True, 1: True, 2: False, 3: False, 4: True}
        hits = {r.doc_id: r.n_hits for r in out}
        assert hits[2] == 0 and hits[4] == 2

    def test_every_input_doc_is_reported(self, spark, docs):
        bench = docs.where(F.lit(False))  # empty benchmark
        out = decontaminate(docs, bench, n=5)
        assert out.count() == docs.count()
        assert out.where(F.col("contaminated")).count() == 0

    def test_ngram_count_matches_token_arithmetic(self, spark, docs):
        grams = word_ngrams(docs, 3).groupBy("doc_id").count().collect()
        # doc 0 has 6 tokens → 4 distinct 3-grams
        assert {r.doc_id: r["count"] for r in grams}[0] == 4

    def test_short_doc_emits_no_subngram(self, spark):
        """A doc with fewer than n tokens has NO n-grams: before the
        round-3 fix the whole token list leaked out as a bogus sub-n
        gram, so a 4-token doc identical to a 4-token benchmark doc
        was flagged contaminated under the 13-gram protocol."""
        docs = spark.createDataFrame(
            [(0, "alpha beta gamma delta")], "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            [(9, "alpha beta gamma delta")], "doc_id long, text string"
        )
        assert word_ngrams(docs, 5).count() == 0
        row = decontaminate(docs, bench, n=5).first()
        assert row.n_hits == 0 and not row.contaminated

    def test_benchmark_side_is_broadcast(self, spark, docs):
        plan = decontaminate(docs, docs.limit(2), n=5)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestStratifiedSample:
    def test_deterministic(self, spark, docs):
        a = stratified_sample(docs, {"en": 8}, 4, salt="x")
        b = stratified_sample(docs, {"en": 8}, 4, salt="x")
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        )

    def test_rates_are_respected(self, spark):
        n = 4000
        big = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("t").alias("text"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        )
        out = stratified_sample(big, {"en": 8, "de": 2}, salt="s")
        by_lang = {
            r.lang: r["count"]
            for r in out.groupBy("lang").count().collect()
        }
        # md5 digits are uniform: en ≈ n/2 · 8/16, de ≈ n/2 · 2/16
        assert abs(by_lang["en"] - n / 2 * 0.5) < n / 2 * 0.08
        assert abs(by_lang.get("de", 0) - n / 2 * 0.125) < n / 2 * 0.06

    def test_no_shuffle_in_plan(self, spark, docs):
        plan = stratified_sample(docs, {"en": 8})._jdf.queryExecution(
        ).executedPlan().toString()
        assert "Exchange" not in plan

    def test_rate_bounds_validated(self, spark, docs):
        with pytest.raises(ValueError):
            stratified_sample(docs, {"en": 17})
        with pytest.raises(ValueError):
            stratified_sample(docs, {"en": 8}, default_sixteenths=17)

    def test_sixteen_keeps_everything(self, spark):
        """16/16 must keep EVERY row — the old lexicographic bound
        format(16,'x')='10' silently kept only keys starting '0'."""
        big = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.lit("t").alias("text"),
            F.lit("en").alias("lang"),
        )
        assert stratified_sample(big, {"en": 16}).count() == 500

    def test_null_group_survives_rebalance(self, spark):
        """A NULL group (language-ID abstained) is a group like any
        other: at temperature 1.0 every row must survive, including
        the NULL-lang ones the old equi-join silently dropped."""
        from py_sema_spark.operators.curation import temperature_rebalance

        rows = [(i, "t", "en" if i % 3 else None) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = temperature_rebalance(df, temperature=1.0)
        assert out.count() == 60
        assert out.where(F.col("lang").isNull()).count() == 20

    def test_token_budget_pack_string_ids(self, spark):
        """String doc ids must pack (the numeric division would cast
        to NULL and the offsets join silently returned zero rows)."""
        from py_sema_spark.operators.curation import token_budget_pack

        rows = [(f"doc-{i:04d}", "one two three") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        out = token_budget_pack(df, budget=30).collect()
        assert len(out) == 40
        # 3 tokens/doc, budget 30 → 10 docs per shard in id order
        shard_of = {r.doc_id: r.shard_id for r in out}
        assert shard_of["doc-0000"] == 0 and shard_of["doc-0039"] == 3


class TestRepetitionMetrics:
    def test_hand_computed_fractions(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b a b a")], "doc_id long, text string"
        )
        row = repetition_metrics(docs, top_ns=(2, 3), dup_ns=(5,)).first()
        # len(text)=9; top 2-gram "a b" occurs twice, len 3 → 6/9;
        # top 3-gram "a b a" occurs twice, len 5 → 10/9; the single
        # 5-gram occurs once → dup5 = 0
        assert row.top2gram_char_frac == pytest.approx(6 / 9)
        assert row.top3gram_char_frac == pytest.approx(10 / 9)
        assert row.dup5gram_char_frac == 0.0

    def test_dup_fraction_counts_all_repeats(self, spark):
        text = "x y z w v " * 3  # every 5-gram window repeats
        docs = spark.createDataFrame(
            [(0, text.strip())], "doc_id long, text string"
        )
        row = repetition_metrics(docs, top_ns=(2,), dup_ns=(5,)).first()
        assert row.dup5gram_char_frac > 1.0  # occurrences overlap

    def test_short_and_empty_docs_report_zero(self, spark):
        docs = spark.createDataFrame(
            [(0, ""), (1, "one"), (2, "two words")],
            "doc_id long, text string",
        )
        out = repetition_metrics(docs, top_ns=(3,), dup_ns=(5,)).collect()
        assert len(out) == 3
        for r in out:
            assert r.top3gram_char_frac == 0.0
            assert r.dup5gram_char_frac == 0.0

    def test_no_per_row_quadratic_expression(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        )
        plan = repetition_metrics(docs)._jdf.queryExecution(
        ).optimizedPlan().toString()
        # occurrence counting must be a distributed aggregate over the
        # exploded grams, not an array self-scan inside one projection
        assert "Aggregate" in plan and "Generate explode" in plan


class TestDomainOps:
    @pytest.fixture(scope="class")
    def many(self, spark):
        return spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), (F.col("id") % 3).cast("string")).alias(
                "source"
            ),
            (F.col("id") % 7 + 1).alias("n_chars"),
        )

    def test_domain_cap_bounds_every_domain(self, spark, many):
        out = domain_cap(many, k=10, salt="t")
        counts = out.groupBy("source").count().collect()
        assert all(r["count"] == 10 for r in counts)

    def test_domain_cap_deterministic(self, spark, many):
        a = sorted(r.doc_id for r in domain_cap(many, 5, salt="t").collect())
        b = sorted(r.doc_id for r in domain_cap(many, 5, salt="t").collect())
        assert a == b

    def test_domain_cap_uses_window_group_limit(self, spark, many):
        plan = domain_cap(many, 10)._jdf.queryExecution().executedPlan(
        ).toString()
        assert "WindowGroupLimit" in plan

    def test_blocklist_filter_drops_only_listed(self, spark, many):
        out = blocklist_filter(many, ["src1"])
        srcs = {r.source for r in out.select("source").distinct().collect()}
        assert srcs == {"src0", "src2"}

    def test_blocklist_is_broadcast(self, spark, many):
        plan = blocklist_filter(many, ["src1"])._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_domain_stats_values(self, spark, many):
        rows = {r.source: r for r in domain_stats(many).collect()}
        assert rows["src0"].n_docs == 100
        assert rows["src0"].total_chars == sum(i % 7 + 1 for i in range(0, 300, 3))
        assert rows["src0"].mean_chars == pytest.approx(
            rows["src0"].total_chars / 100
        )


class TestTokenBudgetPack:
    def test_matches_naive_global_window(self, spark):
        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.array_repeat(F.lit("w"), (F.col("id") % 37 + 1).cast("int")),
            ).alias("text"),
        )
        fast = token_budget_pack(docs, budget=100, chunk=64)
        w = Window.orderBy("doc_id")
        naive = (
            docs.select(
                "doc_id",
                F.size(F.split("text", " ")).alias("n_tokens"),
            )
            .withColumn(
                "shard_id",
                F.floor(
                    (F.sum("n_tokens").over(w) - F.col("n_tokens")) / 100
                ).cast("int"),
            )
        )
        assert fast.exceptAll(naive).isEmpty()
        assert naive.exceptAll(fast).isEmpty()

    def test_shards_fill_sequentially(self, spark):
        docs = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.lit("a b c d e").alias("text"),  # 5 tokens each
        )
        out = token_budget_pack(docs, budget=10, chunk=4).orderBy("doc_id")
        shards = [r.shard_id for r in out.collect()]
        # 5 tokens/doc, budget 10 → two docs per shard
        assert shards == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]

    def test_chunk_window_is_partitioned(self, spark):
        docs = spark.range(100).select(
            F.col("id").alias("doc_id"), F.lit("a b").alias("text")
        )
        plan = token_budget_pack(docs, budget=10, chunk=16)._jdf.\
            queryExecution().executedPlan().toString()
        # the per-row window must be keyed on the chunk, not global
        assert "partitionspec=[_chunk" in plan.lower().replace(" ", "") or \
            "_chunk" in plan


class TestUrlOps:
    def test_canonicalize_vectors(self, spark):
        from py_sema_spark.functions.web import url_canonicalize

        cases = [
            ("HTTP://WWW.Example.ORG:80/A/b/?utm_source=x&b=2&a=1#f",
             "http://example.org/A/b?a=1&b=2"),
            ("https://example.org:443/x", "https://example.org/x"),
            ("https://example.org:8443/x", "https://example.org:8443/x"),
            ("http://example.org/", "http://example.org"),
            ("http://example.org/p?fbclid=abc", "http://example.org/p"),
            ("http://example.org/p?z=1&y=2", "http://example.org/p?y=2&z=1"),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
        )
        from pyspark.sql import functions as F

        got = {
            r.i: r.c
            for r in df.select(
                "i", url_canonicalize(F.col("url")).alias("c")
            ).collect()
        }
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, (cases[i][0], got[i], want)

    def test_url_dedup_keeps_min_id(self, spark):
        from py_sema_spark.operators.dedup import url_dedup

        df = spark.createDataFrame(
            [
                (5, "http://a.org/x?utm_source=1"),
                (2, "http://WWW.A.org/x/"),
                (9, "http://a.org/y"),
            ],
            "doc_id long, url string",
        )
        out = url_dedup(df).orderBy("doc_id").collect()
        assert [(r.doc_id, r.url_canon) for r in out] == [
            (2, "http://a.org/x"),
            (9, "http://a.org/y"),
        ]

    def test_url_dedup_group_limit_plan(self, spark):
        from py_sema_spark.operators.dedup import url_dedup

        df = spark.createDataFrame(
            [(1, "http://a.org/x")], "doc_id long, url string"
        )
        plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestIncrementalDedup:
    def test_cross_snapshot_and_in_batch(self, spark):
        from py_sema_spark.operators.dedup import incremental_exact_dedup

        seen_docs = spark.createDataFrame(
            [(0, "old page")], "doc_id long, text string"
        )
        from pyspark.sql import functions as F

        seen = seen_docs.select(F.md5("text").alias("content_hash"))
        new = spark.createDataFrame(
            [(10, "old page"), (11, "fresh"), (12, "fresh"), (13, "other")],
            "doc_id long, text string",
        )
        out = incremental_exact_dedup(new, seen).orderBy("doc_id").collect()
        assert [r.doc_id for r in out] == [11, 13]

    def test_state_advance_round_trip(self, spark):
        from py_sema_spark.operators.dedup import incremental_exact_dedup

        from pyspark.sql import functions as F

        batch1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "doc_id long, text string"
        )
        empty = batch1.limit(0).select(F.md5("text").alias("content_hash"))
        out1 = incremental_exact_dedup(batch1, empty)
        state = empty.unionByName(out1.select("content_hash"))
        batch2 = spark.createDataFrame(
            [(3, "a"), (4, "c")], "doc_id long, text string"
        )
        out2 = incremental_exact_dedup(batch2, state)
        assert [r.doc_id for r in out2.collect()] == [4]


class TestLmScore:
    def test_fluent_beats_shuffled(self, spark):
        from py_sema_spark.operators.curation import lm_score

        train = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(10)],
            "doc_id long, text string",
        )
        docs = spark.createDataFrame(
            [(100, "the cat sat on the mat"), (101, "mat the on cat sat the")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in lm_score(docs, train).collect()}
        assert rows[100].lm_logprob > rows[101].lm_logprob
        assert rows[100].n_bigrams == 5

    def test_short_docs_score_null(self, spark):
        from py_sema_spark.operators.curation import lm_score

        train = spark.createDataFrame(
            [(0, "a b c")], "doc_id long, text string"
        )
        docs = spark.createDataFrame(
            [(1, "single"), (2, "")], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in lm_score(docs, train).collect()}
        assert out[1].n_bigrams == 0 and out[1].lm_logprob is None
        assert out[2].n_bigrams == 0 and out[2].lm_logprob is None

    def test_vocab_attaches_without_collect(self, spark):
        from py_sema_spark.operators.curation import lm_score

        train = spark.createDataFrame(
            [(0, "a b a c")], "doc_id long, text string"
        )
        docs = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string"
        )
        # V=3, c(a)=2, c(a b)=1 → ln((1+0.5)/(2+0.5*3))
        import math

        row = lm_score(docs, train).first()
        assert row.lm_logprob == pytest.approx(
            round(math.log(1.5 / 3.5), 6), abs=1e-9
        )


class TestLmBuckets:
    def test_terciles_by_language(self, spark):
        from py_sema_spark.operators.curation import lm_buckets

        train = spark.createDataFrame(
            [(i, "the cat sat on the mat again and again", "en")
             for i in range(5)],
            "doc_id long, text string, lang string",
        )
        docs = spark.createDataFrame(
            [
                (0, "the cat sat on the mat", "en"),      # fluent
                (1, "the cat sat mat on the", "en"),      # shuffled
                (2, "zz qq xx ww vv uu tt", "en"),        # gibberish
                (3, "x", "en"),                           # unscorable
            ],
            "doc_id long, text string, lang string",
        )
        out = {r.doc_id: r.bucket for r in lm_buckets(docs, train).collect()}
        assert out[0] == "head"
        assert out[2] == "tail"
        assert out[3] == "tail"  # too short to score
        assert set(out.values()) <= {"head", "middle", "tail"}

    def test_every_doc_is_bucketed_once(self, spark, docs):
        from py_sema_spark.operators.curation import lm_buckets

        out = lm_buckets(docs, docs.where(F.col("lang") == "en"))
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()

    def test_no_per_language_global_sort_of_docs(self, spark, docs):
        from py_sema_spark.operators.curation import lm_buckets

        plan = lm_buckets(docs, docs)._jdf.queryExecution(
        ).optimizedPlan().toString()
        # thresholds come from the (lang, score) count table, never an
        # ntile/row_number over the full per-language doc set
        assert "ntile" not in plan.lower()
        assert "row_number" not in plan.lower()


class TestUrlCanonProperties:
    """Batch-property check: one Spark job over ~400 structurally
    random URLs, compared against an independent urllib-based Python
    reimplementation of the documented normalization rules."""

    @staticmethod
    def _py_canon(url: str) -> str:
        import re
        from urllib.parse import urlsplit

        u = url.split("#", 1)[0]
        sp = urlsplit(u)
        if sp.scheme and "://" in u:
            netloc = sp.netloc.lower()
            if netloc.startswith("www."):
                netloc = netloc[4:]
            if sp.scheme.lower() == "http" and netloc.endswith(":80"):
                netloc = netloc[:-3]
            if sp.scheme.lower() == "https" and netloc.endswith(":443"):
                netloc = netloc[:-4]
            prefix = sp.scheme.lower() + "://" + netloc
            rest = u.split("://", 1)[1]
            rest = rest[len(sp.netloc):]
        else:
            prefix, rest = "", u
        path = rest.split("?", 1)[0].rstrip("/")
        query = rest.split("?", 1)[1] if "?" in rest else ""
        keep = [
            p
            for p in query.split("&")
            if p
            and not re.match(
                r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|mc_cid|mc_eid|ref)(=|$)",
                p,
            )
        ]
        qstr = "&".join(sorted(keep))
        return prefix + path + ("?" + qstr if qstr else "")

    def _random_urls(self, n=400):
        import random

        rng = random.Random(42)
        urls = []
        for _ in range(n):
            scheme = rng.choice(["http", "HTTP", "https", "HTTPS"])
            www = rng.choice(["", "www.", "WWW."])
            host = rng.choice(["ex.org", "Sub.Ex.ORG", "a-b.net"])
            port = rng.choice(["", ":80", ":443", ":8080"])
            segs = "/".join(
                rng.choice(["p", "Q", "r2", "s-t"])
                for _ in range(rng.randint(0, 3))
            )
            trail = rng.choice(["", "/", "//"])
            params = "&".join(
                rng.sample(
                    ["a=1", "b=2", "utm_source=x", "fbclid=9",
                     "ref", "z=Z&y"],
                    rng.randint(0, 3),
                )
            )
            frag = rng.choice(["", "#f", "#a/b?c=1"])
            url = f"{scheme}://{www}{host}{port}"
            if segs:
                url += "/" + segs
            url += trail
            if params:
                url += "?" + params
            url += frag
            urls.append(url)
        return urls

    def test_matches_python_reference(self, spark):
        from py_sema_spark.functions.web import url_canonicalize

        urls = self._random_urls()
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "i long, url string"
        )
        got = {
            r.i: r.c
            for r in df.select(
                "i", url_canonicalize(F.col("url")).alias("c")
            ).collect()
        }
        for i, u in enumerate(urls):
            assert got[i] == self._py_canon(u), (u, got[i], self._py_canon(u))

    def test_idempotent(self, spark):
        from py_sema_spark.functions.web import url_canonicalize

        urls = self._random_urls(200)
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        once = df.select(url_canonicalize(F.col("url")).alias("c"))
        twice = once.select(url_canonicalize(F.col("c")).alias("c2"))
        pairs = once.collect(), twice.collect()
        assert [r.c for r in pairs[0]] == [r.c2 for r in pairs[1]]


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        from py_sema_spark.operators.curation import chunk_documents

        text = " ".join(f"t{i}" for i in range(10))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        out = chunk_documents(df, max_tokens=4, overlap=1).orderBy(
            "chunk_id"
        ).collect()
        # step 3: [t0..t3], [t3..t6], [t6..t9] — t9 is already covered
        # by the last window, so no trailing singleton chunk
        assert [r.chunk_text for r in out] == [
            "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
        ]
        assert [r.n_tokens for r in out] == [4, 4, 4]

    def test_short_and_empty(self, spark):
        from py_sema_spark.operators.curation import chunk_documents

        df = spark.createDataFrame(
            [(0, "a b"), (1, "")], "doc_id long, text string"
        )
        out = chunk_documents(df, max_tokens=5).collect()
        assert len(out) == 1  # empty doc yields no chunks
        assert out[0].chunk_text == "a b"

    def test_coverage_is_lossless_without_overlap(self, spark):
        from py_sema_spark.operators.curation import chunk_documents

        text = " ".join(f"w{i}" for i in range(100))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        out = chunk_documents(df, max_tokens=7, overlap=0).orderBy(
            "chunk_id"
        ).collect()
        rebuilt = " ".join(r.chunk_text for r in out)
        assert rebuilt == text

    def test_bad_overlap_rejected(self, spark):
        from py_sema_spark.operators.curation import chunk_documents

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, max_tokens=4, overlap=4)


class TestTfidfTopTerms:
    def test_distinctive_term_wins(self, spark):
        from py_sema_spark.operators.curation import tfidf_top_terms

        df = spark.createDataFrame(
            [
                (0, "common common zebra zebra zebra"),
                (1, "common words here"),
                (2, "common words there"),
            ],
            "doc_id long, text string",
        )
        top = tfidf_top_terms(df, k=1).collect()
        doc0 = [r for r in top if r.doc_id == 0][0]
        assert doc0.term == "zebra" and doc0.rank == 1

    def test_k_bound_and_tie_break(self, spark):
        from py_sema_spark.operators.curation import tfidf_top_terms

        df = spark.createDataFrame(
            [(0, "b a c"), (1, "x y")], "doc_id long, text string"
        )
        out = tfidf_top_terms(df, k=2)
        rows = [
            (r.term, r.rank) for r in out.where(F.col("doc_id") == 0)
            .orderBy("rank").collect()
        ]
        # all scores equal (each term df=1 tf=1) → alphabetical ties
        assert rows == [("a", 1), ("b", 2)]


class TestInvertedIndex:
    def test_postings_hand_computed(self, spark):
        from py_sema_spark.operators.curation import inverted_index

        docs = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
            ["doc_id", "text"],
        )
        rows = {
            r["token"]: r for r in inverted_index(docs, min_df=1).collect()
        }
        assert rows["apple"]["df"] == 2
        assert rows["apple"]["total_tf"] == 3
        assert rows["apple"]["postings"] == "1:2,3:1"
        assert rows["banana"]["postings"] == "1:1,2:1"
        assert rows["cherry"]["df"] == 1

    def test_min_df_prunes(self, spark):
        from py_sema_spark.operators.curation import inverted_index

        docs = spark.createDataFrame(
            [(1, "common rare"), (2, "common")], ["doc_id", "text"]
        )
        toks = {
            r["token"] for r in inverted_index(docs, min_df=2).collect()
        }
        assert toks == {"common"}


class TestBm25:
    def test_ranking_properties(self, spark):
        from py_sema_spark.operators.curation import bm25_score

        docs = spark.createDataFrame(
            [
                (1, "spark spark spark filler filler"),
                (2, "spark filler filler filler filler"),
                (3, "spark filler"),          # same tf as 2, shorter doc
                (4, "nothing relevant here"),
            ],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r["score"]
            for r in bm25_score(docs, ["spark"], top_k=10).collect()
        }
        assert 4 not in rows                  # no query term → unscored
        assert rows[1] > rows[2]              # higher tf wins
        assert rows[3] > rows[2]              # length normalization
        assert all(s > 0 for s in rows.values())

    def test_collection_constants_include_empty_docs(self, spark):
        """N and avgdl are collection constants (Robertson): a
        zero-token doc counts toward both. Pinned against the closed
        form — N=3, avgdl=1.0, df=1 → idf=ln(8/3), and for d1 (tf=2,
        dl=2): idf·(2·2.2)/(2+1.2·(0.25+0.75·2)) ≈ 1.052597."""
        import math
        from py_sema_spark.operators.curation import bm25_score

        docs = spark.createDataFrame(
            [(1, "spark spark"), (2, "table"), (3, "")],
            ["doc_id", "text"],
        )
        rows = {
            r["doc_id"]: r["score"]
            for r in bm25_score(docs, ["spark"], top_k=10).collect()
        }
        idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
        want = round(round(idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 1.5)), 8), 6)
        assert rows[1] == pytest.approx(want, abs=1e-6)


class TestLengthOutlierFilter:
    def test_band_keeps_middle(self, spark):
        from py_sema_spark.operators.curation import length_outlier_filter

        rows = [(i, "x", i * 10) for i in range(1, 12)]  # 10..110
        docs = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
        kept = {
            r["doc_id"]
            for r in length_outlier_filter(
                docs, "n_chars", ["lang"], 0.10, 0.90
            ).collect()
        }
        # p10 = 20, p90 = 100 (linear interpolation on 11 values)
        assert kept == set(range(2, 11))


class TestTemperatureRebalance:
    def test_rare_group_kept_whole_big_group_flattened(self, spark):
        from py_sema_spark.operators.curation import temperature_rebalance

        rows = [(i, "en") for i in range(400)] + [
            (1000 + i, "mi") for i in range(10)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        kept = temperature_rebalance(docs, temperature=0.5)
        by = {
            r.lang: r.n
            for r in kept.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        # rate(mi)=1.0 → all 10 kept; rate(en)=(400/10)^-.5≈0.158
        assert by["mi"] == 10
        assert 30 < by["en"] < 100  # ~63 expected, hash-deterministic

    def test_deterministic_under_repartition(self, spark):
        from py_sema_spark.operators.curation import temperature_rebalance

        rows = [(i, "en" if i % 5 else "de") for i in range(500)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        a = {r.doc_id for r in temperature_rebalance(docs).collect()}
        b = {
            r.doc_id
            for r in temperature_rebalance(docs.repartition(13)).collect()
        }
        assert a == b and a

    def test_tau_one_keeps_everything(self, spark):
        from py_sema_spark.operators.curation import temperature_rebalance

        rows = [(i, "en" if i % 3 else "fr") for i in range(90)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        assert temperature_rebalance(docs, temperature=1.0).count() == 90


class TestNegativeSamples:
    def test_excludes_self_and_positives_and_is_deterministic(self, spark):
        from py_sema_spark.operators.curation import negative_samples

        ids = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        pos = spark.createDataFrame(
            [(i, (i + 1) % 50) for i in range(50)], "x long, y long"
        )
        out1 = {(r.a, r.b) for r in negative_samples(ids, pos, k=3).collect()}
        out2 = {(r.a, r.b)
                for r in negative_samples(ids.repartition(7), pos, k=3).collect()}
        assert out1 == out2 and out1
        assert all(a < b for a, b in out1)
        ring = {(min(i, (i + 1) % 50), max(i, (i + 1) % 50)) for i in range(50)}
        assert not (out1 & ring)

    def test_k_bounds_pair_count(self, spark):
        from py_sema_spark.operators.curation import negative_samples

        ids = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        out = negative_samples(ids, None, k=2)
        assert 0 < out.count() <= 200


class TestQualityAudit:
    def test_null_counts_as_violation_one_scan(self, spark):
        from py_sema_spark.operators.curation import quality_audit

        df = spark.createDataFrame(
            [(1, "en"), (2, None), (3, "xx")], "id long, lang string"
        )
        out = quality_audit(
            df, {"lang_known": F.col("lang").isin("en", "de")}
        )
        rows = out.collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.rule, r.violations, r.total) == ("lang_known", 2, 3)
        # one scan: a single Aggregate over the source, no join
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan


class TestRepetitionRepeatedOnly:
    def test_unique_grams_have_zero_top_fraction(self, spark):
        """A doc with no repeated n-gram has zero repetition signal —
        the most character-covering gram only counts when count >= 2."""
        docs = spark.createDataFrame(
            [(0, "a b c d e f g")], "doc_id long, text string"
        )
        row = repetition_metrics(docs, top_ns=(2, 3), dup_ns=(5,)).first()
        assert row.top2gram_char_frac == 0.0
        assert row.top3gram_char_frac == 0.0
