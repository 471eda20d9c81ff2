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
