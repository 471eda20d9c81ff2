"""Config-driven traversal harvesting (SURVEY.md §3.3, M5).

Reference flow (/root/reference/sema/harvest/): a YAML config names
assertion tasks — subjects (literal list or SPARQL against the
*current* store state) × property paths — and the executor dereferences
subjects, verifies the path, follows partially-satisfied paths to the
next reachable node, dereferences that, and repeats until the path
holds or nothing is reachable (path_assertion.py:138-272). Every
dereference inserts the document's triples into the config's named
graph and is logged in an execution report
(execution_report.py:138-213); a ``snooze-till-graph-age-minutes``
gate skips configs whose graph is fresh (config_build.py:353-355).

Spark re-expression — the per-subject recursion becomes **batched
frontier rounds** (breadth-first instead of depth-first). One
documented divergence: at a partially-satisfied depth the reference
dereferences only the *first* reachable ``?o`` binding per step
(path_assertion.py:258-272 uses ``bindings[0]``) and loops; the batch
form dereferences *all* reachable nodes at that prefix depth in one
round. On DAG-shaped corpora both converge to the same store content
whenever the path ultimately verifies; the batch form may fetch
sibling documents the depth-first walk would have skipped after an
early success — the right trade at corpus scale, where per-document
sequencing would serialize the cluster:

    subjects ──deref──▶ store ──path-prefix join──▶ next frontier
        ▲                                               │
        └──────────────── until path verified ──────────┘

- *deref* = semi-join of the corpus on the frontier URLs →
  ``extract_structured`` (Arrow-batched) → skolemize → append;
- *path verification* = a J2 chain of predicate-sliced self-joins
  (`verify_path`), existence per subject = left-semi;
- the downloaded-set is an anti-joined DataFrame, so no page is
  parsed twice (the reference's ``downloaded_uris`` list);
- the execution report is a metrics DataFrame (per-assertion and
  per-download rows) — the lineage the north rule requires; it can be
  re-emitted as triples into the report graph via
  :func:`report_triples`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import GraphNameMapper, GraphRegistry, skolemize
from .operators.extract import extract_structured, triples_of
from .queries.bgp import bgp_select

# ---------------------------------------------------------------- paths

PPATH_RE = re.compile(r"(([^<>/\s]+)|<([^>]+)>)\s*/")


def ppath_split(ppath: str) -> List[str]:
    """Split a property path on '/' outside <…>
    (/root/reference/sema/harvest/helper.py:46-57)."""
    return [
        m.group(2) or m.group(3)
        for m in PPATH_RE.finditer(ppath + "/")
    ]


def resolve_uri(token: str, prefixes: Dict[str, str]) -> str:
    """CURIE/IRI resolution (helper.py:29-36): full IRIs and <…> pass
    through, ``pfx:local`` expands via the prefix map."""
    token = token.strip()
    if token.startswith("<") and token.endswith(">"):
        return token[1:-1]
    if "://" in token or token.startswith("urn:"):
        return token
    pfx, _, local = token.partition(":")
    if pfx in prefixes:
        return prefixes[pfx] + local
    raise ValueError(f"cannot resolve {token!r}: unknown prefix {pfx!r}")


def compile_ppath(ppath: str, prefixes: Dict[str, str]) -> List[str]:
    """'ex:a/ex:b' → [iri_a, iri_b]; '*' → ['*'] (deref-self marker,
    path_assertion.py:144-154)."""
    if ppath.strip() == "*":
        return ["*"]
    return [resolve_uri(p, prefixes) for p in ppath_split(ppath)]


# ---------------------------------------------------------------- config


@dataclass
class AssertTask:
    subjects_literal: List[str] = field(default_factory=list)
    subjects_sparql: Optional[str] = None
    paths: List[List[str]] = field(default_factory=list)


@dataclass
class HarvestConfig:
    name: str
    snooze_minutes: float
    prefixes: Dict[str, str]
    tasks: List[AssertTask]

    @classmethod
    def from_yaml(cls, text: str, name: str = "config") -> "HarvestConfig":
        """Casefolded-key YAML, shape per
        tests/harvest/scenarios/config/*.yml in the reference."""
        import yaml

        raw = yaml.safe_load(text)
        data = {str(k).lower(): v for k, v in raw.items()}
        if "snooze-till-graph-age-minutes" not in data:
            raise ValueError("config requires snooze-till-graph-age-minutes")
        if "assert" not in data:
            raise ValueError("config requires an assert block")
        prefixes = {
            str(k): str(v) for k, v in (data.get("prefix") or {}).items()
        }
        tasks = []
        for block in data["assert"]:
            block = {str(k).lower(): v for k, v in block.items()}
            subjects = {
                str(k).upper() if str(k).upper() == "SPARQL" else str(k).lower(): v
                for k, v in (block.get("subjects") or {}).items()
            }
            task = AssertTask(
                subjects_literal=[
                    str(s) for s in (subjects.get("literal") or [])
                ],
                subjects_sparql=subjects.get("SPARQL"),
                paths=[
                    compile_ppath(str(p), prefixes)
                    for p in (block.get("paths") or [])
                ],
            )
            tasks.append(task)
        return cls(
            name=name,
            snooze_minutes=float(data["snooze-till-graph-age-minutes"]),
            prefixes=prefixes,
            tasks=tasks,
        )


# ---------------------------------------------------------------- engine


def verify_path(
    triples: DataFrame, subjects: DataFrame, path: Sequence[str]
) -> DataFrame:
    """Subjects for which ``s p1/p2/…/pk ?o`` has ≥1 binding (J2/J6:
    bound-subject star join; each step filters its predicate slice
    before joining — pushdown keeps every hop narrow)."""
    return subjects.join(
        _reachable(triples, subjects, path).select("subject").distinct(),
        "subject",
        "left_semi",
    )


def _reachable(
    triples: DataFrame, subjects: DataFrame, path: Sequence[str]
) -> DataFrame:
    """(subject, node) pairs reachable via the exact path prefix chain."""
    cur = subjects.select(
        F.col("subject"), F.col("subject").alias("node")
    ).distinct()
    for pred in path:
        step = triples.where(F.col("p") == pred).select(
            F.col("s").alias("node"), F.col("o").alias("next")
        )
        cur = (
            cur.join(step, "node")
            .select("subject", F.col("next").alias("node"))
            .distinct()
        )
    return cur


class Harvester:
    """Executes harvest configs against a corpus DataFrame (the batch
    stand-in for live dereferencing — SURVEY.md §1.7) into a triples
    store DataFrame + registry + report."""

    REPORT_SCHEMA = (
        "kind string, config string, task int, subject string, path string,"
        " url string, success boolean, triple_count bigint, depth int"
    )

    def __init__(
        self,
        spark: SparkSession,
        corpus: DataFrame,
        registry: Optional[GraphRegistry] = None,
        mapper: Optional[GraphNameMapper] = None,
    ):
        self.spark = spark
        self.corpus = corpus
        self.registry = registry
        self.mapper = mapper or GraphNameMapper()
        from .model import TRIPLE_SCHEMA

        self._empty = spark.createDataFrame([], TRIPLE_SCHEMA)

    def _deref(
        self, urls: DataFrame, downloaded: DataFrame
    ) -> Tuple[DataFrame, DataFrame, DataFrame]:
        """Dereference new urls: (new_triples, download_rows, downloaded').

        ``fresh`` and the returned ``downloaded'`` are localCheckpointed:
        ``downloaded'`` references ``downloaded`` twice (directly and
        through the anti-join in ``fresh``), so without a lineage cut
        the plan doubles every round — exponential analysis time after
        ~20 dereference rounds. An empty frontier short-circuits before
        the Arrow extraction stage (no Python workers for no work)."""
        fresh = (
            urls.join(downloaded, "url", "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        if fresh.isEmpty():
            empty_dl = self.spark.createDataFrame(
                [], "url string, triple_count bigint"
            )
            empty_triples = self._empty.select(
                "*", F.lit(None).cast("string").alias("src_url")
            )
            return empty_triples, empty_dl, downloaded
        pages = self.corpus.join(F.broadcast(fresh), "url", "left_semi")
        extracted = skolemize(triples_of(extract_structured(pages)))
        # one extraction pass feeds three consumers (union, download
        # rows, emptiness check) — materialize it once
        new_triples = extracted.select(
            "s", "p", "o", "o_kind", "o_datatype", "o_lang", "src_url"
        ).localCheckpoint(eager=True)
        dl = (
            new_triples.groupBy("src_url")
            .agg(F.count("*").alias("triple_count"))
            .select(F.col("src_url").alias("url"), "triple_count")
        )
        # pages present in the corpus but yielding 0 triples still count
        # as downloads (the reference logs failed derefs in the report)
        zero = pages.select("url").join(dl.select("url"), "url", "left_anti")
        # dereferenceable URLs absent from the corpus are FAILED
        # downloads — without a row here the report silently omits
        # them and operators can't see which URL failed
        missing = (
            fresh.where(F.col("url").rlike(r"^https?://"))
            .join(pages.select("url"), "url", "left_anti")
            .select("url")
        )
        dl = dl.unionByName(
            zero.unionByName(missing).withColumn(
                "triple_count", F.lit(0)
            )
        )
        return (
            new_triples,
            dl,
            downloaded.unionByName(fresh.select("url")).localCheckpoint(
                eager=True
            ),
        )

    def run(self, config: HarvestConfig) -> Tuple[DataFrame, DataFrame]:
        """→ (store_triples tagged with g, report_df)."""
        ng = self.mapper.key_to_ng(config.name)
        reports: List[tuple] = []

        if self.registry and self.registry.verify_max_age(
            ng, config.snooze_minutes
        ):
            report = self.spark.createDataFrame(
                [("snoozed", config.name, -1, None, None, None, True, 0, 0)],
                self.REPORT_SCHEMA,
            )
            return (
                self._empty.select(
                    "*", F.lit(None).cast("string").alias("src_url")
                ).withColumn("g", F.lit(ng)),
                report,
            )

        store = self._empty.select(
            "*", F.lit(None).cast("string").alias("src_url")
        )
        downloaded = self.spark.createDataFrame([], "url string")
        download_rows: Optional[DataFrame] = None

        for t_idx, task in enumerate(config.tasks):
            if task.subjects_sparql:
                subjects = bgp_select(
                    store, task.subjects_sparql, config.prefixes
                )
                subjects = subjects.select(
                    F.col(subjects.columns[0]).alias("subject")
                ).distinct()
            else:
                subjects = self.spark.createDataFrame(
                    [(s,) for s in task.subjects_literal], "subject string"
                )

            for path in task.paths:
                if path == ["*"]:
                    # '*' = dereference the subject itself — same
                    # http-only gate as the depth rounds below: urns /
                    # skolem IRIs would run an empty extraction AND
                    # bloat the checkpointed downloaded set forever
                    new, dl, downloaded = self._deref(
                        subjects.where(
                            F.col("subject").rlike(r"^https?://")
                        ).select(F.col("subject").alias("url")),
                        downloaded,
                    )
                    if not new.isEmpty():
                        store = store.unionByName(new).localCheckpoint(
                            eager=True
                        )
                    download_rows = (
                        dl if download_rows is None
                        else download_rows.unionByName(dl)
                    )
                    reports.append(
                        ("assertion", config.name, t_idx, None, "*", None,
                         True, 0, 0)
                    )
                    continue
                depth_used = 0
                n_subj = subjects.count()
                n_verified = 0
                if n_subj == 0:
                    # nothing to traverse: the success condition below
                    # is unreachable, so skip the len(path)+1 rounds of
                    # frontier/deref/verify jobs they would burn
                    reports.append(
                        ("assertion", config.name, t_idx, None,
                         " / ".join(path), None, False, 0, 0)
                    )
                    continue
                for depth in range(len(path) + 1):
                    # frontier = nodes reachable via path[:depth]
                    frontier = _reachable(store, subjects, path[:depth])
                    # only dereferenceable nodes enter the round:
                    # literals / urns / skolem IRIs would run an empty
                    # extraction job AND bloat the checkpointed
                    # downloaded set forever (same filter as the
                    # ends-deref below)
                    urls = frontier.where(
                        F.col("node").rlike(r"^https?://")
                    ).select(F.col("node").alias("url"))
                    new, dl, downloaded = self._deref(urls, downloaded)
                    if not new.isEmpty():
                        store = store.unionByName(new).localCheckpoint(
                            eager=True
                        )
                    download_rows = (
                        dl if download_rows is None
                        else download_rows.unionByName(dl)
                    )
                    depth_used = depth
                    n_verified = verify_path(store, subjects, path).count()
                    if n_subj and n_verified == n_subj:
                        # Reference parity: on a successful assertion
                        # the reference dereferences the first binding
                        # at the end of the verified path
                        # (path_assertion.py:258-272 ``_harvest`` uses
                        # bindings[0]); the batch form derefs *all*
                        # dereferenceable path-end URLs in one round.
                        ends = _reachable(store, subjects, path).where(
                            F.col("node").rlike(r"^https?://")
                        )
                        new, dl, downloaded = self._deref(
                            ends.select(F.col("node").alias("url")),
                            downloaded,
                        )
                        if not new.isEmpty():
                            store = store.unionByName(new).localCheckpoint(
                                eager=True
                            )
                        download_rows = (
                            dl if download_rows is None
                            else download_rows.unionByName(dl)
                        )
                        break
                ok = bool(n_subj and n_verified == n_subj)
                reports.append(
                    ("assertion", config.name, t_idx, None,
                     " / ".join(path), None, ok, 0, depth_used)
                )

        report = self.spark.createDataFrame(reports, self.REPORT_SCHEMA)
        if download_rows is not None:
            report = report.unionByName(
                download_rows.select(
                    F.lit("download").alias("kind"),
                    F.lit(config.name).alias("config"),
                    F.lit(-1).alias("task"),
                    F.lit(None).cast("string").alias("subject"),
                    F.lit(None).cast("string").alias("path"),
                    F.col("url"),
                    (F.col("triple_count") > 0).alias("success"),
                    F.col("triple_count"),
                    F.lit(0).alias("depth"),
                )
            )
        if self.registry:
            self.registry.touch([ng])
        return store.withColumn("g", F.lit(ng)), report


def report_triples(report: DataFrame, ng: str) -> DataFrame:
    """Execution report as triples in the report graph (the reference
    renders execution_report.ttl into the named graph,
    execution_report.py:138-213; tests subtract these as non-netto)."""
    base = "urn:harvest-report:"
    rows = report.where(F.col("kind") == "download").select(
        F.concat(F.lit(base), F.col("url")).alias("s"),
        F.lit("http://rdfs.org/ns/void#triples").alias("p"),
        F.col("triple_count").cast("string").alias("o"),
        F.lit("literal").alias("o_kind"),
        F.lit("http://www.w3.org/2001/XMLSchema#integer").alias("o_datatype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    return rows.withColumn("g", F.lit(ng + "#execution-report"))
