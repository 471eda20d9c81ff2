"""Sinks for rendered parts (SURVEY.md §2.1 S13-S14).

- :class:`StdOutSink` / :class:`SingleFileSink` — the whole stream
  concatenated in ctrl order (/root/reference/sema/subyt/sinks.py:55-110).
  One output object ⇒ the final assembly is driver-side by nature;
  the rendering itself already ran distributed.
- :class:`PatternedSink` — one file per record at a URITemplate-
  expanded path (sinks.py:113-196), with the reference's duplicate-
  path policy: error out, or deduplicate with a ``_N`` suffix
  (sinks.py:181-196). Files are written executor-side via
  ``foreachPartition`` — the idiomatic many-small-files writer on a
  shared filesystem; on object storage the same frame feeds
  ``df.write.partitionBy`` instead.
"""

from __future__ import annotations

import os
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.uritemplate import uritemplate_col, uritemplate_expand


class StdOutSink:
    def write(self, parts: DataFrame) -> None:
        for row in parts.orderBy("idx").select("part").toLocalIterator():
            print(row["part"], end="")


class SingleFileSink:
    def __init__(self, path: str):
        self.path = path

    def write(self, parts: DataFrame) -> None:
        chunks = [
            r["part"]
            for r in parts.orderBy("idx").select("part").toLocalIterator()
        ]
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w", encoding="utf-8") as f:
            f.write("".join(chunks))


class PatternedSink:
    """Expand ``pattern`` against each record's columns → output path.

    ``allow_repeated=False`` raises on duplicate paths (the reference's
    default GeneratorError, sinks.py:181-187); ``True`` appends ``_N``
    before the suffix for the 2nd+ occurrence (sinks.py:188-196),
    ordered by ctrl index so numbering is deterministic.
    """

    def __init__(self, root: str, pattern: str, allow_repeated: bool = False):
        self.root = root.rstrip("/")
        self.pattern = pattern
        self.allow_repeated = allow_repeated

    def with_paths(self, parts: DataFrame) -> DataFrame:
        try:
            colmap = {
                c: F.col(c) for c in parts.columns if c not in ("idx", "part")
            }
            path_col = uritemplate_col(self.pattern, colmap)
            df = parts.withColumn("path", path_col)
        except (ValueError, KeyError):
            # full-RFC-6570 pattern → batch Python expansion
            import pandas as pd

            pattern = self.pattern
            cols = [c for c in parts.columns if c not in ("idx", "part")]

            def gen(batches):
                for pdf in batches:
                    paths = [
                        uritemplate_expand(
                            pattern, {c: row[c] for c in cols}
                        )
                        for row in pdf.to_dict("records")
                    ]
                    yield pd.DataFrame(
                        {"idx": pdf["idx"], "part": pdf["part"], "path": paths}
                    )

            df = parts.mapInPandas(gen, "idx long, part string, path string")
        # pin the rendered stream once: the dup-check job, the file
        # write, and the returned (idx, path) frame would otherwise
        # each re-run the whole Jinja-rendering upstream
        df = df.localCheckpoint(eager=True)
        w = Window.partitionBy("path").orderBy("idx")
        df = df.withColumn("_dup", F.row_number().over(w))
        if not self.allow_repeated:
            dups = df.where(F.col("_dup") > 1).limit(1).collect()
            if dups:
                raise ValueError(
                    f"duplicate sink path {dups[0]['path']!r} "
                    "(pass allow_repeated=True for _N suffixing)"
                )
        # reference parity (sinks.py:185-187): the Nth repeat appends
        # ``_<N-2>`` AFTER the full path — a.txt, a.txt_0, a.txt_1 —
        # not before the extension
        suffixed = F.when(F.col("_dup") == 1, F.col("path")).otherwise(
            F.concat(
                F.col("path"), F.lit("_"), (F.col("_dup") - 2).cast("string")
            )
        )
        return df.withColumn("path", suffixed).drop("_dup")

    def write(self, parts: DataFrame) -> DataFrame:
        df = self.with_paths(parts)
        root = self.root
        os.makedirs(root, exist_ok=True)

        def _write_partition(rows):
            for row in rows:
                full = os.path.join(root, row["path"].lstrip("/"))
                os.makedirs(os.path.dirname(full) or ".", exist_ok=True)
                with open(full, "w", encoding="utf-8") as f:
                    f.write(row["part"])

        df.select("path", "part").foreachPartition(_write_partition)
        return df.select("idx", "path")
