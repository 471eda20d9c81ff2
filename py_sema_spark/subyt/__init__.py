"""SuByT — "produces triples by applying a template"
(/root/reference/sema/subyt/__main__.py:18) — re-expressed Spark-first:
record DataFrames × Jinja templates → rendered parts, with ``ctrl``
stream metadata as window functions and ``sets`` as broadcast side
tables (SURVEY.md §3.4, §2.1 S1-S5/S13-S14, §2.5, §2.8)."""

from .engine import GeneratorSettings, SparkSubyt, build_env, render_collection
from .sinks import PatternedSink, SingleFileSink, StdOutSink
from .sources import make_source_df

__all__ = [
    "SparkSubyt",
    "GeneratorSettings",
    "build_env",
    "render_collection",
    "make_source_df",
    "StdOutSink",
    "SingleFileSink",
    "PatternedSink",
]
