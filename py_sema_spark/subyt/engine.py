"""The subyt generator: Jinja templates over record DataFrames.

Reference semantics (/root/reference/sema/subyt/api.py:280-401):
each record is rendered with context ``_`` (the record dict), ``sets``
(re-iterable named record sets), ``ctrl`` (isFirst / isLast / index /
settings) plus user variables; *collection mode* (``no-it``) renders
the template exactly once with only ``sets``. The Jinja environment
registers filters ``{xsd, uri}`` and functions ``{uritexpand,
regexreplace, map, xsd, unite}``
(/root/reference/sema/commons/j2/j2_functions.py:20-41) with
autoescape disabled for ttl/txt/ldt/json/jsonld
(/root/reference/sema/subyt/j2/generator.py:23-39).

Spark shape:

- ``ctrl`` is computed by :func:`..operators.windows.with_ctrl` —
  the reference's lookahead queue is a ``lead(1)``;
- rendering runs inside ``mapInPandas`` (Arrow batches; Jinja is the
  genuinely-not-column-expressible part — the template compiles once
  per executor, then renders per row within the batch);
- ``sets`` are broadcast variables (the reference's
  ``itertools.tee``-based re-iteration maps to broadcast lists, which
  are naturally re-iterable);
- ordering: the reference inherits file order; we require an explicit
  ``order_by``. A global stream (the reference's model) uses one
  window partition — fine for dimension-sized record sets; for
  corpus-scale streams pass ``stream_by`` so each logical stream is
  one hash partition (SURVEY.md §2.5 scale note).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.uritemplate import uritemplate_expand
from ..functions.xsd import (
    map_build,
    regexreplace,
    unite,
    uri_format,
    xsd_format,
)
from ..operators.windows import with_ctrl

AUTOESCAPE_DISABLED = ("ttl", "txt", "ldt", "json", "jsonld")


class GeneratorSettings:
    """Modifier flags, mirroring the reference's scheme
    (api.py:70-100): ignorecase / flatten / iteration, negated with a
    ``no-`` prefix ("no-it" → iteration=False). The reference declares
    ignorecase/flatten but never applies them in this snapshot; we
    apply them as record preprocessors (documented divergence-safe:
    defaults reproduce reference behavior on its own fixtures)."""

    _defaults = {"ignorecase": True, "flatten": True, "iteration": True}
    _aliases = {"it": "iteration"}

    def __init__(self, modifiers: Optional[str] = None):
        self.values = dict(self._defaults)
        for token in (modifiers or "").split(","):
            token = token.strip()
            if not token:
                continue
            val = True
            if token.startswith("no-"):
                val, token = False, token[3:]
            token = self._aliases.get(token, token)
            if token not in self.values:
                raise KeyError(f"unknown generator setting {token!r}")
            self.values[token] = val

    def __getattr__(self, key):
        try:
            return self.__dict__["values"][key]
        except KeyError:
            raise AttributeError(key)

    def as_dict(self) -> dict:
        return dict(self.values)


def build_env(
    templates_folder: Optional[str] = None,
    extra_filters: Optional[Dict[str, Callable]] = None,
    extra_functions: Optional[Dict[str, Callable]] = None,
):
    """The Jinja environment with the reference's filter/function
    registry (names must match — templates written for py-sema must
    render unchanged). ``extra_filters``/``extra_functions`` mirror the
    J2RDFSyntaxBuilder extension points (syntax_builder.py:23-43)."""
    from jinja2 import BaseLoader, Environment, FileSystemLoader, select_autoescape

    env = Environment(
        loader=(
            FileSystemLoader(templates_folder) if templates_folder else BaseLoader()
        ),
        autoescape=select_autoescape(
            disabled_extensions=AUTOESCAPE_DISABLED,
            default_for_string=False,  # string templates = ttl-style output
            default=True,
        ),
    )
    from jinja2 import pass_context

    @pass_context
    def _uritexpand(jctx, template, context=None):
        # j2_functions.py:366-373: a falsy context (None, Undefined —
        # e.g. a macro called with an undefined arg) falls back to the
        # full template context, minus callables
        if not context:
            context = {
                k: v for k, v in jctx.get_all().items() if not callable(v)
            }
        return uritemplate_expand(template, context)

    env.filters.update({"xsd": xsd_format, "uri": uri_format})

    def _map_build(it, key_name, val_name=None, cached_as=None,
                   _cache={}):  # noqa: B006 — deliberately env-scoped
        # the cache lives with THIS environment, not the module: Spark
        # reuses Python workers across jobs, so a module-level cache
        # would hand run 2 a stale ValueMapper built from run 1's sets
        return map_build(it, key_name, val_name, cached_as, _cache)

    env.globals.update(
        {
            "uritexpand": _uritexpand,
            "regexreplace": regexreplace,
            "map": _map_build,
            "xsd": xsd_format,
            "unite": unite,
        }
    )
    env.filters.update(extra_filters or {})
    env.globals.update(extra_functions or {})
    return env


def needs_regeneration(
    source_paths: Sequence[str], sink_paths: Sequence[str]
) -> bool:
    """T3 conditional gate (api.py:365-380): regenerate unless every
    sink is newer than every source — ``max(source mtimes) <
    min(sink mtimes)`` skips. Missing sinks always regenerate; at
    corpus scale the same comparison runs on ``max(warc_ts)`` /
    snapshot ids against the checkpoint metrics table."""
    import os

    sink_mtimes = [
        os.path.getmtime(p) for p in sink_paths if os.path.exists(p)
    ]
    if len(sink_mtimes) != len(list(sink_paths)) or not sink_mtimes:
        return True
    source_mtimes = [
        os.path.getmtime(p) for p in source_paths if os.path.exists(p)
    ]
    if not source_mtimes:
        return True
    return max(source_mtimes) >= min(sink_mtimes)


def _preprocess(item: dict, settings: GeneratorSettings) -> dict:
    if settings.flatten:
        flat = {}

        def _walk(prefix, obj):
            if isinstance(obj, dict):
                for k, v in obj.items():
                    _walk(f"{prefix}.{k}" if prefix else str(k), v)
            else:
                flat[prefix] = obj

        _walk("", item)
        item = flat
    if settings.ignorecase:
        low = {k.lower(): v for k, v in item.items()}
        item = {**item, **{k: v for k, v in low.items() if k not in item}}
    return item


def render_collection(
    template_source: str,
    sets: Dict[str, List[dict]],
    variables: Optional[dict] = None,
    settings: Optional[GeneratorSettings] = None,
    templates_folder: Optional[str] = None,
) -> str:
    """Collection ("no-it") mode: one render, driver-side (it produces
    exactly one part — distribution has nothing to parallelize)."""
    settings = settings or GeneratorSettings("no-it")
    env = build_env(templates_folder)
    tmpl = env.from_string(template_source)
    return tmpl.render(
        _=None,
        sets=sets,
        ctrl={
            "isFirst": True,
            "isLast": True,
            "index": 0,
            "settings": settings.as_dict(),
        },
        **(variables or {}),
    )


class SparkSubyt:
    """Iteration-mode generator: one rendered part per record.

    ``process(df)`` returns a DataFrame ``(idx, part)`` — ``idx`` is
    the ctrl stream index (global render order), ``part`` the rendered
    text; sinks consume that frame (:mod:`.sinks`).
    """

    def __init__(
        self,
        template_source: str,
        order_by: Sequence[str],
        stream_by: Optional[Sequence[str]] = None,
        sets: Optional[Dict[str, List[dict]]] = None,
        variables: Optional[dict] = None,
        settings: Optional[GeneratorSettings] = None,
        templates_folder: Optional[str] = None,
    ):
        self.template_source = template_source
        self.order_by = list(order_by)
        self.stream_by = list(stream_by or [])
        self.sets = sets or {}
        self.variables = variables or {}
        self.settings = settings or GeneratorSettings()
        self.templates_folder = templates_folder

    def process(self, records: DataFrame) -> DataFrame:
        if not self.settings.iteration:
            raise ValueError("no-it settings: use render_collection()")
        # the source-order helper column drives ordering but is NOT
        # record data: it must not leak into the template's `_` dict
        data_cols = [c for c in records.columns if c != "_ord"]
        ctrl_df = with_ctrl(records, self.stream_by, self.order_by)
        if self.stream_by:
            # ctrl.index is per-stream (template contract), but sinks
            # consume idx as a GLOBAL total order — without this, idx
            # collides across streams and concatenation / _N suffixing
            # turns nondeterministic
            gw = Window.orderBy(
                *[F.col(c) for c in (self.stream_by + self.order_by)]
            )
            ctrl_df = ctrl_df.withColumn(
                "_gidx", F.row_number().over(gw) - 1
            )
        else:
            ctrl_df = ctrl_df.withColumn("_gidx", F.col("idx"))

        template_source = self.template_source
        templates_folder = self.templates_folder
        sets_bc = records.sparkSession.sparkContext.broadcast(self.sets)
        variables = dict(self.variables)
        settings = self.settings
        settings_dict = settings.as_dict()

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            env = build_env(templates_folder)
            tmpl = env.from_string(template_source)
            sets_local = sets_bc.value
            for pdf in batches:
                parts = []
                for row in pdf.to_dict("records"):
                    item = _preprocess(
                        {k: row[k] for k in data_cols}, settings
                    )
                    parts.append(
                        tmpl.render(
                            _=item,
                            sets=sets_local,
                            ctrl={
                                "isFirst": bool(row["is_first"]),
                                "isLast": bool(row["is_last"]),
                                "index": int(row["idx"]),
                                "settings": settings_dict,
                            },
                            **variables,
                        )
                    )
                yield pd.DataFrame(
                    {"idx": pdf["_gidx"].astype("int64"), "part": parts}
                )

        return ctrl_df.mapInPandas(gen, "idx long, part string")
