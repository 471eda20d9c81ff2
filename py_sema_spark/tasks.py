"""sembench task registry (SURVEY.md §2.10 E5): YAML task blocks →
handler dispatch, mirroring /root/reference/sema/bench/dispatcher.py:10-22
(task types ``subyt, shacl, sync-fs-triples, harvest, aggregate``) with
our engines behind each name. The reference's scheduler/watchdog loop
(core.py:32-52) is orchestration-infrastructure scope (Airflow/cron)
and intentionally out of the engine (SURVEY.md §2.9 T5).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict

from pyspark.sql import SparkSession


def _subyt(spark: SparkSession, args: Dict[str, Any]):
    from .subyt import (
        GeneratorSettings,
        SingleFileSink,
        SparkSubyt,
        make_source_df,
        render_collection,
    )
    from .subyt.sources import collect_set

    settings = GeneratorSettings(args.get("mode"))
    sets = {
        name: collect_set(make_source_df(spark, ident))
        for name, ident in (args.get("sets") or {}).items()
    }
    with open(args["template"], encoding="utf-8") as f:
        template = f.read()
    if not settings.iteration:
        out = render_collection(
            template, sets, variables=args.get("variables"), settings=settings
        )
        os.makedirs(os.path.dirname(args["sink"]) or ".", exist_ok=True)
        with open(args["sink"], "w", encoding="utf-8") as f:
            f.write(out)
        return args["sink"]
    records = make_source_df(spark, args["source"])
    parts = SparkSubyt(
        template,
        order_by=args.get("order_by", ["_ord"]),
        sets=sets,
        variables=args.get("variables"),
        settings=settings,
    ).process(records)
    SingleFileSink(args["sink"]).write(parts)
    return args["sink"]


def _shacl(spark: SparkSession, args: Dict[str, Any]):
    from .shacl import assert_conforms, parse_shapes_ttl
    from .syncfs import load_graph_file

    with open(args["shacl_graph"], encoding="utf-8") as f:
        shapes = parse_shapes_ttl(f.read())
    data = load_graph_file(spark, args["data_graph"])
    assert_conforms(data, shapes)
    return True


def _syncfs(spark: SparkSession, args: Dict[str, Any]):
    from .store import ParquetTripleStore
    from .syncfs import perform_sync

    store = ParquetTripleStore(spark, args["store"])
    return perform_sync(spark, args["from_path"], store)


def _harvest(spark: SparkSession, args: Dict[str, Any]):
    from .harvest import HarvestConfig, Harvester

    with open(args["config"], encoding="utf-8") as f:
        cfg = HarvestConfig.from_yaml(f.read(), name=args.get("name", "harvest"))
    corpus = spark.read.parquet(args["corpus"])
    return Harvester(spark, corpus).run(cfg)


def _aggregate(spark: SparkSession, args: Dict[str, Any]):
    from .serialize import aggregate_files, write_ntriples

    triples = aggregate_files(spark, args["globs"])
    if "sink" in args:
        write_ntriples(triples, args["sink"])
    return triples


HANDLERS: Dict[str, Callable[[SparkSession, Dict[str, Any]], Any]] = {
    "subyt": _subyt,
    "shacl": _shacl,
    "sync-fs-triples": _syncfs,
    "harvest": _harvest,
    "aggregate": _aggregate,
}


def dispatch(spark: SparkSession, task_type: str, args: Dict[str, Any]):
    if task_type not in HANDLERS:
        raise KeyError(
            f"unknown task type {task_type!r}; known: {sorted(HANDLERS)}"
        )
    return HANDLERS[task_type](spark, args)


def _resolving_loader(context: Dict[str, Any]):
    """YAML loader with the reference's ``!resolve`` tag
    (/root/reference/sema/commons/yml, exercised by
    tests/bench/resources/resolving-sembench.yml): scalar values
    tagged ``!resolve`` interpolate ``{key}`` from the context."""
    import yaml

    class _Loader(yaml.SafeLoader):
        pass

    def _resolve(loader, node):
        value = loader.construct_scalar(node)
        try:
            return value.format(**context)
        except (KeyError, IndexError, ValueError):
            # ValueError: a literal unbalanced '{' in the value (e.g. a
            # SPARQL fragment) — pass through unchanged like unknown keys
            return value

    _Loader.add_constructor("!resolve", _resolve)
    return _Loader


def run_sembench(
    spark: SparkSession,
    yaml_text: str,
    context: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Run a sembench document, accepting both shapes:

    - this engine's list form  — ``{tasks: [{id, type, args}…]}``;
    - the reference's mapping form — ``{task_name: {func: Type,
      args: {...}}}`` (sembench.yaml), func names case-folded onto the
      handler registry, ``!resolve`` values interpolated from
      ``context``.
    Tasks run in document order.
    """
    import yaml

    doc = yaml.load(yaml_text, Loader=_resolving_loader(context or {}))
    results: Dict[str, Any] = {}
    if isinstance(doc, dict) and "tasks" in doc:
        for task in doc.get("tasks", []):
            results[task.get("id", task["type"])] = dispatch(
                spark, task["type"], task.get("args") or {}
            )
        return results
    if isinstance(doc, dict):
        for name, spec in doc.items():
            if not isinstance(spec, dict) or "func" not in spec:
                raise ValueError(f"task {name!r} missing 'func'")
            func = str(spec["func"]).lower().replace("_", "-")
            aliases = {"syncfstriples": "sync-fs-triples"}
            func = aliases.get(func, func)
            results[name] = dispatch(spark, func, spec.get("args") or {})
        return results
    raise ValueError("unrecognized sembench document shape")
