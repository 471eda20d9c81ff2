"""Command-line surface mirroring the reference's console scripts
(`sema-get`, `sema-harvest`, `sema-subyt`, `sema-query`, `sema-syncfs`,
`sema-bench` — /root/reference/pyproject.toml:58-68), adapted to the
batch/corpus model: every command takes DataFrame-shaped inputs
(parquet corpus / triples tables) instead of live URLs.

    python -m py_sema_spark extract  --corpus c.parquet --out triples/
    python -m py_sema_spark harvest  --config h.yml --corpus c.parquet --out t/
    python -m py_sema_spark subyt    --template t.ttl --source r.csv --sink out.ttl
    python -m py_sema_spark query    --triples t/ --sparql 'SELECT …' --out res/
    python -m py_sema_spark syncfs   --from dumps/ --store store/
    python -m py_sema_spark shacl    --shapes s.ttl --data d.ttl
    python -m py_sema_spark conneg   URL -v mime;profile --altr a.ttl --found f.csv
    python -m py_sema_spark pipeline --corpus c.parquet --workdir wd/
    python -m py_sema_spark bench    --sembench tasks.yml
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import build_session

    return build_session(
        "py-sema-spark-cli", master=args.master or None
    )


def cmd_extract(args) -> int:
    spark = _spark(args)
    from .model import dedup_triples, skolemize
    from .operators.extract import extract_structured, triples_of
    from .serialize import write_ntriples

    corpus = spark.read.parquet(args.corpus)
    # persist: the write and the summary count below would otherwise
    # each run the full HTML-parse pipeline once
    trips = dedup_triples(
        skolemize(triples_of(extract_structured(corpus))), keys=["s", "p", "o"]
    ).persist()
    if args.format == "nt":
        write_ntriples(trips, args.out)
    else:
        trips.write.mode("overwrite").parquet(args.out)
    print(json.dumps({"triples": trips.count(), "out": args.out}))
    trips.unpersist()
    return 0


def cmd_get(args) -> int:
    """sema-get analog: triples for one subject url, following
    describedby links into the corpus (discovery §3.2; the conneg
    strategy ladder degenerates to parse-what-the-row-has)."""
    spark = _spark(args)
    from .model import dedup_triples, skolemize
    from .operators.extract import extract_with_link_follow
    from .serialize import write_ntriples

    corpus = spark.read.parquet(args.corpus)
    seeds = spark.createDataFrame([(args.url,)], "url string")
    trips = dedup_triples(
        skolemize(
            extract_with_link_follow(corpus, seeds, max_hops=args.max_hops)
        ),
        keys=["s", "p", "o"],
    )
    if args.out:
        write_ntriples(trips, args.out)
    else:
        from .serialize import ntriples_lines

        for r in ntriples_lines(trips).limit(100).collect():
            print(r["line"])
    print(json.dumps({"triples": trips.count(), "url": args.url}))
    return 0


def cmd_harvest(args) -> int:
    spark = _spark(args)
    from .harvest import HarvestConfig, Harvester

    with open(args.config) as f:
        cfg = HarvestConfig.from_yaml(f.read(), name=args.name)
    corpus = spark.read.parquet(args.corpus).persist()
    store, report = Harvester(spark, corpus).run(cfg)
    store = store.persist()  # written AND counted — one execution
    store.write.mode("overwrite").parquet(args.out)
    report.write.mode("overwrite").parquet(args.out.rstrip("/") + "_report")
    print(json.dumps({"triples": store.count(), "out": args.out}))
    store.unpersist()
    return 0


def cmd_subyt(args) -> int:
    spark = _spark(args)
    from .tasks import dispatch

    sets = dict(kv.split("=", 1) for kv in (args.set or []))
    variables = dict(kv.split("=", 1) for kv in (args.var or []))
    dispatch(
        spark,
        "subyt",
        {
            "template": args.template,
            "source": args.source,
            "sink": args.sink,
            "mode": args.mode,
            "sets": sets,
            "variables": variables,
        },
    )
    print(json.dumps({"sink": args.sink}))
    return 0


def cmd_query(args) -> int:
    spark = _spark(args)
    from .queries.bgp import sparql_query
    from .serialize import write_csv

    if args.source:
        # reference CLI parity (sema/query __main__ -s): RDF dump
        # file(s) parsed by the distributed extraction stage
        from .queries.source import GraphSource

        triples = GraphSource.build(*args.source, spark=spark).triples
    else:
        triples = spark.read.parquet(args.triples)
    sparql = args.sparql
    if args.template:
        from .queries.templated import SparqlBuilder

        variables = dict(kv.split("=", 1) for kv in (args.var or []))
        with open(args.template) as f:
            source = f.read()
        builder = SparqlBuilder()
        missing = builder.variables_in_string(source) - set(variables)
        if missing:
            # Jinja's lenient default would render missing vars as ''
            # and hand a malformed query to the parser
            print(
                "missing template variables (pass --var K=V): "
                + ", ".join(sorted(missing)),
                file=sys.stderr,
            )
            return 2
        sparql = builder.build_from_string(source, **variables)
    out = sparql_query(triples, sparql)
    if args.out:
        write_csv(out, args.out, sep="\t" if args.tsv else ",")
    else:
        for row in out.limit(50).collect():
            print(row.asDict())
    return 0


def cmd_syncfs(args) -> int:
    spark = _spark(args)
    from .store import ParquetTripleStore
    from .syncfs import perform_sync

    store = ParquetTripleStore(spark, args.store)
    report = perform_sync(spark, args.from_path, store)
    print(json.dumps(report))
    return 0


def cmd_shacl(args) -> int:
    spark = _spark(args)
    from .shacl import parse_shapes_ttl, validate
    from .syncfs import load_graph_file

    with open(args.shapes) as f:
        shapes = parse_shapes_ttl(f.read())
    viols = validate(load_graph_file(spark, args.data), shapes)
    rows = viols.collect()
    for v in rows[:50]:
        print(v.asDict())
    print(json.dumps({"violations": len(rows), "conforms": not rows}))
    return 0 if not rows else 1


def cmd_conneg(args) -> int:
    """sema-conneg analog (commons/web/conneg_cli.py) under the
    corpus model: no live probing, so the alternate-representations
    document is a dump file (--altr) and the per-variant fetch results
    are a CSV (--found, columns mime_type,profile,status
    [,response_mime,filename]). Emits the reference's FoundVariants
    CSV layout; exit 0 iff any variant was found (conneg_cli.py:111)."""
    spark = _spark(args)
    import csv as _csv

    from .functions.conneg import (
        FoundVariants,
        detect_variants,
        parse_request_variants,
    )

    fv = FoundVariants(
        parse_request_variants(",".join(args.request_variants or []))
    )
    if args.altr:
        from .syncfs import load_graph_file

        fv.set_detected(
            detect_variants(load_graph_file(spark, args.altr), args.url)
        )
    if args.found:
        with open(args.found) as fh:
            for row in _csv.DictReader(fh):
                fv.add_variant(
                    mime_type=row.get("mime_type") or "",
                    profile=row.get("profile") or "",
                    status=(
                        int(row["status"]) if row.get("status") else None
                    ),
                    response_mime=row.get("response_mime") or None,
                    filename=row.get("filename") or None,
                )
    text = fv.as_csv(args.url)
    if args.output and args.output != "-":
        with open(args.output, "w") as f:
            f.write(text)
        print(json.dumps({
            "variants": len(fv),
            "missing": sorted(list(k) for k in fv.missing),
            "success": fv.success,
        }))
    else:
        print(text, end="")
    return 0 if len(fv) else 1


def cmd_rocreate(args) -> int:
    """RO-Crate creator (the reference's `sema ro creator` CLI,
    ro/creator/__main__.py): blueprint + crate dir → metadata file."""
    spark = _spark(args)
    import os

    from .ogm import ro_creator_triples, rocrate_metadata_json

    env = dict(kv.split("=", 1) for kv in (args.env or []))
    with open(args.blueprint) as f:
        text = f.read()
    df = ro_creator_triples(
        spark, text, env=env, crate_root=args.crate
    ).persist()  # serialized AND counted — one execution
    out = args.out or os.path.join(args.crate, "ro-crate-metadata.json")
    if os.path.exists(out) and not args.force:
        print(json.dumps({"error": "exists", "path": out}))
        return 1
    with open(out, "w") as f:
        f.write(rocrate_metadata_json(df))
    print(json.dumps({"path": out, "triples": df.count()}))
    return 0


def cmd_pipeline(args) -> int:
    spark = _spark(args)
    from .pipeline import Pipeline

    corpus = spark.read.parquet(args.corpus)
    out = Pipeline(spark, args.workdir).run(corpus)
    print(json.dumps({"triples": out.count(), "workdir": args.workdir}))
    return 0


def cmd_bench(args) -> int:
    spark = _spark(args)
    from .tasks import run_sembench

    with open(args.sembench) as f:
        results = run_sembench(spark, f.read())
    print(json.dumps({k: str(v) for k, v in results.items()}))
    return 0


def main(argv=None) -> int:
    from .logconf import add_logconf_argument, load_log_config

    top = argparse.ArgumentParser(prog="py_sema_spark")
    top.add_argument("--master", default=None)
    add_logconf_argument(top)
    sub = top.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract", help="corpus parquet → triples")
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--format", choices=["parquet", "nt"], default="parquet")
    p.set_defaults(fn=cmd_extract)

    p = sub.add_parser("get", help="triples for one subject url (+links)")
    p.add_argument("--corpus", required=True)
    p.add_argument("--url", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--max-hops", type=int, default=3)
    p.set_defaults(fn=cmd_get)

    p = sub.add_parser("harvest", help="config-driven traversal harvest")
    p.add_argument("--config", required=True)
    p.add_argument("--corpus", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--name", default="harvest")
    p.set_defaults(fn=cmd_harvest)

    p = sub.add_parser("subyt", help="records × template → triples text")
    p.add_argument("--template", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--sink", required=True)
    p.add_argument("--mode", default=None)
    p.add_argument("--set", action="append", metavar="NAME=PATH")
    p.add_argument("--var", action="append", metavar="K=V")
    p.set_defaults(fn=cmd_subyt)

    p = sub.add_parser("query", help="SPARQL subset over a triples table")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--triples", default=None, help="triples parquet dir")
    src.add_argument(
        "--source", nargs="+", default=None, metavar="FILE",
        help="RDF dump file(s) to parse into the data graph",
    )
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--sparql", default=None)
    g.add_argument("--template", default=None)
    p.add_argument("--var", action="append", metavar="K=V")
    p.add_argument("--out", default=None)
    p.add_argument("--tsv", action="store_true")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("syncfs", help="sync rdf dump folder ↔ store")
    p.add_argument("--from", dest="from_path", required=True)
    p.add_argument("--store", required=True)
    p.set_defaults(fn=cmd_syncfs)

    p = sub.add_parser("shacl", help="validate data against shapes")
    p.add_argument("--shapes", required=True)
    p.add_argument("--data", required=True)
    p.set_defaults(fn=cmd_shacl)

    p = sub.add_parser(
        "conneg", help="variant-set conneg evaluation (offline)"
    )
    p.add_argument("url")
    p.add_argument("-v", "--request-variants", action="append")
    p.add_argument(
        "--altr", default=None,
        help="alternate-representations dump file (any RDF format)",
    )
    p.add_argument(
        "--found", default=None,
        help="CSV of fetched variants: mime_type,profile,status"
             "[,response_mime,filename]",
    )
    p.add_argument("-o", "--output", default="-")
    p.set_defaults(fn=cmd_conneg)

    p = sub.add_parser("rocreate", help="blueprint + crate dir → RO-Crate metadata")
    p.add_argument("--blueprint", required=True)
    p.add_argument("--crate", required=True)
    p.add_argument("--env", action="append", metavar="K=V")
    p.add_argument("--out", default=None)
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_rocreate)

    p = sub.add_parser("pipeline", help="full KG pipeline with resume")
    p.add_argument("--corpus", required=True)
    p.add_argument("--workdir", required=True)
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("bench", help="run a sembench task file")
    p.add_argument("--sembench", required=True)
    p.set_defaults(fn=cmd_bench)

    args = top.parse_args(argv)
    # unconditional, as the reference CLI does: load_log_config(None)
    # applies the packaged debug_logconf.yml fallback
    load_log_config(args.logconf)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
