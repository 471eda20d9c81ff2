"""py_sema_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the query/data-processing surface of
vliz-be-opsci/py-sema (reference at /root/reference, studied for
semantics only) over Spark DataFrames:

- ``rdf``        : pure-Python RDF parsing (Turtle / JSON-LD / N-Triples
                   subset) used inside Arrow-batched UDFs,
- ``functions``  : scalar column builders (xsd formatting ladder, URI
                   cleaning, URI-template expansion, text analysis),
- ``operators``  : extraction, transitive closure, connected components,
                   dedup (exact/MinHash/SimHash), similarity search,
                   SHACL-subset validation,
- ``sources``    : record sources (csv/json/xml/glob), synthetic corpus,
                   sinks,
- ``templating`` : subyt-style record×template triple generation,
- ``queries``    : the reference SPARQL-template surface as DataFrame
                   builders,
- ``harvest``    : frontier-driven traversal harvesting over a corpus
                   table,
- ``model``      : the triples-table data model (schema, dedup,
                   skolemization, graph registry, stage metrics).

Design stance (SURVEY.md §7): DataFrame/SQL everywhere, pandas/Arrow
UDFs only for parsing-shaped work, driver-side compilation for
templates/paths, iterative driver loops for closure/canonicalization.
"""

__version__ = "0.1.0"
