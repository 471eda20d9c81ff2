"""Pure-Python RDF layer (no rdflib in this environment).

These parsers run *inside* Arrow-batched pandas UDFs — one Python call
per document, batched per Arrow record batch — mirroring the reference
extraction semantics (``/root/reference/sema/discovery/discovery.py:148-176``
format-fallback chain) without any per-row Python UDF at the Spark
expression level.
"""

from .terms import Triple, iri, literal, bnode  # noqa: F401
from .parse import parse_rdf_auto, FORMATS_TO_TRY  # noqa: F401
