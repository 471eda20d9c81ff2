"""Unicode text normalization for training-data pipelines.

Every large-scale corpus pass (CCNet, Gopher, Dolma) starts by
canonicalizing raw crawl text so that downstream hashing, dedup, and
tokenization see ONE byte representation per logical string: NFC
normalization (composed accents — ``e`` + U+0301 → ``é``), newline
canonicalization, control-character stripping, NBSP folding, and
horizontal-whitespace collapse. Without it, exact dedup misses
byte-distinct/NFC-equal duplicates and token counts drift between
pipelines.

Spark SQL has no Unicode-normalization builtin (collation support in
Spark 4 compares NFC-equal strings but cannot *emit* the normalized
form), so step 1 is the one place this module leaves the JVM: an
Arrow-batched ``mapInPandas`` over ``unicodedata.normalize`` — a
narrow map, zero shuffles, no per-row Python UDF. All other steps are
shared string algebra replicated 1:1 by the DuckDB oracle twin
(``nfc_normalize`` + the same regexp chain), which pins byte-level
agreement between CPython's unicodedata and DuckDB's utf8proc on the
corpus.

Scale: embarrassingly parallel — each executor normalizes its own
splits; output column is the same order of magnitude as the input, so
the stage adds no exchange and no skew surface. On a 100 TB corpus
this runs fused with the scan before the first shuffle.

Reference parity note: py-sema normalizes at the RDF-term level via
rdflib; corpus-text normalization has no reference counterpart — this
is part of the brief's LLM-pipeline surface.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# C0 controls except \t (collapsed later) and \n (kept), plus DEL.
# C1 (U+0080-9F) is deliberately NOT in the class: RE2 (DuckDB) and
# Python `re` disagree on \x80-\x9f inside classes over UTF-8, and C1
# bytes never survive the corpus's UTF-8 decode anyway.
_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_HSPACE = re.compile(r"[ \t]+")


def normalize_string(text: str, form: str = "NFC") -> str:
    """One document's canonical text (pure Python; reused by the
    pandas batch loop and by tests so there is a single definition):

    1. CRLF / lone CR → LF;
    2. Unicode ``form`` normalization (NFC default — the only form
       the DuckDB oracle can mirror);
    3. strip C0 controls (except tab/newline) and DEL;
    4. NBSP → space;
    5. collapse runs of spaces/tabs to one space;
    6. trim leading/trailing spaces.
    """
    t = text.replace("\r\n", "\n").replace("\r", "\n")
    t = unicodedata.normalize(form, t)
    t = _CTRL.sub("", t)
    t = t.replace("\u00a0", " ")
    t = _HSPACE.sub(" ", t)
    return t.strip(" ")


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
) -> DataFrame:
    """Append ``out_col`` = canonicalized ``text_col`` (NULL stays
    NULL) plus ``was_changed`` — the audit flag a curation report
    groups on to see how dirty a crawl slice is."""
    fields = list(df.schema.fields) + [
        T.StructField(out_col, T.StringType(), True),
        T.StructField("was_changed", T.BooleanType(), True),
    ]
    schema = T.StructType(fields)
    names = [f.name for f in df.schema.fields]

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            vals = pdf[text_col].values
            norm = [
                None if v is None else normalize_string(v, form) for v in vals
            ]
            out = pdf[names].copy()
            out[out_col] = norm
            out["was_changed"] = [
                None if v is None else (n != v) for v, n in zip(vals, norm)
            ]
            yield out

    return df.mapInPandas(gen, schema)


def normalize_sql_expr(col: str) -> str:
    """The DuckDB twin of :func:`normalize_string` (NFC form) as a SQL
    expression over ``col`` — keep in lockstep with the Python steps."""
    crlf = (
        f"replace(replace({col}, chr(13) || chr(10), chr(10)),"
        " chr(13), chr(10))"
    )
    nfc = f"nfc_normalize({crlf})"
    ctrl = (
        rf"regexp_replace({nfc},"
        r" '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g')"
    )
    nbsp = f"replace({ctrl}, chr(160), ' ')"
    collapse = rf"regexp_replace({nbsp}, '[ \t]+', ' ', 'g')"
    return f"trim({collapse}, ' ')"
