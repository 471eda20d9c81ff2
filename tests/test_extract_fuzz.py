"""Crash-robustness fuzzing of the extraction path.

``extract_page`` runs inside ``mapInPandas`` over crawl bodies; an
uncaught exception there kills the executor task (and with retries,
the whole job) — on a real crawl every malformed byte sequence that
exists WILL eventually arrive. ``parse_rdf_auto`` swallows per-format
parse errors by contract, but the HTML scanning / RDFa / microdata /
link-collection layers run outside that guard. This suite mutates
valid corpus documents (truncation, splices, control/unicode
injection, slice swaps, pure garbage) and asserts extraction always
RETURNS — any exception is a bug, the fix belongs in the parser, not
in a blanket except.

Pure Python (no Spark session): the property is about the per-row
function the Arrow batches call.
"""

import random

import pytest

from py_sema_spark.operators.extract import extract_page
from py_sema_spark.sources.corpus import (
    _html_body,
    _jsonld_body,
    _noise_body,
    _ttl_body,
)

BASES = [
    lambda rng: _ttl_body(7, rng.randrange(1, 50), 50),
    lambda rng: _jsonld_body(7, rng.randrange(1, 50)),
    lambda rng: _html_body(7, rng.randrange(1, 50), 50),
    lambda rng: _noise_body(7, rng.randrange(1, 50)),
]

INJECT = ["\x00", "\x1b", "\ud800?", "\U0001f600", "<", ">", '"', "\\",
          "&#x41;", "<!--", "]]>", "%", " ", "﻿"]


def mutate(text: str, rng: random.Random) -> str:
    for _ in range(rng.randrange(1, 4)):
        op = rng.randrange(5)
        if not text:
            return text
        i = rng.randrange(len(text))
        j = rng.randrange(len(text))
        if op == 0:  # truncate
            text = text[:i]
        elif op == 1:  # inject hostile fragment
            frag = rng.choice(INJECT)
            text = text[:i] + frag + text[i:]
        elif op == 2:  # delete a slice
            text = text[: min(i, j)] + text[max(i, j):]
        elif op == 3:  # swap two slices
            a, b = sorted((i, j))
            text = text[a:b] + text[:a] + text[b:]
        else:  # duplicate a slice
            a, b = sorted((i, j))
            text = text[:b] + text[a:b] + text[b:]
    return text


@pytest.mark.parametrize("seed", range(400))
def test_extract_page_never_raises(seed):
    rng = random.Random(seed)
    if rng.random() < 0.1:
        body = "".join(
            chr(rng.randrange(1, 0x2FFF)) for _ in range(rng.randrange(0, 400))
        )
    else:
        body = mutate(rng.choice(BASES)(rng), rng)
    # surrogate halves can't round-trip UTF-8; the decode layer strips
    # them before extract_page sees real crawl bytes — mirror that
    body = body.encode("utf-8", "replace").decode("utf-8", "replace")
    triples, links = extract_page("http://fuzz.example.org/page", body)
    assert isinstance(triples, list) and isinstance(links, list)
