"""Templated-SPARQL surface (SURVEY.md §3.1 steps 1-3).

The reference's ``DefaultSparqlBuilder`` renders named Jinja
``.sparql`` templates and introspects their required variables
(/root/reference/sema/commons/j2/syntax_builder.py:49-86). Rendering
and introspection are driver-side string work and carry over directly;
*execution* of the rendered SPARQL then goes through
:func:`..queries.bgp.bgp_select` (BGP subset) — the Catalyst plan is
the reference's step-4 algebra — while the analytic template shapes
(FILTER/OPTIONAL/UNION/closure) live as dedicated DataFrame builders
in :mod:`.sparqlets`.
"""

from __future__ import annotations

from typing import Dict, Optional, Set

from pyspark.sql import DataFrame


class SparqlBuilder:
    def __init__(self, templates_folder: Optional[str] = None):
        from jinja2 import BaseLoader, Environment, FileSystemLoader

        self.env = Environment(
            loader=(
                FileSystemLoader(templates_folder)
                if templates_folder
                else BaseLoader()
            ),
            autoescape=False,
        )

    def variables_in_template(self, name: str) -> Set[str]:
        """Undeclared-variable introspection (syntax_builder.py:49-67)."""
        from jinja2 import meta

        source = self.env.loader.get_source(self.env, name)[0]
        return meta.find_undeclared_variables(self.env.parse(source))

    def build_syntax(self, name: str, **variables) -> str:
        return self.env.get_template(name).render(**variables)

    def build_from_string(self, template_source: str, **variables) -> str:
        return self.env.from_string(template_source).render(**variables)

    def variables_in_string(self, template_source: str) -> Set[str]:
        """Undeclared variables of an inline template — the
        :meth:`variables_in_template` introspection for sources that
        never went through a loader."""
        from jinja2 import meta

        return meta.find_undeclared_variables(
            self.env.parse(template_source)
        )


def templated_bgp_select(
    triples: DataFrame,
    template_source: str,
    variables: Optional[Dict] = None,
    prefixes: Optional[Dict[str, str]] = None,
) -> DataFrame:
    """Render a SPARQL template and execute its BGP against a triples
    DataFrame — the end-to-end `sema-query` shape for the subset.

    Missing template variables are rejected up front (Jinja's lenient
    default would render them as empty strings, yielding ``<>`` IRIs
    and an opaque parse error — or worse, a silently wrong query)."""
    from .bgp import bgp_select

    builder = SparqlBuilder()
    missing = builder.variables_in_string(template_source) - set(
        variables or {}
    )
    if missing:
        raise ValueError(
            "templated_bgp_select: template variables not supplied: "
            + ", ".join(sorted(missing))
        )
    sparql = builder.build_from_string(
        template_source, **(variables or {})
    )
    return bgp_select(triples, sparql, prefixes)
