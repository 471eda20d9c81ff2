from .sparqlets import (  # noqa: F401
    all_triples,
    bodc_find,
    bodc_listing,
    broader_terms,
    rdf_predicates,
    rdf_predicates_count,
    rdf_types,
    skos_broader_depth,
    skos_collection,
    skos_collection_member_count,
    term_match_in_collection,
)
