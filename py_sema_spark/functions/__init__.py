from .xsd import xsd_format, unite  # noqa: F401
from .clean import (  # noqa: F401
    check_valid_uri,
    check_valid_url,
    check_valid_urn,
    clean_uri_str,
    normalise_scheme_str,
)
from .uritemplate import uritemplate_expand  # noqa: F401
