"""Pure-Python JSON-LD 1.0 kernel (no Ray imports).

Re-implements the algorithms of linked-data-dotnet/json-ld.net (see SURVEY.md
§2) for use inside Ray Data ``map_batches`` stages. The public surface mirrors
``JsonLdProcessor`` (reference Core/JsonLdProcessor.cs).
"""

from .errors import JsonLdError
from .options import DocumentLoader, JsonLdOptions, RemoteDocument
from .processor import (
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    normalize,
    register_rdf_parser,
    remove_rdf_parser,
    to_rdf,
)
from .rdf import RDFDataset
from .nquads import parse_nquads, to_nquads

__all__ = [
    "JsonLdError",
    "JsonLdOptions",
    "DocumentLoader",
    "RemoteDocument",
    "RDFDataset",
    "compact",
    "expand",
    "flatten",
    "frame",
    "from_rdf",
    "normalize",
    "to_rdf",
    "parse_nquads",
    "to_nquads",
    "register_rdf_parser",
    "remove_rdf_parser",
]
