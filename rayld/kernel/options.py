"""Processing options + document loader plugin seam.

Parity reference: /root/reference/src/json-ld.net/Core/JsonLdOptions.cs and
Core/DocumentLoader.cs. The engine has no network: the default loader serves
documents from a preloaded registry and fails deterministically otherwise
(SURVEY.md S8 — remote fetch is replaced by an offline context registry).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

from .errors import JsonLdError


@dataclass
class RemoteDocument:
    document_url: Optional[str]
    document: Any
    context_url: Optional[str] = None
    context: Any = None


class DocumentLoader:
    """Offline document loader backed by a dict registry.

    Mirrors the subclassable ``DocumentLoader`` seam of the reference
    (Core/DocumentLoader.cs:48-111) without any network I/O.
    """

    def __init__(self, registry: Optional[dict] = None):
        self.registry = dict(registry or {})

    def add_document(self, url: str, document: Any) -> None:
        self.registry[url] = document

    def load_document(self, url: str) -> RemoteDocument:
        if url in self.registry:
            return RemoteDocument(url, self.registry[url])
        raise JsonLdError(
            JsonLdError.LOADING_DOCUMENT_FAILED,
            f"no offline document registered for {url}",
        )


class JsonLdOptions:
    """http://json-ld.org/spec/latest/json-ld-api/#the-jsonldoptions-type
    (JsonLdOptions.cs:25-177)."""

    def __init__(self, base: Optional[str] = ""):
        self.base = base
        self.compact_arrays = True
        self.expand_context = None
        self.processing_mode = "json-ld-1.0"
        self.embed: Optional[bool] = None
        self.explicit: Optional[bool] = None
        self.omit_default: Optional[bool] = None
        self.use_rdf_type = False
        self.use_native_types = False
        self.produce_generalized_rdf = False
        self.sort_graphs_from_rdf = True
        self.sort_graph_nodes_from_rdf = True
        self.format: Optional[str] = None
        self.use_namespaces = False
        self.output_form: Optional[str] = None
        self.document_loader = DocumentLoader()

    def clone(self) -> "JsonLdOptions":
        # Matches reference Clone(): only base carries over (JsonLdOptions.cs:20-23)
        rval = JsonLdOptions(self.base)
        rval.document_loader = self.document_loader
        return rval
