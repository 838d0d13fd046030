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


class HttpSemanticsLoader(DocumentLoader):
    """Document loader implementing the reference's HTTP content rules
    (Core/DocumentLoader.cs:48-111, Util/LDHttpClient.cs:23-50) over an
    abstract fetch: content-type classification (ld+json / plain *+json /
    other), redirect following (max 20), and ``Link rel=json-ld#context``
    header handling with the multiple-link error.

    Subclasses implement ``_fetch(url) -> (status, headers, document)`` where
    headers is a dict with optional "Content-Type" (str), "Link" (str or
    list) and "Location" (str); document is the parsed JSON body (or None).
    """

    MAX_REDIRECTS = 20
    _CONTEXT_REL = 'rel="http://www.w3.org/ns/json-ld#context"'

    def _fetch(self, url: str):
        raise JsonLdError(
            JsonLdError.LOADING_DOCUMENT_FAILED, f"no fetch backend for {url}"
        )

    @staticmethod
    def _classify(content_type: Optional[str]) -> str:
        if content_type == "application/ld+json":
            return "jsonld"
        if content_type == "application/json" or (
            isinstance(content_type, str) and content_type.endswith("+json")
        ):
            return "plainjson"
        return "other"

    def load_document(self, url: str) -> RemoteDocument:
        from . import url as URL

        try:
            redirects = 0
            final_url = url
            while True:
                status, headers, body = self._fetch(final_url)
                if 300 <= status < 400 and "Location" in headers:
                    final_url = URL.resolve(final_url, headers["Location"])
                    redirects += 1
                    if redirects >= self.MAX_REDIRECTS:
                        raise JsonLdError(
                            JsonLdError.LOADING_DOCUMENT_FAILED,
                            f"Too many redirects {url}",
                        )
                    continue
                break
            if status >= 400:
                raise JsonLdError(
                    JsonLdError.LOADING_DOCUMENT_FAILED, f"HTTP {status} {url}"
                )
            kind = self._classify(headers.get("Content-Type"))
            if kind == "other":
                raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED, url)
            doc = RemoteDocument(url, body)
            link = headers.get("Link")
            if kind == "plainjson" and link is not None:
                link_headers = link if isinstance(link, list) else [link]
                parts = [
                    h.strip()
                    for lh in link_headers
                    for h in lh.split(",")
                ]
                linked = [v for v in parts if v.endswith(self._CONTEXT_REL)]
                if len(linked) > 1:
                    raise JsonLdError(JsonLdError.MULTIPLE_CONTEXT_LINK_HEADERS)
                if linked:
                    header = linked[0]
                    linked_url = header[1:header.index(">")]
                    resolved = URL.resolve(final_url, linked_url)
                    remote_context = self.load_document(resolved)
                    doc.context_url = remote_context.document_url
                    doc.context = remote_context.document
            doc.document_url = final_url
            return doc
        except JsonLdError:
            raise
        except Exception as e:
            raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED, f"{url}: {e}")


class UrllibDocumentLoader(HttpSemanticsLoader):
    """Concrete network backend for the HTTP-semantics loader, closing the S8
    seam against the reference's real fetcher (Core/DocumentLoader.cs:48-111,
    Util/LDHttpClient.cs:23-50): stdlib urllib with the reference's Accept
    profile. OFF by default — pipelines keep the offline registry loader for
    determinism (SURVEY.md §7.6); opt in explicitly via
    ``options.document_loader = UrllibDocumentLoader()``. This sandbox has no
    network, so coverage is a stubbed-transport unit test."""

    ACCEPT = "application/ld+json, application/json;q=0.9, */*;q=0.1"

    def __init__(self, timeout: float = 10.0, opener=None):
        super().__init__()
        self.timeout = timeout
        self._opener = opener  # injectable transport for tests

    def _fetch(self, url: str):
        import json as _json
        import urllib.request

        class _NoRedirect(urllib.request.HTTPRedirectHandler):
            # redirects are handled by HttpSemanticsLoader.load_document so
            # Link headers resolve against each hop like the reference
            def redirect_request(self, req, fp, code, msg, headers, newurl):
                return None

        req = urllib.request.Request(url, headers={"Accept": self.ACCEPT})
        opener = self._opener or urllib.request.build_opener(_NoRedirect())
        try:
            resp = opener.open(req, timeout=self.timeout)
            status = resp.status
            headers = {
                k: v for k, v in resp.headers.items()
                if k in ("Content-Type", "Link", "Location")
            }
            ctype = headers.get("Content-Type", "")
            headers["Content-Type"] = ctype.split(";")[0].strip()
            body = None
            if self._classify(headers.get("Content-Type")) != "other":
                body = _json.loads(resp.read().decode("utf-8"))
            return status, headers, body
        except Exception as e:
            import urllib.error

            if isinstance(e, urllib.error.HTTPError):
                headers = {
                    k: v for k, v in e.headers.items()
                    if k in ("Content-Type", "Link", "Location")
                }
                return e.code, headers, None
            raise


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
        # c14n N-degree permutation-search cap (normalize.py): None = the
        # module default (7); 0 = unlimited, for strict-parity callers who
        # accept factorial blowup on pathological same-hash bnode cliques
        self.max_permutation_group: Optional[int] = None

    def clone(self) -> "JsonLdOptions":
        # Matches reference Clone(): only base carries over (JsonLdOptions.cs:20-23)
        rval = JsonLdOptions(self.base)
        rval.document_loader = self.document_loader
        return rval
