"""Kernel extras: context-URL pre-resolution, document loader seam, context
serialization, options plumbing, error surfaces."""

from __future__ import annotations

import pytest

from rayld.kernel import (
    DocumentLoader,
    JsonLdError,
    JsonLdOptions,
    compact,
    expand,
)
from rayld.kernel.context import Context
from rayld.kernel.processor import resolve_context_urls


def test_resolve_context_urls_inline():
    loader = DocumentLoader(
        {
            "http://ctx.example/a": {"@context": {"name": "http://schema.org/name"}},
        }
    )
    doc = {"@context": "http://ctx.example/a", "name": "x"}
    resolve_context_urls(doc, loader)
    assert doc["@context"] == {"name": "http://schema.org/name"}
    out = expand(doc, JsonLdOptions(""))
    assert out == [{"http://schema.org/name": [{"@value": "x"}]}]


def test_resolve_context_urls_chain_and_array():
    loader = DocumentLoader(
        {
            "http://ctx.example/a": {"@context": "http://ctx.example/b"},
            "http://ctx.example/b": {"@context": {"p": "http://ex/p"}},
        }
    )
    doc = {"@context": ["http://ctx.example/a", {"q": "http://ex/q"}], "p": 1, "q": 2}
    resolve_context_urls(doc, loader)
    assert doc["@context"][0] == {"p": "http://ex/p"}


def test_resolve_context_urls_cycle():
    loader = DocumentLoader(
        {
            "http://ctx.example/a": {"@context": "http://ctx.example/b"},
            "http://ctx.example/b": {"@context": "http://ctx.example/a"},
        }
    )
    doc = {"@context": "http://ctx.example/a"}
    with pytest.raises(JsonLdError):
        resolve_context_urls(doc, loader)


def test_remote_context_via_loader():
    opts = JsonLdOptions("http://base.example/doc")
    opts.document_loader = DocumentLoader(
        {"http://ctx.example/c": {"@context": {"t": "http://ex/t"}}}
    )
    doc = {"@context": "http://ctx.example/c", "t": "v"}
    assert expand(doc, opts) == [{"http://ex/t": [{"@value": "v"}]}]


def test_missing_remote_context_fails_deterministically():
    doc = {"@context": "http://nowhere.example/ctx", "a": 1}
    with pytest.raises(JsonLdError) as ei:
        expand(doc, JsonLdOptions(""))
    assert str(ei.value).startswith(JsonLdError.LOADING_REMOTE_CONTEXT_FAILED)


def test_context_serialize_roundtrip():
    opts = JsonLdOptions("")
    ctx = Context(opts).parse(
        {
            "name": "http://schema.org/name",
            "tags": {"@id": "http://schema.org/keywords", "@container": "@list"},
            "homepage": {"@id": "http://schema.org/url", "@type": "@id"},
        }
    )
    ser = ctx.serialize()
    assert ser["@context"]["name"] == "http://schema.org/name"
    assert ser["@context"]["tags"]["@container"] == "@list"
    # reparse of serialized context behaves identically
    ctx2 = Context(opts).parse(ser["@context"])
    assert ctx2.expand_iri("tags", False, True, None, None) == "http://schema.org/keywords"


def test_compact_with_registered_prefix():
    doc = [{"http://schema.org/name": [{"@value": "n"}]}]
    out = compact(doc, {"sc": "http://schema.org/"}, JsonLdOptions(""))
    assert out["sc:name"] == "n"


def test_from_rdf_output_forms():
    from rayld.kernel import from_rdf, JsonLdOptions

    nq = (
        '<http://ex/s> <http://ex/p> "v" .\n'
        '<http://ex/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/T> .\n'
    )
    expanded = from_rdf(nq, JsonLdOptions(""))
    assert expanded[0]["@id"] == "http://ex/s"
    opts = JsonLdOptions("")
    opts.output_form = "expanded"
    assert from_rdf(nq, opts) == expanded
    opts2 = JsonLdOptions("")
    opts2.output_form = "compacted"
    compacted = from_rdf(nq, opts2)
    assert "@context" in compacted or compacted  # compact path executes
    opts3 = JsonLdOptions("")
    opts3.output_form = "flattened"
    flattened = from_rdf(nq, opts3)
    assert flattened


def test_to_rdf_use_namespaces_turtle():
    from rayld.kernel import to_rdf, JsonLdOptions
    from rayld.kernel.turtle import parse_turtle

    doc = {
        "@context": {"ex": "http://example.org/"},
        "@id": "ex:s",
        "ex:p": "v",
    }
    opts = JsonLdOptions("")
    opts.format = "text/turtle"
    opts.use_namespaces = True
    ttl = to_rdf(doc, opts)
    assert "@prefix ex: <http://example.org/> ." in ttl
    assert "ex:p" in ttl
    reparsed = parse_turtle(ttl)
    assert len(reparsed.get_quads("@default")) == 1


def test_use_rdf_type_option():
    from rayld.kernel import from_rdf, JsonLdOptions

    nq = '<http://ex/s> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/T> .\n'
    default = from_rdf(nq, JsonLdOptions(""))
    assert default[0]["@type"] == ["http://ex/T"]
    opts = JsonLdOptions("")
    opts.use_rdf_type = True
    raw = from_rdf(nq, opts)
    assert "@type" not in raw[0]
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" in raw[0]


def test_urllib_loader_with_stub_transport():
    """UrllibDocumentLoader drives the HTTP-semantics rules over an injected
    opener (no network in the sandbox): redirect then ld+json body, and a
    Link rel=context header on plain JSON."""
    import json
    from email.message import Message

    from rayld.kernel import JsonLdOptions, expand
    from rayld.kernel.options import UrllibDocumentLoader

    class Resp:
        def __init__(self, status, headers, body=None):
            self.status = status
            self.headers = Message()
            for k, v in headers.items():
                self.headers[k] = v
            self._body = body

        def read(self):
            return json.dumps(self._body).encode()

    routes = {
        "http://ex.test/doc": Resp(301, {"Location": "/doc2"}),
        "http://ex.test/doc2": Resp(
            200, {"Content-Type": "application/ld+json"},
            {"@context": {"name": "http://schema.org/name"}, "name": "x"},
        ),
        "http://ex.test/plain": Resp(
            200,
            {"Content-Type": "application/json",
             "Link": '<ctx>; rel="http://www.w3.org/ns/json-ld#context"'},
            {"name": "y"},
        ),
        "http://ex.test/ctx": Resp(
            200, {"Content-Type": "application/ld+json"},
            {"@context": {"name": "http://schema.org/name"}},
        ),
    }

    class Opener:
        def open(self, req, timeout=None):
            r = routes[req.full_url]
            if r.status >= 400:
                raise AssertionError("unused")
            return r

    loader = UrllibDocumentLoader(opener=Opener())
    doc = loader.load_document("http://ex.test/doc")
    assert doc.document_url == "http://ex.test/doc2"  # redirect followed
    assert doc.document["name"] == "x"
    plain = loader.load_document("http://ex.test/plain")
    assert plain.context == {"@context": {"name": "http://schema.org/name"}}
    # and the loaded context actually drives expansion
    opts = JsonLdOptions("")
    opts.document_loader = loader
    out = expand(doc.document, opts)
    assert out[0]["http://schema.org/name"][0]["@value"] == "x"
