"""W3C N-Quads syntax suite (positive + negative) against the kernel parser.

Mirrors NQuadsParserTests.cs:38-57 — positives must parse, ``*-bad-*`` files
must raise JsonLdError. Also covers serialize round-trips and escaping.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from rayld.kernel import JsonLdError, parse_nquads, to_nquads
from rayld.kernel.nquads import escape, unescape

NQUADS_DIR = Path("/root/reference/test/json-ld.net.tests/NQuads")


def _discover():
    """Self-hosting suite discovery, exactly like the reference
    (NQuadsParserTests.cs:70-95): parse manifest.ttl with the Turtle parser,
    fromRDF it, frame it, split entries by rdft type."""
    if not NQUADS_DIR.exists():
        return [], []
    from rayld.kernel import JsonLdOptions, frame, from_rdf
    from rayld.kernel.turtle import parse_turtle

    manifest_frame = {
        "@context": {
            "mf": "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#",
            "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
            "rdft": "http://www.w3.org/ns/rdftest#",
            "mf:entries": {"@container": "@list"},
            "mf:action": {"@type": "@id"},
        },
        "@type": "mf:Manifest",
    }
    ttl = (NQUADS_DIR / "manifest.ttl").read_text(encoding="utf-8-sig")
    expanded = from_rdf(parse_turtle(ttl), JsonLdOptions(""))
    framed = frame(expanded, manifest_frame, JsonLdOptions(""))
    entries = next(g for g in framed["@graph"] if "mf:entries" in g)["mf:entries"]
    pos, neg = [], []
    for e in entries:
        action = e["mf:action"]
        if isinstance(action, dict):
            action = action["@id"]
        path = NQUADS_DIR / action.split("/")[-1]
        if e.get("@type") == "rdft:TestNQuadsNegativeSyntax":
            neg.append(path)
        else:
            pos.append(path)
    return pos, neg


_positive, _negative = _discover()
_files = _positive + _negative


@pytest.mark.skipif(not _files, reason="NQuads fixture tree not available")
@pytest.mark.parametrize("path", _positive, ids=lambda p: p.name)
def test_positive_parse(path):
    parse_nquads(path.read_text(encoding="utf-8-sig"))


@pytest.mark.skipif(not _files, reason="NQuads fixture tree not available")
@pytest.mark.parametrize("path", _negative, ids=lambda p: p.name)
def test_negative_parse(path):
    with pytest.raises(JsonLdError):
        parse_nquads(path.read_text(encoding="utf-8-sig"))


def test_roundtrip_basic():
    # to_nquads emits in globally sorted order (RDFDatasetUtils.cs:234)
    text = (
        '<http://ex/s> <http://ex/p> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<http://ex/s> <http://ex/p> "v" .\n'
        '<http://ex/s> <http://ex/p> "v"@en .\n'
        "_:b0 <http://ex/p> _:b1 <http://ex/g> .\n"
    )
    ds = parse_nquads(text)
    assert to_nquads(ds) == text


def test_dedup_within_graph():
    text = '<http://ex/s> <http://ex/p> "v" .\n' * 3
    ds = parse_nquads(text)
    assert len(ds.get_quads("@default")) == 1


def test_escape_unescape_roundtrip():
    s = 'tab\t newline\n quote" backslash\\ unicode☃ astral\U0001F600'
    assert unescape(escape(s)) == s
    assert "\\u2603" in escape(s)
    assert "\\U0001f600" in escape(s)


@pytest.mark.skipif(not NQUADS_DIR.exists(), reason="NQuads fixture tree absent")
def test_parse_rdf11_blank_nodes():
    """NQuadsParserTests.ParseBlankNodesTest (NQuadsParserTests.cs:59-68)."""
    parse_nquads((NQUADS_DIR / "rdf11blanknodes.nq").read_text(encoding="utf-8-sig"))
