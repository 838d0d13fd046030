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

_files = sorted(NQUADS_DIR.glob("*.nq")) if NQUADS_DIR.exists() else []
_positive = [p for p in _files if "bad" not in p.name]
_negative = [p for p in _files if "bad" in p.name]


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
