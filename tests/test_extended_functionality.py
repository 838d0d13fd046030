"""Mirror of the reference's ExtendedFunctionalityTests: fromRDF graph/node
sorting flags with ORDER-SENSITIVE comparison
(ExtendedFunctionalityTests.cs:15-140, fixtures ExtendedFunctionality/Sorting/)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from rayld.kernel import JsonLdOptions
from rayld.kernel.api import JsonLdApi
from rayld.kernel.rdf import RDFDataset
from rayld.kernel.utils import deep_compare

ROOT = Path("/root/reference/test/json-ld.net.tests/ExtendedFunctionality/Sorting")

_SORT_FLAGS = {
    "jld:GraphsAndNodes": (True, True),
    "jld:Graphs": (True, False),
    "jld:Nodes": (False, True),
    "jld:None": (False, False),
}


def _cases():
    if not ROOT.exists():
        return []
    manifest = json.loads((ROOT / "fromRdf-manifest.jsonld").read_text(encoding="utf-8-sig"))
    out = []
    for tc in manifest["sequence"]:
        out.append(pytest.param(manifest["input"], tc, id=tc["@id"]))
    return out


@pytest.mark.skipif(not ROOT.exists(), reason="fixture tree absent")
@pytest.mark.parametrize("input_name,testcase", _cases())
def test_fromrdf_sorting(input_name, testcase):
    data = json.loads((ROOT / input_name).read_text(encoding="utf-8-sig"))
    expected = json.loads(
        (ROOT / testcase["expect"]).read_text(encoding="utf-8-sig")
    )
    opts = JsonLdOptions()
    sort_graphs, sort_nodes = _SORT_FLAGS[testcase["sort-type"]]
    opts.sort_graphs_from_rdf = sort_graphs
    opts.sort_graph_nodes_from_rdf = sort_nodes
    rdf = RDFDataset()
    for quad in data["quads"]:
        rdf.add_quad(quad["subject"], quad["predicate"], quad["value"], quad["graph"])
    result = JsonLdApi(opts=opts).from_rdf(rdf)
    assert deep_compare(result, expected, list_order_matters=True), (
        json.dumps(result, indent=1)
    )
