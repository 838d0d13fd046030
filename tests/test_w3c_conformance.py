"""W3C JSON-LD 1.0 conformance suite against the rayld kernel.

Fixtures are read from the reference checkout's vendored W3C test tree
(test data, not code); skipped when that tree is absent. Mirrors the
reference harness ConformanceTests.cs:55-235.
"""

from __future__ import annotations

import importlib.util
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
_spec = importlib.util.spec_from_file_location(
    "w3c_report", REPO_ROOT / "scripts" / "w3c_report.py"
)
w3c = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(w3c)

pytestmark = pytest.mark.skipif(
    not w3c.W3C.exists(), reason="W3C fixture tree not available"
)


def _all_cases():
    if not w3c.W3C.exists():
        return []
    cases = []
    for manifest_name in w3c.MANIFESTS:
        for _, testcase in w3c.build_cases(manifest_name):
            cid = f"{manifest_name.split('-')[0]}{testcase.get('@id', '?')}"
            cases.append(pytest.param(testcase, id=cid))
    return cases


@pytest.mark.parametrize("testcase", _all_cases())
def test_w3c_case(testcase):
    ok, detail = w3c.run_case(testcase)
    assert ok, detail
