"""Run the W3C JSON-LD 1.0 conformance fixtures (mirrored in the reference
repo's test tree) against the rayld kernel and report pass rates per manifest.

Usage: python scripts/w3c_report.py [manifest-prefix ...] [-v] [-k substr]

Fixture source: /root/reference/test/json-ld.net.tests/W3C (read-only). The
harness mirrors ConformanceTests.cs:55-235.
"""

from __future__ import annotations

import json
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rayld.kernel import (  # noqa: E402
    JsonLdError,
    JsonLdOptions,
    compact,
    expand,
    flatten,
    frame,
    from_rdf,
    normalize,
    to_rdf,
)

W3C = Path("/root/reference/test/json-ld.net.tests/W3C")

MANIFESTS = [
    "compact-manifest.jsonld",
    "expand-manifest.jsonld",
    "flatten-manifest.jsonld",
    "frame-manifest.jsonld",
    "toRdf-manifest.jsonld",
    "fromRdf-manifest.jsonld",
    "normalize-manifest.jsonld",
    "error-manifest.jsonld",
    "remote-doc-manifest.jsonld",
]


def get_json(name):
    if name is None:
        return None
    return json.loads((W3C / name).read_text(encoding="utf-8-sig"))


def harness_deep_compare(v1, v2, list_order_matters=False):
    """ConformanceTests oracle = JsonLdUtils.DeepCompare incl. the harness
    newline/https scalar normalization (JsonLdUtils.cs:129-131)."""
    if v1 is None or v2 is None:
        return v1 is None and v2 is None
    if isinstance(v1, dict) and isinstance(v2, dict):
        if len(v1) != len(v2):
            return False
        return all(
            k in v2 and harness_deep_compare(v, v2[k], list_order_matters)
            for k, v in v1.items()
        )
    if isinstance(v1, list) and isinstance(v2, list):
        if len(v1) != len(v2):
            return False
        if list_order_matters:
            return all(harness_deep_compare(a, b, True) for a, b in zip(v1, v2))
        matched = [False] * len(v2)
        for o1 in v1:
            got = False
            for j, o2 in enumerate(v2):
                if not matched[j] and harness_deep_compare(o1, o2):
                    matched[j] = True
                    got = True
                    break
            if not got:
                return False
        return True
    if isinstance(v1, (dict, list)) or isinstance(v2, (dict, list)):
        return False

    def tok(v):
        if v is True:
            return "True"
        if v is False:
            return "False"
        if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return str(v).replace("\r\n", "").replace("\n", "").replace("http:", "https:")

    return tok(v1) == tok(v2)


class _W3CLoader:
    """Offline loader serving the vendored test-suite files for the
    ``http(s)://json-ld.org/test-suite/tests/`` URL space (stand-in for the
    reference harness's live HTTP fetch)."""

    PREFIXES = (
        "http://json-ld.org/test-suite/tests/",
        "https://json-ld.org/test-suite/tests/",
    )

    def load_document(self, url):
        from rayld.kernel.options import RemoteDocument

        for prefix in self.PREFIXES:
            if url.startswith(prefix):
                name = url[len(prefix):]
                path = W3C / name
                if path.exists():
                    return RemoteDocument(url, get_json(name))
        raise JsonLdError(
            JsonLdError.LOADING_DOCUMENT_FAILED, f"no offline document for {url}"
        )


class _SimulatedHttpLoader:
    """HTTP-semantics loader over the fixture dir, simulating the remote-doc
    manifest's HTTP options (contentType / redirectTo / httpStatus /
    httpLink) — the offline stand-in for the reference harness's live
    fetches (ConformanceTests.cs:193-204)."""

    def __new__(cls):
        from rayld.kernel.options import HttpSemanticsLoader

        class Impl(HttpSemanticsLoader):
            def __init__(self):
                super().__init__()
                self.options_by_name = _remote_doc_options()

            def _fetch(self, url):
                name = None
                for prefix in _W3CLoader.PREFIXES:
                    if url.startswith(prefix):
                        name = url[len(prefix):]
                        break
                if name is None:
                    return (404, {}, None)
                option = self.options_by_name.get(name, {})
                if "redirectTo" in option:
                    return (
                        option.get("httpStatus", 301),
                        {"Location": option["redirectTo"]},
                        None,
                    )
                path = W3C / name
                if not path.exists():
                    return (404, {}, None)
                if "contentType" in option:
                    content_type = option["contentType"]
                elif name.endswith(".jsonld"):
                    content_type = "application/ld+json"
                elif name.endswith(".json"):
                    content_type = "application/json"
                else:
                    content_type = "application/octet-stream"
                headers = {"Content-Type": content_type}
                if "httpLink" in option:
                    headers["Link"] = option["httpLink"]
                return (200, headers, get_json(name))

        return Impl()


def _remote_doc_options():
    opts = {}
    manifest_path = W3C / "remote-doc-manifest.jsonld"
    if manifest_path.exists():
        manifest = json.loads(manifest_path.read_text(encoding="utf-8-sig"))
        for t in manifest["sequence"]:
            if "option" in t:
                opts[t["input"]] = t["option"]
    return opts


def build_cases(manifest_name):
    manifest = get_json(manifest_name)
    cases = []
    for testcase in manifest["sequence"]:
        tc = dict(testcase)
        tc["__remote__"] = manifest.get("name") == "Remote document"
        cases.append((manifest_name, tc))
    return cases


def run_case(testcase):
    """Returns (ok, detail). Mirrors ConformanceTests.cs case construction."""
    test_type = testcase["@type"]
    opts = JsonLdOptions("http://json-ld.org/test-suite/tests/" + testcase["input"])
    opts.document_loader = _W3CLoader()
    input_doc = None
    context_doc = get_json(testcase.get("context"))
    frame_doc = get_json(testcase.get("frame"))
    expect_error = None
    output = None

    if "jld:NegativeEvaluationTest" in test_type:
        expect_error = testcase["expect"]
    elif "jld:PositiveEvaluationTest" in test_type:
        if any(t in test_type for t in ("jld:ToRDFTest", "jld:NormalizeTest")):
            output = (W3C / testcase["expect"]).read_text(encoding="utf-8-sig")
        elif "jld:FromRDFTest" in test_type:
            input_doc = (W3C / testcase["input"]).read_text(encoding="utf-8-sig")
            output = get_json(testcase["expect"])
        else:
            output = get_json(testcase["expect"])

    is_remote = testcase.get("__remote__", False)
    if "jld:FromRDFTest" not in test_type and input_doc is None and not is_remote:
        input_doc = get_json(testcase["input"])

    option = testcase.get("option", {})
    if "compactArrays" in option:
        opts.compact_arrays = option["compactArrays"]
    if "base" in option:
        opts.base = option["base"]
    if "expandContext" in option:
        context_doc = get_json(option["expandContext"])
        opts.expand_context = context_doc
    if "produceGeneralizedRdf" in option:
        opts.produce_generalized_rdf = option["produceGeneralizedRdf"]
    if "useNativeTypes" in option:
        opts.use_native_types = option["useNativeTypes"]
    if "useRdfType" in option:
        opts.use_rdf_type = option["useRdfType"]

    def run():
        nonlocal input_doc, context_doc
        if is_remote:
            # remote flow (ConformanceTests.cs:193-204): fetch the document
            # through the HTTP-semantics loader, adopt its final URL as base
            # and its linked context as expandContext
            loader = _SimulatedHttpLoader()
            remote_doc = loader.load_document(
                "https://json-ld.org/test-suite/tests/" + testcase["input"]
            )
            input_doc = remote_doc.document
            opts.base = remote_doc.document_url
            opts.expand_context = remote_doc.context
        if "jld:CompactTest" in test_type:
            return compact(input_doc, context_doc, opts)
        if "jld:ExpandTest" in test_type:
            return expand(input_doc, opts)
        if "jld:FlattenTest" in test_type:
            return flatten(input_doc, context_doc, opts)
        if "jld:FrameTest" in test_type:
            return frame(input_doc, frame_doc, opts)
        if "jld:NormalizeTest" in test_type:
            opts.format = None
            from rayld.kernel import to_nquads

            res = normalize(input_doc, opts)
            return res if isinstance(res, str) else to_nquads(res)
        if "jld:ToRDFTest" in test_type:
            opts.format = "application/nquads"
            return to_rdf(input_doc, opts)
        if "jld:FromRDFTest" in test_type:
            opts.format = "application/nquads"
            return from_rdf(input_doc, opts)
        raise RuntimeError("unknown test type " + str(test_type))

    if expect_error is not None:
        try:
            result = run()
            return False, f"expected error {expect_error!r}, got result"
        except JsonLdError as err:
            if str(err).startswith(expect_error):
                return True, ""
            return False, f"expected error {expect_error!r}, got {err}"
        except Exception as e:
            return False, f"expected JsonLdError {expect_error!r}, got {type(e).__name__}: {e}"
    try:
        result = run()
    except Exception as e:
        return False, f"raised {type(e).__name__}: {e}\n{traceback.format_exc(limit=8)}"
    if isinstance(output, str) and not isinstance(result, (dict, list)):
        norm = lambda s: s.replace("\r\n", "\n")
        if norm(result) == norm(output):
            return True, ""
        return False, f"--- got ---\n{result}\n--- want ---\n{output}"
    if harness_deep_compare(result, output):
        return True, ""
    return (
        False,
        "--- got ---\n%s\n--- want ---\n%s"
        % (json.dumps(result, indent=1, ensure_ascii=False),
           json.dumps(output, indent=1, ensure_ascii=False)),
    )


def main(argv):
    verbose = "-v" in argv
    argv = [a for a in argv if a != "-v"]
    only = None
    if "-k" in argv:
        i = argv.index("-k")
        only = argv[i + 1]
        del argv[i:i + 2]
    prefixes = argv or [m.split("-")[0] for m in MANIFESTS]
    totals = {}
    for manifest_name in MANIFESTS:
        if not any(manifest_name.startswith(p) for p in prefixes):
            continue
        npass = nfail = 0
        fails = []
        for _, testcase in build_cases(manifest_name):
            tid = testcase.get("@id", "?")
            if only and only not in tid and only not in testcase.get("input", ""):
                continue
            ok, detail = run_case(testcase)
            if ok:
                npass += 1
            else:
                nfail += 1
                fails.append((tid, testcase.get("input"), detail))
        totals[manifest_name] = (npass, nfail)
        print(f"{manifest_name}: {npass} pass, {nfail} fail")
        for tid, input_name, detail in fails:
            print(f"  FAIL {tid} ({input_name})")
            if verbose:
                print("    " + detail.replace("\n", "\n    "))
    print("---")
    tp = sum(p for p, _ in totals.values())
    tf = sum(f for _, f in totals.values())
    print(f"TOTAL: {tp} pass, {tf} fail")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
