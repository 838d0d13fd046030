"""Public JSON-LD processor API: expand / compact / flatten / frame / toRDF /
fromRDF / normalize, plus the RDF-parser plugin registry.

Parity reference: /root/reference/src/json-ld.net/Core/JsonLdProcessor.cs
(Compact :16-61, Expand :64-155, Flatten :158-253, Frame :256-282,
parser registry :284-315, FromRDF :326-395, ToRDF :407-475, Normalize :488-500)
and JsonLdUtils.RemovePreserve (JsonLdUtils.cs:595-653).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from .api import JsonLdApi
from .context import Context
from .errors import JsonLdError
from .nquads import parse_nquads, to_nquads
from .options import JsonLdOptions
from .rdf import RDFDataset
from .utils import is_array, is_list, is_object, is_value


def _default_options(opts: Optional[JsonLdOptions]) -> JsonLdOptions:
    return opts if opts is not None else JsonLdOptions("")


def expand(input_: Any, opts: Optional[JsonLdOptions] = None) -> list:
    opts = _default_options(opts)
    # 2) IRI-string input detection (JsonLdProcessor.cs:69-109)
    is_iri_string = isinstance(input_, str)
    if is_iri_string:
        has_colon = False
        for c in input_:
            if c == ":":
                has_colon = True
            if not has_colon and c in "{[":
                is_iri_string = False
                break
    if is_iri_string:
        try:
            remote_doc = opts.document_loader.load_document(input_)
            input_ = remote_doc.document
        except JsonLdError:
            raise
        except Exception as e:  # pragma: no cover
            raise JsonLdError(JsonLdError.LOADING_DOCUMENT_FAILED, str(e))
        if opts.base is None:
            opts.base = input_ if isinstance(input_, str) else opts.base
    # 3)
    active_ctx = Context(opts)
    # 4)
    if opts.expand_context is not None:
        ex_ctx = opts.expand_context
        if isinstance(ex_ctx, dict) and "@context" in ex_ctx:
            ex_ctx = ex_ctx["@context"]
        active_ctx = active_ctx.parse(ex_ctx)
    # 6)
    expanded = JsonLdApi(opts=opts).expand(active_ctx, input_)
    # final step of Expansion Algorithm
    if isinstance(expanded, dict) and "@graph" in expanded and len(expanded) == 1:
        expanded = expanded["@graph"]
    elif expanded is None:
        expanded = []
    if not isinstance(expanded, list):
        expanded = [expanded]
    return expanded


def compact(input_: Any, context: Any, opts: Optional[JsonLdOptions] = None) -> dict:
    opts = _default_options(opts)
    # 2-6)
    expanded = expand(input_, opts)
    # 7)
    if isinstance(context, dict) and "@context" in context:
        context = context["@context"]
    active_ctx = Context(opts).parse(context)
    # 8)
    compacted = JsonLdApi(opts=opts).compact(active_ctx, None, expanded, opts.compact_arrays)
    if isinstance(compacted, list):
        if len(compacted) == 0:
            compacted = {}
        else:
            compacted = {active_ctx.compact_iri("@graph", relative_to_vocab=True): compacted}
    if compacted is not None and context is not None:
        if (isinstance(context, dict) and context) or (isinstance(context, list) and context):
            compacted["@context"] = context
    return compacted


def flatten(input_: Any, context: Any = None, opts: Optional[JsonLdOptions] = None) -> Any:
    from .utils import sorted_ordinal

    opts = _default_options(opts)
    expanded = expand(input_, opts)
    if isinstance(context, dict) and "@context" in context:
        context = context["@context"]
    # Flattening Algorithm (JsonLdProcessor.cs:170-244)
    node_map: dict = {"@default": {}}
    JsonLdApi(opts=opts).generate_node_map(expanded, node_map)
    default_graph = node_map.pop("@default")
    for graph_name in node_map.keys():
        graph = node_map[graph_name]
        if graph_name not in default_graph:
            entry = {"@id": graph_name}
            default_graph[graph_name] = entry
        else:
            entry = default_graph[graph_name]
        if "@graph" not in entry:
            entry["@graph"] = []
        for id_ in sorted_ordinal(graph.keys()):
            node = graph[id_]
            if not ("@id" in node and len(node) == 1):
                entry["@graph"].append(node)
    flattened = []
    for id_1 in sorted_ordinal(default_graph.keys()):
        node = default_graph[id_1]
        if not ("@id" in node and len(node) == 1):
            flattened.append(node)
    # 8)
    if context is not None and flattened:
        active_ctx = Context(opts).parse(context)
        compacted = JsonLdApi(opts=opts).compact(
            active_ctx, None, flattened, opts.compact_arrays
        )
        if not isinstance(compacted, list):
            compacted = [compacted]
        alias = active_ctx.compact_iri("@graph")
        rval = active_ctx.serialize()
        rval[alias] = compacted
        return rval
    return flattened


def frame(input_: Any, frame_doc: Any, opts: Optional[JsonLdOptions] = None) -> dict:
    from .utils import clone

    opts = _default_options(opts)
    if isinstance(frame_doc, dict):
        frame_doc = clone(frame_doc)
    expanded_input = expand(input_, opts)
    expanded_frame = expand(frame_doc, opts)
    api = JsonLdApi(expanded_input, opts)
    framed = api.frame(expanded_input, expanded_frame)
    ctx_token = frame_doc.get("@context") if isinstance(frame_doc, dict) else None
    active_ctx = api.context.parse(ctx_token)
    compacted = api.compact(active_ctx, None, framed)
    if not isinstance(compacted, list):
        compacted = [compacted]
    alias = active_ctx.compact_iri("@graph")
    rval = active_ctx.serialize()
    rval[alias] = compacted
    remove_preserve(active_ctx, rval, opts)
    return rval


def remove_preserve(ctx: Context, input_: Any, opts: JsonLdOptions) -> Any:
    """Strip @preserve after framing (JsonLdUtils.cs:595-653)."""
    if is_array(input_):
        output = []
        for i in input_:
            result = remove_preserve(ctx, i, opts)
            if result is not None:
                output.append(result)
        return output
    if is_object(input_):
        if "@preserve" in input_:
            if input_["@preserve"] == "@null":
                return None
            return input_["@preserve"]
        if is_value(input_):
            return input_
        if is_list(input_):
            input_["@list"] = remove_preserve(ctx, input_["@list"], opts)
            return input_
        for prop in list(input_.keys()):
            result = remove_preserve(ctx, input_[prop], opts)
            container = ctx.get_container(prop)
            if (
                opts.compact_arrays
                and is_array(result)
                and len(result) == 1
                and container is None
            ):
                result = result[0]
            input_[prop] = result
    return input_


# ---------------------------------------------------------------------------
# Context URL pre-resolution (JsonLdUtils.cs:888-1060) — the offline
# "context prefetch" tool: replaces every remote @context URL in a document
# with the dereferenced context so the hot path never does I/O (SURVEY.md U10)
# ---------------------------------------------------------------------------

_MAX_CONTEXT_URLS = 10


def resolve_context_urls(input_: Any, loader=None, _cycles: Optional[set] = None) -> Any:
    """Mutates ``input_`` so every string @context (or string member of an
    array @context) is replaced by the loaded context document. Cycle-capped
    at 10 like the reference."""
    if loader is None:
        from .options import DocumentLoader

        loader = DocumentLoader()
    if _cycles is None:
        _cycles = set()
    if len(_cycles) > _MAX_CONTEXT_URLS:
        raise JsonLdError(JsonLdError.UNKNOWN_ERROR, "too many remote contexts")

    urls: dict = {}
    _find_context_urls(input_, urls, replace=False)
    for url in [u for u, v in urls.items() if v is False]:
        if url in _cycles:
            raise JsonLdError(JsonLdError.UNKNOWN_ERROR, f"context cycle at {url}")
        ctx_doc = loader.load_document(url).document
        if not isinstance(ctx_doc, dict) or "@context" not in ctx_doc:
            ctx_doc = {"@context": {}}
        resolve_context_urls(ctx_doc, loader, _cycles | {url})
        urls[url] = ctx_doc["@context"]
    if urls:
        _find_context_urls(input_, urls, replace=True)
    return input_


def _find_context_urls(input_: Any, urls: dict, replace: bool) -> bool:
    """JsonLdUtils.FindContextUrls (JsonLdUtils.cs:973-1060)."""
    count = len(urls)
    if isinstance(input_, list):
        for i in input_:
            _find_context_urls(i, urls, replace)
        return count < len(urls)
    if isinstance(input_, dict):
        for key in list(input_.keys()):
            if key != "@context":
                _find_context_urls(input_[key], urls, replace)
                continue
            ctx = input_[key]
            if isinstance(ctx, list):
                new_ctx: list = []
                for item in ctx:
                    if isinstance(item, str):
                        if replace:
                            resolved = urls[item]
                            if isinstance(resolved, list):
                                new_ctx.extend(resolved)
                            else:
                                new_ctx.append(resolved)
                        else:
                            urls.setdefault(item, False)
                            new_ctx.append(item)
                    else:
                        new_ctx.append(item)
                if replace:
                    input_[key] = new_ctx
            elif isinstance(ctx, str):
                if replace:
                    input_[key] = urls[ctx]
                else:
                    urls.setdefault(ctx, False)
        return count < len(urls)
    return False


# ---------------------------------------------------------------------------
# RDF parser registry (JsonLdProcessor.cs:284-315) — user-extension surface
# ---------------------------------------------------------------------------

_rdf_parsers: dict = {}


def register_rdf_parser(format_: str, parser: Callable[[Any], RDFDataset]) -> None:
    _rdf_parsers[format_] = parser


def remove_rdf_parser(format_: str) -> None:
    _rdf_parsers.pop(format_, None)


def _nquad_rdf_parser(input_: Any) -> RDFDataset:
    """NQuadRDFParser (Impl/NQuadRDFParser.cs:7-23)."""
    if not isinstance(input_, str):
        raise JsonLdError(
            JsonLdError.INVALID_INPUT, "NQuad Parser expected string input."
        )
    return parse_nquads(input_)


register_rdf_parser("application/nquads", _nquad_rdf_parser)
try:  # Turtle reader plugin (optional; Impl/TurtleRDFParser.cs)
    from .turtle import parse_turtle as _parse_turtle

    register_rdf_parser("text/turtle", _parse_turtle)
except ImportError:  # pragma: no cover
    pass


def from_rdf(dataset: Any, opts: Optional[JsonLdOptions] = None,
             parser: Optional[Callable[[Any], RDFDataset]] = None) -> Any:
    opts = _default_options(opts)
    if isinstance(dataset, RDFDataset):
        parsed = dataset
    else:
        if parser is None:
            if opts.format is None and isinstance(dataset, str):
                opts.format = "application/nquads"
            if opts.format in _rdf_parsers:
                parser = _rdf_parsers[opts.format]
            else:
                raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, opts.format)
        parsed = parser(dataset)
    rval = JsonLdApi(opts=opts).from_rdf(parsed)
    if opts.output_form is not None:
        if opts.output_form == "expanded":
            return rval
        if opts.output_form == "compacted":
            return compact(rval, parsed.get_context(), opts)
        if opts.output_form == "flattened":
            return flatten(rval, parsed.get_context(), opts)
        raise JsonLdError(JsonLdError.UNKNOWN_ERROR)
    return rval


def to_rdf(input_: Any, opts: Optional[JsonLdOptions] = None,
           callback: Optional[Callable[[RDFDataset], Any]] = None) -> Any:
    opts = _default_options(opts)
    expanded_input = expand(input_, opts)
    api = JsonLdApi(expanded_input, opts)
    dataset = api.to_rdf()
    # generate namespaces from context (JsonLdProcessor.cs:414-433)
    if opts.use_namespaces:
        _input = input_ if isinstance(input_, list) else [input_]
        for e in _input:
            if isinstance(e, dict) and "@context" in e:
                dataset.parse_context(e["@context"])
    if callback is not None:
        return callback(dataset)
    if opts.format is not None:
        if opts.format == "application/nquads":
            return to_nquads(dataset)
        if opts.format == "text/turtle":
            try:
                from .turtle import to_turtle

                return to_turtle(dataset)
            except ImportError:  # pragma: no cover
                raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, opts.format)
        raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, opts.format)
    return dataset


def normalize(input_: Any, opts: Optional[JsonLdOptions] = None) -> Any:
    opts = _default_options(opts)
    cloned = opts.clone()
    cloned.format = None
    dataset = to_rdf(input_, cloned)
    return JsonLdApi(opts=opts).normalize(dataset)
