"""Scalar function library — the engine's reusable per-value kernels
(SURVEY.md §2.7 U1-U14 / §2.8 "string/date/math scalar functions"),
re-exported from their implementation homes for use inside map_batches UDFs.
"""

from ..kernel.nquads import escape as nquads_escape, unescape as nquads_unescape
from ..kernel.rdf import xsd_double_canonical
from ..kernel.url import (
    parse as url_parse,
    remove_base as url_remove_base,
    remove_dot_segments,
    resolve as url_resolve,
)
from ..kernel.utils import (
    compare_ordinal,
    compare_shortest_least,
    deep_compare,
    is_absolute_iri,
    is_blank_node,
    is_keyword,
    is_relative_iri,
    sorted_ordinal,
    utf16_key,
)
from ..pipelines.dedup import jaccard, minhash_signature, simhash_signature
from ..stages.linker import build_token_index
from .vectorized import (
    crc32_buckets,
    l2_normalize_rows,
    money_cents,
    utf16_sort_keys,
)

__all__ = [
    "crc32_buckets",
    "l2_normalize_rows",
    "money_cents",
    "utf16_sort_keys",
    "nquads_escape",
    "nquads_unescape",
    "xsd_double_canonical",
    "url_parse",
    "url_resolve",
    "url_remove_base",
    "remove_dot_segments",
    "compare_ordinal",
    "compare_shortest_least",
    "deep_compare",
    "is_absolute_iri",
    "is_blank_node",
    "is_keyword",
    "is_relative_iri",
    "sorted_ordinal",
    "utf16_key",
    "jaccard",
    "minhash_signature",
    "simhash_signature",
    "build_token_index",
]
