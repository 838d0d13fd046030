"""Shape predicates and value helpers for the JSON-LD kernel.

Parity reference: /root/reference/src/json-ld.net/Core/JsonLdUtils.cs and
Util/JavaCompat.cs (ordinal string sorting).

JSON values are plain Python: dict / list / str / bool / int / float / None.
``bool`` must be tested before ``int`` everywhere (Python bool is an int).
"""

from __future__ import annotations

import copy
from typing import Any

from .consts import KEYWORDS


def is_keyword(v: Any) -> bool:
    """JsonLdUtils.IsKeyword (JsonLdUtils.cs:43-51)."""
    return isinstance(v, str) and v in KEYWORDS


def is_absolute_iri(value: Any) -> bool:
    """Bug-compatible heuristic: contains ':' (JsonLdUtils.cs:209-213)."""
    return isinstance(value, str) and ":" in value


def is_relative_iri(value: Any) -> bool:
    """JsonLdUtils.IsRelativeIri (JsonLdUtils.cs:248-255)."""
    return not (is_keyword(value) or is_absolute_iri(value))


def is_string(v: Any) -> bool:
    return isinstance(v, str)


def is_object(v: Any) -> bool:
    return isinstance(v, dict)


def is_array(v: Any) -> bool:
    return isinstance(v, list)


def is_value(v: Any) -> bool:
    """Value object: dict with @value (JsonLdUtils.cs:1095-1099)."""
    return isinstance(v, dict) and "@value" in v


def is_list(v: Any) -> bool:
    """List object: dict with @list (JsonLdUtils.cs:1078-1082)."""
    return isinstance(v, dict) and "@list" in v


def is_node(v: Any) -> bool:
    """Node object (JsonLdUtils.cs:219-232)."""
    if isinstance(v, dict) and not ("@value" in v or "@set" in v or "@list" in v):
        return len(v) > 1 or "@id" not in v
    return False


def is_node_reference(v: Any) -> bool:
    """Object with only @id (JsonLdUtils.cs:238-245)."""
    return isinstance(v, dict) and len(v) == 1 and "@id" in v


def is_blank_node(v: Any) -> bool:
    """JsonLdUtils.IsBlankNode (JsonLdUtils.cs:856-875)."""
    if isinstance(v, dict):
        if "@id" in v:
            vid = v["@id"]
            return isinstance(vid, str) and vid.startswith("_:")
        return len(v) == 0 or not ("@value" in v or "@set" in v or "@list" in v)
    return False


def clone(value: Any) -> Any:
    return copy.deepcopy(value)


# ---------------------------------------------------------------------------
# Ordering
# ---------------------------------------------------------------------------

def utf16_key(s: str) -> bytes:
    """Sort key replicating C#/Java ordinal (UTF-16 code unit) string order.

    Python's default str ordering compares code points, which diverges from
    UTF-16 code-unit order for astral-plane characters mixed with U+E000..FFFF.
    The reference sorts keys ordinally everywhere (Util/JavaCompat.cs:174-201).
    """
    return s.encode("utf-16-be", "surrogatepass")


def sorted_ordinal(strings) -> list:
    lst = list(strings)
    # fast path: UTF-16 code-unit order equals code-point order unless an
    # astral-plane character is present; plain sort avoids the encode cost
    for s in lst:
        if s and max(s) >= "\U00010000":
            return sorted(lst, key=utf16_key)
    return sorted(lst)


def compare_ordinal(a: str, b: str) -> int:
    ka, kb = utf16_key(a), utf16_key(b)
    return -1 if ka < kb else (1 if ka > kb else 0)


def compare_shortest_least(a: str, b: str) -> int:
    """Length-then-ordinal term ordering (JsonLdUtils.cs:694-713)."""
    if len(a) < len(b):
        return -1
    if len(b) < len(a):
        return 1
    return compare_ordinal(a, b)


def shortest_least_key(s: str):
    return (len(s), utf16_key(s))


# ---------------------------------------------------------------------------
# Deep comparison / merge (value-set semantics)
# ---------------------------------------------------------------------------

def _scalar_token(v: Any) -> str:
    """Replicates JToken.ToString() for scalar comparison fallbacks
    (JsonLdUtils.cs:129-131, minus the harness-only http->https rewrite)."""
    if v is None:
        return ""
    if v is True:
        return "True"
    if v is False:
        return "False"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return str(v)


def deep_compare(v1: Any, v2: Any, list_order_matters: bool = False) -> bool:
    """Order-insensitive deep JSON equality (JsonLdUtils.cs:53-141)."""
    if v1 is None or v2 is None:
        return v1 is None and v2 is None
    if isinstance(v1, dict) and isinstance(v2, dict):
        if len(v1) != len(v2):
            return False
        for key, val in v1.items():
            if key not in v2 or not deep_compare(val, v2[key], list_order_matters):
                return False
        return True
    if isinstance(v1, list) and isinstance(v2, list):
        if len(v1) != len(v2):
            return False
        if list_order_matters:
            return all(deep_compare(a, b, True) for a, b in zip(v1, v2))
        matched = [False] * len(v2)
        for o1 in v1:
            got = False
            for j, o2 in enumerate(v2):
                if not matched[j] and deep_compare(o1, o2, False):
                    matched[j] = True
                    got = True
                    break
            if not got:
                return False
        return True
    if isinstance(v1, (dict, list)) or isinstance(v2, (dict, list)):
        return False
    return _scalar_token(v1) == _scalar_token(v2)


def deep_contains(values: list, value: Any) -> bool:
    return any(deep_compare(item, value, False) for item in values)


def merge_value(obj: dict | None, key: str, value: Any,
                skip_set_contains_check: bool = False) -> None:
    """Property-wise merge with set semantics (JsonLdUtils.cs:155-179)."""
    if obj is None:
        return
    values = obj.get(key)
    if values is None:
        values = []
        obj[key] = values
    if (
        skip_set_contains_check
        or key == "@list"
        or (isinstance(value, dict) and "@list" in value)
        or not deep_contains(values, value)
    ):
        values.append(value)


def compare_values(v1: Any, v2: Any) -> bool:
    """JSON-LD value equality (JsonLdUtils.cs:778-799)."""
    if deep_compare(v1, v2, True):
        return True
    if (
        is_value(v1)
        and is_value(v2)
        and v1.get("@value") == v2.get("@value")
        and v1.get("@type") == v2.get("@type")
        and v1.get("@language") == v2.get("@language")
        and v1.get("@index") == v2.get("@index")
    ):
        return True
    if (
        isinstance(v1, dict)
        and "@id" in v1
        and isinstance(v2, dict)
        and "@id" in v2
        and v1["@id"] == v2["@id"]
    ):
        return True
    return False


def expand_language_map(language_map: dict) -> list:
    """Language map -> value objects, keys in sorted order
    (JsonLdUtils.cs:423-455)."""
    from .errors import JsonLdError

    rval = []
    for key in sorted_ordinal(language_map.keys()):
        val = language_map[key]
        if not isinstance(val, list):
            val = [val]
        for item in val:
            if not isinstance(item, str):
                raise JsonLdError(JsonLdError.SYNTAX_ERROR)
            rval.append({"@value": item, "@language": key.lower()})
    return rval
