"""Core JSON-LD transform engine: expansion, compaction, node map, framing,
fromRDF, toRDF, normalize glue.

Parity reference: /root/reference/src/json-ld.net/Core/JsonLdApi.cs
(Compact :77-421, Expand :433-1048, GenerateNodeMap :1058-1312,
GenerateBlankNodeIdentifier :1314-1335, Frame :1390-1856, FromRDF :1974-2158,
ToRDF :2167-2187, Normalize :2197-2249).
"""

from __future__ import annotations

from typing import Any, Optional

from . import consts
from .context import Context
from .errors import JsonLdError
from .options import JsonLdOptions
from .utils import (
    clone,
    compare_values,
    deep_compare,
    is_blank_node,
    is_keyword,
    is_node,
    is_node_reference,
    is_relative_iri,
    merge_value,
    sorted_ordinal,
)


class JsonLdApi:
    def __init__(self, input_: Any = None, opts: Optional[JsonLdOptions] = None,
                 clone_input: bool = True, context_cache: Optional[dict] = None):
        self.opts = opts if opts is not None else JsonLdOptions("")
        self.value: Any = None
        self.context: Context = Context(self.opts)
        if isinstance(input_, (dict, list)):
            # the reference deep-clones its input (JsonLdApi.cs:50-65);
            # pipeline callers that own their trees pass clone_input=False
            self.value = clone(input_) if clone_input else input_
        self._blank_node_identifier_map: dict = {}
        self._blank_node_counter = 0
        self.node_map: Optional[dict] = None  # set by frame()
        # optional memo for in-tree @context parses: corpora with repeated
        # context shapes (e.g. templated tool payloads) re-parse the same
        # local context thousands of times; parsed Contexts are immutable
        # after parse, so sharing them is semantics-preserving
        self._context_cache = context_cache

    def _parse_elem_context(self, active_ctx: Context, local_ctx: Any) -> Context:
        if self._context_cache is None:
            return active_ctx.parse(local_ctx)
        import json as _json

        try:
            # keyed on the Context's stable serial (not id()): a GC'd parent
            # whose address is reused can never alias a stale child entry
            key = (active_ctx._serial, _json.dumps(local_ctx, sort_keys=True))
        except (TypeError, ValueError):
            return active_ctx.parse(local_ctx)
        cached = self._context_cache.get(key)
        if cached is None:
            cached = active_ctx.parse(local_ctx)
            self._context_cache[key] = cached
        return cached

    # ==================================================================
    # Expansion Algorithm (JsonLdApi.cs:433-1048)
    # ==================================================================
    def expand(self, active_ctx: Context, element: Any,
               active_property: Optional[str] = None) -> Any:
        # 1)
        if element is None:
            return None
        # 3) arrays
        if isinstance(element, list):
            result = []
            for item in element:
                # 3.2.1)
                v = self.expand(active_ctx, item, active_property)
                # 3.2.2)
                if (
                    active_property == "@list"
                    or active_ctx.get_container(active_property) == "@list"
                ) and (isinstance(v, list) or (isinstance(v, dict) and "@list" in v)):
                    raise JsonLdError(JsonLdError.LIST_OF_LISTS, "lists of lists are not permitted.")
                if v is not None:
                    if isinstance(v, list):
                        result.extend(v)
                    else:
                        result.append(v)
            return result
        # 4) objects
        if isinstance(element, dict):
            elem = element
            # 5)
            if "@context" in elem:
                active_ctx = self._parse_elem_context(active_ctx, elem["@context"])
            # 6)
            result: Optional[dict] = {}
            # 7)
            for key in sorted_ordinal(elem.keys()):
                value = elem[key]
                # 7.1)
                if key == "@context":
                    continue
                # 7.2)
                expanded_property = active_ctx.expand_iri(key, False, True, None, None)
                expanded_value: Any = None
                # 7.3)
                if expanded_property is None or (
                    ":" not in expanded_property and not is_keyword(expanded_property)
                ):
                    continue
                # 7.4)
                if is_keyword(expanded_property):
                    # 7.4.1)
                    if active_property == "@reverse":
                        raise JsonLdError(
                            JsonLdError.INVALID_REVERSE_PROPERTY_MAP,
                            "a keyword cannot be used as a @reverse propery",
                        )
                    # 7.4.2)
                    if expanded_property in result:
                        raise JsonLdError(
                            JsonLdError.COLLIDING_KEYWORDS,
                            expanded_property + " already exists in result",
                        )
                    # 7.4.3)
                    if expanded_property == "@id":
                        if not isinstance(value, str):
                            raise JsonLdError(
                                JsonLdError.INVALID_ID_VALUE, "value of @id must be a string"
                            )
                        expanded_value = active_ctx.expand_iri(value, True, False, None, None)
                    elif expanded_property == "@type":
                        # 7.4.4)
                        if isinstance(value, list):
                            expanded_value = []
                            for v in value:
                                if not isinstance(v, str):
                                    raise JsonLdError(
                                        JsonLdError.INVALID_TYPE_VALUE,
                                        "@type value must be a string or array of strings",
                                    )
                                expanded_value.append(
                                    active_ctx.expand_iri(v, True, True, None, None)
                                )
                        elif isinstance(value, str):
                            expanded_value = active_ctx.expand_iri(value, True, True, None, None)
                        elif isinstance(value, dict):
                            # TODO: SPEC: no mention of empty map check
                            if len(value) != 0:
                                raise JsonLdError(
                                    JsonLdError.INVALID_TYPE_VALUE,
                                    "@type value must be a an empty object for framing",
                                )
                            expanded_value = value
                        else:
                            raise JsonLdError(
                                JsonLdError.INVALID_TYPE_VALUE,
                                "@type value must be a string or array of strings",
                            )
                    elif expanded_property == "@graph":
                        # 7.4.5)
                        expanded_value = self.expand(active_ctx, value, "@graph")
                    elif expanded_property == "@value":
                        # 7.4.6)
                        if value is not None and isinstance(value, (dict, list)):
                            raise JsonLdError(
                                JsonLdError.INVALID_VALUE_OBJECT_VALUE,
                                "value of " + expanded_property + " must be a scalar or null",
                            )
                        expanded_value = value
                        if expanded_value is None:
                            result["@value"] = None
                            continue
                    elif expanded_property == "@language":
                        # 7.4.7)
                        if not isinstance(value, str):
                            raise JsonLdError(
                                JsonLdError.INVALID_LANGUAGE_TAGGED_STRING,
                                "Value of " + expanded_property + " must be a string",
                            )
                        expanded_value = value.lower()
                    elif expanded_property == "@index":
                        # 7.4.8)
                        if not isinstance(value, str):
                            raise JsonLdError(
                                JsonLdError.INVALID_INDEX_VALUE,
                                "Value of " + expanded_property + " must be a string",
                            )
                        expanded_value = value
                    elif expanded_property == "@list":
                        # 7.4.9.1)
                        if active_property is None or active_property == "@graph":
                            continue
                        # 7.4.9.2)
                        expanded_value = self.expand(active_ctx, value, active_property)
                        # NOTE: step not in the spec yet
                        if not isinstance(expanded_value, list):
                            expanded_value = [expanded_value]
                        # 7.4.9.3)
                        for o in expanded_value:
                            if isinstance(o, dict) and "@list" in o:
                                raise JsonLdError(
                                    JsonLdError.LIST_OF_LISTS,
                                    "A list may not contain another list",
                                )
                    elif expanded_property == "@set":
                        # 7.4.10)
                        expanded_value = self.expand(active_ctx, value, active_property)
                    elif expanded_property == "@reverse":
                        # 7.4.11)
                        if not isinstance(value, dict):
                            raise JsonLdError(
                                JsonLdError.INVALID_REVERSE_VALUE,
                                "@reverse value must be an object",
                            )
                        expanded_value = self.expand(active_ctx, value, "@reverse")
                        # 7.4.11.2)
                        if "@reverse" in expanded_value:
                            reverse = expanded_value["@reverse"]
                            for prop, item in reverse.items():
                                if prop not in result:
                                    result[prop] = []
                                if isinstance(item, list):
                                    result[prop].extend(item)
                                else:
                                    result[prop].append(item)
                        # 7.4.11.3)
                        if len(expanded_value) > (1 if "@reverse" in expanded_value else 0):
                            if "@reverse" not in result:
                                result["@reverse"] = {}
                            reverse_map = result["@reverse"]
                            for prop in expanded_value.keys():
                                if prop == "@reverse":
                                    continue
                                items = expanded_value[prop]
                                for item in items:
                                    if isinstance(item, dict) and (
                                        "@value" in item or "@list" in item
                                    ):
                                        raise JsonLdError(
                                            JsonLdError.INVALID_REVERSE_PROPERTY_VALUE
                                        )
                                    if prop not in reverse_map:
                                        reverse_map[prop] = []
                                    reverse_map[prop].append(item)
                        # 7.4.11.4)
                        continue
                    elif expanded_property in (
                        "@explicit", "@default", "@embed", "@embedChildren", "@omitDefault",
                    ):
                        # TODO: SPEC no mention of @explicit etc in spec (framing)
                        expanded_value = self.expand(active_ctx, value, expanded_property)
                    # 7.4.12)
                    if expanded_value is not None:
                        result[expanded_property] = expanded_value
                    # 7.4.13)
                    continue
                # 7.5) language map container
                if active_ctx.get_container(key) == "@language" and isinstance(value, dict):
                    expanded_value = []
                    for language, language_value in value.items():
                        if not isinstance(language_value, list):
                            language_value = [language_value]
                        for item in language_value:
                            if not isinstance(item, str):
                                raise JsonLdError(
                                    JsonLdError.INVALID_LANGUAGE_MAP_VALUE,
                                    "Expected " + str(item) + " to be a string",
                                )
                            expanded_value.append(
                                {"@value": item, "@language": language.lower()}
                            )
                # 7.6) index map container
                elif active_ctx.get_container(key) == "@index" and isinstance(value, dict):
                    expanded_value = []
                    for index in sorted_ordinal(value.keys()):
                        index_value = value[index]
                        if not isinstance(index_value, list):
                            index_value = [index_value]
                        index_value = self.expand(active_ctx, index_value, key)
                        for item in index_value:
                            if "@index" not in item:
                                item["@index"] = index
                            expanded_value.append(item)
                else:
                    # 7.7)
                    expanded_value = self.expand(active_ctx, value, key)
                # 7.8)
                if expanded_value is None:
                    continue
                # 7.9)
                if active_ctx.get_container(key) == "@list":
                    if not isinstance(expanded_value, dict) or "@list" not in expanded_value:
                        tmp = expanded_value
                        if not isinstance(tmp, list):
                            tmp = [expanded_value]
                        expanded_value = {"@list": tmp}
                # 7.10)
                if active_ctx.is_reverse_property(key):
                    if "@reverse" not in result:
                        result["@reverse"] = {}
                    reverse_map = result["@reverse"]
                    if not isinstance(expanded_value, list):
                        expanded_value = [expanded_value]
                    for item in expanded_value:
                        if isinstance(item, dict) and ("@value" in item or "@list" in item):
                            raise JsonLdError(JsonLdError.INVALID_REVERSE_PROPERTY_VALUE)
                        if expanded_property not in reverse_map:
                            reverse_map[expanded_property] = []
                        if isinstance(item, list):
                            reverse_map[expanded_property].extend(item)
                        else:
                            reverse_map[expanded_property].append(item)
                else:
                    # 7.11)
                    if expanded_property not in result:
                        result[expanded_property] = []
                    if isinstance(expanded_value, list):
                        result[expanded_property].extend(expanded_value)
                    else:
                        result[expanded_property].append(expanded_value)
            # 8)
            if "@value" in result:
                # 8.1)
                key_set = set(result.keys())
                key_set.discard("@value")
                key_set.discard("@index")
                langremoved = "@language" in key_set
                key_set.discard("@language")
                typeremoved = "@type" in key_set
                key_set.discard("@type")
                if (langremoved and typeremoved) or key_set:
                    raise JsonLdError(
                        JsonLdError.INVALID_VALUE_OBJECT, "value object has unknown keys"
                    )
                # 8.2)
                rval = result["@value"]
                if rval is None:
                    return None
                # 8.3)
                if not isinstance(rval, str) and "@language" in result:
                    raise JsonLdError(
                        JsonLdError.INVALID_LANGUAGE_TAGGED_VALUE,
                        "when @language is used, @value must be a string",
                    )
                # 8.4)
                if "@type" in result:
                    rt = result["@type"]
                    if not isinstance(rt, str) or rt.startswith("_:") or ":" not in rt:
                        raise JsonLdError(
                            JsonLdError.INVALID_TYPED_VALUE, "value of @type must be an IRI"
                        )
            elif "@type" in result:
                # 9)
                rtype = result["@type"]
                if not isinstance(rtype, list):
                    result["@type"] = [rtype]
            elif "@set" in result or "@list" in result:
                # 10.1)
                if len(result) > (2 if "@index" in result else 1):
                    raise JsonLdError(
                        JsonLdError.INVALID_SET_OR_LIST_OBJECT,
                        "@set or @list may only contain @index",
                    )
                # 10.2)
                if "@set" in result:
                    return result["@set"]
            # 11)
            if "@language" in result and len(result) == 1:
                result = None
            # 12)
            if active_property is None or active_property == "@graph":
                # 12.1)
                if result is not None and (
                    len(result) == 0 or "@value" in result or "@list" in result
                ):
                    result = None
                elif result is not None and "@id" in result and len(result) == 1:
                    # 12.2)
                    result = None
            # 13)
            return result
        # 2) scalars
        if active_property is None or active_property == "@graph":
            return None
        return active_ctx.expand_value(active_property, element)

    # ==================================================================
    # Compaction Algorithm (JsonLdApi.cs:77-421)
    # ==================================================================
    def compact(self, active_ctx: Context, active_property: Optional[str],
                element: Any, compact_arrays: bool = True) -> Any:
        # 2)
        if isinstance(element, list):
            result = []
            for item in element:
                compacted_item = self.compact(active_ctx, active_property, item, compact_arrays)
                if compacted_item is not None:
                    result.append(compacted_item)
            if (
                compact_arrays
                and len(result) == 1
                and active_ctx.get_container(active_property) is None
            ):
                return result[0]
            return result
        # 3)
        if isinstance(element, dict):
            elem = element
            # 4)
            if "@value" in elem or "@id" in elem:
                compacted_value = active_ctx.compact_value(active_property, elem)
                if not isinstance(compacted_value, (dict, list)):
                    return compacted_value
            # 5)
            inside_reverse = active_property == "@reverse"
            # 6)
            result: dict = {}
            # 7)
            for expanded_property in sorted_ordinal(elem.keys()):
                expanded_value = elem[expanded_property]
                # 7.1)
                if expanded_property in ("@id", "@type"):
                    if isinstance(expanded_value, str):
                        compacted_value = active_ctx.compact_iri(
                            expanded_value, relative_to_vocab=(expanded_property == "@type")
                        )
                    else:
                        # 7.1.2)
                        types = [
                            active_ctx.compact_iri(t, relative_to_vocab=True)
                            for t in expanded_value
                        ]
                        compacted_value = types[0] if len(types) == 1 else types
                    # 7.1.3)
                    alias = active_ctx.compact_iri(expanded_property, relative_to_vocab=True)
                    result[alias] = compacted_value
                    continue
                # 7.2)
                if expanded_property == "@reverse":
                    compacted_value = self.compact(
                        active_ctx, "@reverse", expanded_value, compact_arrays
                    )
                    for prop in list(compacted_value.keys()):
                        value = compacted_value[prop]
                        # 7.2.2.1)
                        if active_ctx.is_reverse_property(prop):
                            if (
                                active_ctx.get_container(prop) == "@set" or not compact_arrays
                            ) and not isinstance(value, list):
                                result[prop] = [value]
                            if prop not in result:
                                result[prop] = value
                            else:
                                if not isinstance(result[prop], list):
                                    result[prop] = [result[prop]]
                                if isinstance(value, list):
                                    result[prop].extend(value)
                                else:
                                    result[prop].append(value)
                            del compacted_value[prop]
                    # 7.2.3)
                    if compacted_value:
                        alias = active_ctx.compact_iri("@reverse", relative_to_vocab=True)
                        result[alias] = compacted_value
                    # 7.2.4)
                    continue
                # 7.3)
                if expanded_property == "@index" and active_ctx.get_container(
                    active_property
                ) == "@index":
                    continue
                # 7.4)
                if expanded_property in ("@index", "@value", "@language"):
                    alias = active_ctx.compact_iri(expanded_property, relative_to_vocab=True)
                    result[alias] = expanded_value
                    continue
                # 7.5) empty array
                if len(expanded_value) == 0:
                    item_active_property = active_ctx.compact_iri(
                        expanded_property, expanded_value, True, inside_reverse
                    )
                    if item_active_property not in result:
                        result[item_active_property] = []
                    else:
                        value = result[item_active_property]
                        if not isinstance(value, list):
                            result[item_active_property] = [value]
                # 7.6)
                for expanded_item in expanded_value:
                    # 7.6.1)
                    item_active_property = active_ctx.compact_iri(
                        expanded_property, expanded_item, True, inside_reverse
                    )
                    # 7.6.2)
                    container = active_ctx.get_container(item_active_property)
                    is_list_obj = isinstance(expanded_item, dict) and "@list" in expanded_item
                    lst = expanded_item.get("@list") if is_list_obj else None
                    # 7.6.3)
                    compacted_item = self.compact(
                        active_ctx,
                        item_active_property,
                        lst if is_list_obj else expanded_item,
                        compact_arrays,
                    )
                    # 7.6.4)
                    if is_list_obj:
                        if not isinstance(compacted_item, list):
                            compacted_item = [compacted_item]
                        if container != "@list":
                            # 7.6.4.2)
                            wrapper = {
                                active_ctx.compact_iri("@list", relative_to_vocab=True):
                                    compacted_item
                            }
                            compacted_item = wrapper
                            if "@index" in expanded_item:
                                compacted_item[
                                    active_ctx.compact_iri("@index", relative_to_vocab=True)
                                ] = expanded_item["@index"]
                        elif item_active_property in result:
                            # 7.6.4.3)
                            raise JsonLdError(
                                JsonLdError.COMPACTION_TO_LIST_OF_LISTS,
                                "There cannot be two list objects associated with an "
                                "active property that has a container mapping",
                            )
                    # 7.6.5)
                    if container in ("@language", "@index"):
                        if item_active_property in result:
                            map_object = result[item_active_property]
                        else:
                            map_object = {}
                            result[item_active_property] = map_object
                        if container == "@language" and (
                            isinstance(compacted_item, dict) and "@value" in compacted_item
                        ):
                            compacted_item = compacted_item["@value"]
                        map_key = expanded_item[container]
                        if map_key not in map_object:
                            map_object[map_key] = compacted_item
                        else:
                            if not isinstance(map_object[map_key], list):
                                map_object[map_key] = [map_object[map_key]]
                            map_object[map_key].append(compacted_item)
                    else:
                        # 7.6.6)
                        check = (
                            not compact_arrays
                            or container in ("@set", "@list")
                            or expanded_property in ("@list", "@graph")
                        ) and not isinstance(compacted_item, list)
                        if check:
                            compacted_item = [compacted_item]
                        if item_active_property not in result:
                            result[item_active_property] = compacted_item
                        else:
                            if not isinstance(result[item_active_property], list):
                                result[item_active_property] = [result[item_active_property]]
                            if isinstance(compacted_item, list):
                                result[item_active_property].extend(compacted_item)
                            else:
                                result[item_active_property].append(compacted_item)
            # 8)
            return result
        # 2) scalar
        return element

    # ==================================================================
    # Node Map Generation (JsonLdApi.cs:1058-1312)
    # ==================================================================
    def generate_node_map(self, element: Any, node_map: dict,
                          active_graph: str = "@default",
                          active_subject: Any = None,
                          active_property: Optional[str] = None,
                          list_: Optional[dict] = None,
                          skip_set_contains_check: bool = False) -> None:
        # 1)
        if isinstance(element, list):
            seen_ids = set() if list_ is None else None
            for item in element:
                skip = False
                if seen_ids is not None and isinstance(item, dict):
                    iid = item.get("@id")
                    if isinstance(iid, str) and iid not in seen_ids:
                        seen_ids.add(iid)
                        skip = True
                self.generate_node_map(
                    item, node_map, active_graph, active_subject, active_property,
                    list_, skip,
                )
            return
        if not isinstance(element, dict):
            # invalid expanded shape (e.g. @language beside @id without
            # @value): the reference throws an InvalidCastException here
            # (JsonLdApi.cs:1105); we raise the typed error instead so the
            # pipeline's quarantine can catch it
            raise JsonLdError(
                JsonLdError.INVALID_INPUT,
                "node map generation encountered a non-object element",
            )
        elem = element
        # 2)
        if active_graph not in node_map:
            node_map[active_graph] = {}
        graph = node_map[active_graph]
        node = (
            graph.get(active_subject)
            if isinstance(active_subject, str)
            else None
        )
        # 3)
        if "@type" in elem:
            old_types = elem["@type"] if isinstance(elem["@type"], list) else [elem["@type"]]
            # non-string @type entries (the framing wildcard {}) pass through
            # unrelabeled instead of crashing (the reference would throw an
            # InvalidCastException here; we surface a typed error downstream)
            new_types = [
                self.generate_blank_node_identifier(t)
                if isinstance(t, str) and t.startswith("_:") else t
                for t in old_types
            ]
            if isinstance(elem["@type"], list):
                elem["@type"] = new_types
            else:
                elem["@type"] = new_types[0]
        # 4)
        if "@value" in elem:
            if list_ is None:
                merge_value(node, active_property, elem)
            else:
                merge_value(list_, "@list", elem)
        elif "@list" in elem:
            # 5)
            result = {"@list": []}
            self.generate_node_map(
                elem["@list"], node_map, active_graph, active_subject,
                active_property, result,
            )
            merge_value(node, active_property, result)
        else:
            # 6)
            id_ = elem.pop("@id", None)
            if id_ is not None:
                if id_.startswith("_:"):
                    id_ = self.generate_blank_node_identifier(id_)
            else:
                # 6.2)
                id_ = self.generate_blank_node_identifier(None)
            # 6.3)
            if id_ not in graph:
                graph[id_] = {"@id": id_}
            # 6.5)
            if isinstance(active_subject, dict):
                merge_value(graph[id_], active_property, active_subject)
            elif active_property is not None:
                # 6.6)
                reference = {"@id": id_}
                if list_ is None:
                    merge_value(node, active_property, reference, skip_set_contains_check)
                else:
                    merge_value(list_, "@list", reference)
            node = graph[id_]
            # 6.7)
            if "@type" in elem:
                for type_ in elem.pop("@type"):
                    merge_value(node, "@type", type_)
            # 6.8)
            if "@index" in elem:
                elem_index = elem.pop("@index")
                if "@index" in node:
                    if not deep_compare(node["@index"], elem_index):
                        raise JsonLdError(JsonLdError.CONFLICTING_INDEXES)
                else:
                    node["@index"] = elem_index
            # 6.9)
            if "@reverse" in elem:
                referenced_node = {"@id": id_}
                reverse_map = elem.pop("@reverse")
                for prop, values in reverse_map.items():
                    for value in values:
                        self.generate_node_map(
                            value, node_map, active_graph, referenced_node, prop, None
                        )
            # 6.10)
            if "@graph" in elem:
                self.generate_node_map(elem.pop("@graph"), node_map, id_, None, None, None)
            # 6.11)
            for property_1 in sorted_ordinal(elem.keys()):
                value = elem[property_1]
                if property_1.startswith("_:"):
                    property_1 = self.generate_blank_node_identifier(property_1)
                if property_1 not in node:
                    node[property_1] = []
                self.generate_node_map(value, node_map, active_graph, id_, property_1, None)

    def generate_blank_node_identifier(self, id_: Optional[str] = None) -> str:
        """Stable relabel map + counter (JsonLdApi.cs:1314-1335)."""
        if id_ is not None and id_ in self._blank_node_identifier_map:
            return self._blank_node_identifier_map[id_]
        bnid = "_:b" + str(self._blank_node_counter)
        self._blank_node_counter += 1
        if id_ is not None:
            self._blank_node_identifier_map[id_] = bnid
        return bnid

    # ==================================================================
    # Framing (JsonLdApi.cs:1390-1871)
    # ==================================================================
    def frame(self, input_: Any, frame: list) -> list:
        state = _FramingContext()
        if self.opts.embed is not None:
            state.embed = self.opts.embed
        if self.opts.explicit is not None:
            state.explicit = self.opts.explicit
        if self.opts.omit_default is not None:
            state.omit_default = self.opts.omit_default
        nodes: dict = {}
        self.generate_node_map(input_, nodes)
        self.node_map = nodes.get("@default", {})
        framed: list = []
        self._frame(
            state,
            self.node_map,
            frame[0] if (frame is not None and len(frame) > 0) else {},
            framed,
            None,
        )
        return framed

    def _frame(self, state: "_FramingContext", nodes: dict, frame: dict,
               parent: Any, prop: Optional[str]) -> None:
        matches = self._filter_nodes(state, nodes, frame)
        embed_on = self._get_frame_flag(frame, "@embed", state.embed)
        explicit_on = self._get_frame_flag(frame, "@explicit", state.explicit)
        for id_ in sorted_ordinal(matches.keys()):
            if prop is None:
                state.embeds = {}
            # start output
            output: dict = {"@id": id_}
            embedded_node = _EmbedNode(parent, prop)
            this_embed_on = embed_on
            if this_embed_on and id_ in state.embeds:
                existing = state.embeds[id_]
                this_embed_on = False
                if isinstance(existing.parent, list):
                    for p in existing.parent:
                        if compare_values(output, p):
                            this_embed_on = True
                            break
                else:
                    if isinstance(existing.parent, dict) and existing.prop in existing.parent:
                        for v in existing.parent[existing.prop]:
                            if isinstance(v, dict) and v.get("@id") == id_:
                                this_embed_on = True
                                break
                if this_embed_on:
                    self._remove_embed(state, id_)
            if not this_embed_on:
                self._add_frame_output(parent, prop, output)
            else:
                state.embeds[id_] = embedded_node
                element = matches[id_]
                for prop_key in sorted_ordinal(element.keys()):
                    if is_keyword(prop_key):
                        output[prop_key] = clone(element[prop_key])
                        continue
                    if prop_key not in frame:
                        if not explicit_on:
                            self._embed_values(state, element, prop_key, output)
                        continue
                    value = element[prop_key]
                    for item in value:
                        if isinstance(item, dict) and "@list" in item:
                            list_obj = {"@list": []}
                            self._add_frame_output(output, prop_key, list_obj)
                            for listitem in item["@list"]:
                                if is_node_reference(listitem):
                                    itemid = listitem["@id"]
                                    tmp = {itemid: self.node_map.get(itemid)}
                                    self._frame(
                                        state, tmp, frame[prop_key][0], list_obj, "@list"
                                    )
                                else:
                                    self._add_frame_output(list_obj, "@list", listitem)
                        elif is_node_reference(item):
                            itemid = item["@id"]
                            tmp = {itemid: self.node_map.get(itemid)}
                            self._frame(state, tmp, frame[prop_key][0], output, prop_key)
                        else:
                            self._add_frame_output(output, prop_key, item)
                # defaults
                for prop_1 in sorted_ordinal(frame.keys()):
                    if is_keyword(prop_1):
                        continue
                    pf = frame[prop_1]
                    property_frame = pf[0] if len(pf) > 0 else None
                    if property_frame is None:
                        property_frame = {}
                    omit_default_on = self._get_frame_flag(
                        property_frame, "@omitDefault", state.omit_default
                    )
                    if not omit_default_on and prop_1 not in output:
                        def_: Any = "@null"
                        if "@default" in property_frame:
                            def_ = clone(property_frame["@default"])
                        if not isinstance(def_, list):
                            def_ = [def_]
                        output[prop_1] = [{"@preserve": def_}]
                self._add_frame_output(parent, prop, output)

    @staticmethod
    def _get_frame_flag(frame: dict, name: str, default: bool) -> bool:
        value = frame.get(name)
        if isinstance(value, list):
            if len(value) > 0:
                value = value[0]
        if isinstance(value, dict) and "@value" in value:
            value = value["@value"]
        if isinstance(value, bool):
            return value
        return default

    @staticmethod
    def _remove_embed(state: "_FramingContext", id_: str) -> None:
        embeds = state.embeds
        embed = embeds[id_]
        parent = embed.parent
        prop = embed.prop
        node = {"@id": id_}
        if is_node(parent):
            newvals = []
            for v in parent[prop]:
                if isinstance(v, dict) and v.get("@id") == id_:
                    newvals.append(node)
                else:
                    newvals.append(v)
            parent[prop] = newvals
        JsonLdApi._remove_dependents(embeds, id_)

    @staticmethod
    def _remove_dependents(embeds: dict, id_: str) -> None:
        for id_dep in list(embeds.keys()):
            e = embeds.get(id_dep)
            if e is None:
                continue
            p = e.parent if e.parent is not None else {}
            if not isinstance(p, dict):
                continue
            pid = p.get("@id")
            if id_ == pid:
                embeds.pop(id_dep, None)
                JsonLdApi._remove_dependents(embeds, id_dep)

    def _filter_nodes(self, state: "_FramingContext", nodes: dict, frame: dict) -> dict:
        rval = {}
        for id_, element in nodes.items():
            if element is not None and self._filter_node(state, element, frame):
                rval[id_] = element
        return rval

    def _filter_node(self, state: "_FramingContext", node: dict, frame: dict) -> bool:
        types = frame.get("@type")
        if types is not None:
            if not isinstance(types, list):
                raise JsonLdError(JsonLdError.SYNTAX_ERROR, "frame @type must be an array")
            node_types = node.get("@type")
            if node_types is None:
                node_types = []
            elif not isinstance(node_types, list):
                raise JsonLdError(JsonLdError.SYNTAX_ERROR, "node @type must be an array")
            if len(types) == 1 and isinstance(types[0], dict) and len(types[0]) == 0:
                return len(node_types) > 0
            for i in node_types:
                for j in types:
                    if deep_compare(i, j):
                        return True
            return False
        for key in frame.keys():
            if key == "@id" or (not is_keyword(key) and key not in node):
                return False
        return True

    @staticmethod
    def _add_frame_output(parent: Any, prop: Optional[str], output: Any) -> None:
        if isinstance(parent, dict):
            if prop not in parent or parent[prop] is None:
                parent[prop] = []
            parent[prop].append(output)
        else:
            parent.append(output)

    def _embed_values(self, state: "_FramingContext", element: dict,
                      prop: str, output: Any) -> None:
        for o in element[prop]:
            each = o
            if isinstance(each, dict) and "@list" in each:
                list_obj = {"@list": []}
                if isinstance(output, list):
                    output.append(list_obj)
                else:
                    output[prop] = [list_obj]
                self._embed_values(state, each, "@list", list_obj["@list"])
            elif is_node_reference(each):
                sid = each["@id"]
                if sid not in state.embeds:
                    embed = _EmbedNode(output, prop)
                    state.embeds[sid] = embed
                    each = {}
                    s = self.node_map.get(sid)
                    if s is None:
                        s = {"@id": sid}
                    for sprop in s.keys():
                        if is_keyword(sprop):
                            each[sprop] = clone(s[sprop])
                            continue
                        self._embed_values(state, s, sprop, each)
                self._add_frame_output(output, prop, each)
            else:
                self._add_frame_output(output, prop, clone(each))

    # ==================================================================
    # FromRDF (JsonLdApi.cs:1974-2158)
    # ==================================================================
    def from_rdf(self, dataset: "RDFDataset") -> list:
        from .rdf import RDFDataset  # noqa: F401 (typing only)

        default_graph: dict = {}
        graph_map: dict = {"@default": default_graph}
        usages: dict = {}  # (graph, nodeid) -> list of usage dicts

        def node_usages(graph_name: str, node_id: str) -> list:
            return usages.setdefault((graph_name, node_id), [])

        for name in dataset.graph_names():
            graph = dataset.get_quads(name)
            node_map = graph_map.setdefault(name, {})
            if name != "@default" and name not in default_graph:
                default_graph[name] = {"@id": name}
            for triple in graph:
                subject = triple["subject"]["value"]
                predicate = triple["predicate"]["value"]
                obj = triple["object"]
                # 3.5.1+3.5.2)
                if subject not in node_map:
                    node_map[subject] = {"@id": subject}
                node = node_map[subject]
                obj_is_id = obj["type"] in ("IRI", "blank node")
                if obj_is_id and obj["value"] not in node_map:
                    node_map[obj["value"]] = {"@id": obj["value"]}
                # 3.5.4)
                if predicate == consts.RDF_TYPE and obj_is_id and not self.opts.use_rdf_type:
                    merge_value(node, "@type", obj["value"])
                    continue
                # 3.5.5)
                value = _node_to_object(obj, self.opts.use_native_types)
                # 3.5.6+7)
                merge_value(node, predicate, value)
                # 3.5.8)
                if obj_is_id:
                    node_usages(name, obj["value"]).append(
                        {"node": node, "property": predicate, "value": value}
                    )
        # 4) list reconstruction
        for name_1, graph in graph_map.items():
            if consts.RDF_NIL not in graph:
                continue
            nil_usages = node_usages(name_1, consts.RDF_NIL)
            for usage in nil_usages:
                node = usage["node"]
                prop = usage["property"]
                head = usage["value"]
                list_: list = []
                list_nodes: list = []
                while prop == consts.RDF_REST and _is_well_formed_list_node(
                    node, node_usages(name_1, node["@id"])
                ):
                    list_.append(node[consts.RDF_FIRST][0])
                    list_nodes.append(node["@id"])
                    node_usage = node_usages(name_1, node["@id"])[0]
                    node = node_usage["node"]
                    prop = node_usage["property"]
                    head = node_usage["value"]
                    if not is_blank_node(node):
                        break
                # 4.3.4)
                if prop == consts.RDF_FIRST:
                    if node.get("@id") == consts.RDF_NIL:
                        continue
                    head_id = head["@id"]
                    head = graph[head_id][consts.RDF_REST][0]
                    list_.pop()
                    list_nodes.pop()
                # 4.3.5)
                head.pop("@id", None)
                list_.reverse()
                head["@list"] = list_
                for node_id in list_nodes:
                    graph.pop(node_id, None)
        # 5/6)
        result: list = []
        ids = list(default_graph.keys())
        if self.opts.sort_graphs_from_rdf:
            ids = sorted_ordinal(ids)
        for subject_1 in ids:
            node = default_graph[subject_1]
            if subject_1 in graph_map:
                node["@graph"] = []
                keys = list(graph_map[subject_1].keys())
                if self.opts.sort_graph_nodes_from_rdf:
                    keys = sorted_ordinal(keys)
                for s in keys:
                    n = graph_map[subject_1][s]
                    if len(n) == 1 and "@id" in n:
                        continue
                    node["@graph"].append(n)
            if len(node) == 1 and "@id" in node:
                continue
            result.append(node)
        return result

    # ==================================================================
    # ToRDF (JsonLdApi.cs:2167-2187)
    # ==================================================================
    def to_rdf(self) -> "RDFDataset":
        from .rdf import RDFDataset

        node_map: dict = {"@default": {}}
        self.generate_node_map(self.value, node_map)
        dataset = RDFDataset(self)
        for graph_name in node_map.keys():
            # 4.1)
            if is_relative_iri(graph_name):
                continue
            dataset.graph_to_rdf(graph_name, node_map[graph_name])
        return dataset

    # ==================================================================
    # Normalize (JsonLdApi.cs:2197-2249)
    # ==================================================================
    def normalize(self, dataset: "RDFDataset"):
        from .normalize import NormalizeUtils, UniqueNamer

        quads, bnodes = self._collect_normalize_state(dataset)
        normalize_utils = NormalizeUtils(quads, bnodes, UniqueNamer("_:c14n"), self.opts)
        return normalize_utils.hash_blank_nodes(list(bnodes.keys()))

    def canonicalize_quads(self, dataset: "RDFDataset") -> list:
        """Columnar fast path: canonical (c14n) naming, quads out — no text
        serialization round trip. Engine-only addition; same naming as
        normalize()."""
        from .normalize import NormalizeUtils, UniqueNamer

        quads, bnodes = self._collect_normalize_state(dataset)
        normalize_utils = NormalizeUtils(quads, bnodes, UniqueNamer("_:c14n"), self.opts)
        return normalize_utils.canonical_quads(list(bnodes.keys()))

    def _collect_normalize_state(self, dataset: "RDFDataset"):
        quads: list = []
        bnodes: dict = {}
        for graph_name in list(dataset.keys()):
            triples = dataset[graph_name]
            each_graph_name = None if graph_name == "@default" else graph_name
            for quad in triples:
                if each_graph_name is not None:
                    if each_graph_name.startswith("_:"):
                        quad["name"] = {"type": "blank node", "value": each_graph_name}
                    else:
                        quad["name"] = {"type": "IRI", "value": each_graph_name}
                quads.append(quad)
                for attr in ("subject", "object", "name"):
                    if attr in quad and quad[attr].get("type") == "blank node":
                        id_ = quad[attr]["value"]
                        bnodes.setdefault(id_, {"quads": []})["quads"].append(quad)
        return quads, bnodes


class _FramingContext:
    def __init__(self):
        self.embed = True
        self.explicit = False
        self.omit_default = False
        self.embeds: Optional[dict] = None


class _EmbedNode:
    def __init__(self, parent=None, prop=None):
        self.parent = parent
        self.prop = prop


def _is_well_formed_list_node(node: dict, usages: list) -> bool:
    """NodeMapNode.IsWellFormedListNode (JsonLdApi.cs:1906-1943)."""
    if len(usages) != 1:
        return False
    keys = 0
    if consts.RDF_FIRST in node:
        keys += 1
        if not (isinstance(node[consts.RDF_FIRST], list) and len(node[consts.RDF_FIRST]) == 1):
            return False
    if consts.RDF_REST in node:
        keys += 1
        if not (isinstance(node[consts.RDF_REST], list) and len(node[consts.RDF_REST]) == 1):
            return False
    if "@type" in node:
        keys += 1
        if not (isinstance(node["@type"], list) and len(node["@type"]) == 1) and (
            consts.RDF_LIST == node["@type"][0]
        ):
            return False
    if "@id" in node:
        keys += 1
    if keys < len(node):
        return False
    return True


def _node_to_object(node: dict, use_native_types: bool) -> dict:
    """RDF node -> JSON-LD object (RDFDataset.Node.ToObject, RDFDataset.cs:172-275)."""
    import re

    if node["type"] in ("IRI", "blank node"):
        return {"@id": node["value"]}
    rval: dict = {"@value": node["value"]}
    language = node.get("language")
    if language is not None:
        rval["@language"] = language
    else:
        type_ = node.get("datatype")
        value = node["value"]
        if use_native_types:
            if type_ == consts.XSD_STRING:
                pass
            elif type_ == consts.XSD_BOOLEAN:
                if value == "true":
                    rval["@value"] = True
                elif value == "false":
                    rval["@value"] = False
            elif re.match(r"^[+-]?[0-9]+((?:\.?[0-9]+((?:E?[+-]?[0-9]+)|)|))$", value):
                try:
                    d = float(value)
                    if d == d and d not in (float("inf"), float("-inf")):
                        if type_ == consts.XSD_INTEGER:
                            i = int(d)
                            if str(i) == value:
                                rval["@value"] = i
                        elif type_ == consts.XSD_DOUBLE:
                            rval["@value"] = d
                        else:
                            rval["@type"] = type_
                except ValueError:
                    raise
            else:
                rval["@type"] = type_
        else:
            if type_ != consts.XSD_STRING:
                rval["@type"] = type_
    return rval
