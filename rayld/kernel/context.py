"""Active context: parsing, term definitions, IRI expansion/compaction.

Parity reference: /root/reference/src/json-ld.net/Core/Context.cs
(Parse :137-321, CreateTermDefinition :333-532, ExpandIri :546-621,
CompactIri :643-930, GetInverse :952-1085, SelectTerm :1104-1138,
ExpandValue :1218-1269, CompactValue :68-126, Serialize :1278-1335).

A ``Context`` is a small mutable map (``@base``/``@vocab``/``@language``)
plus ``term_definitions``; in the Ray engine one parsed Context is built
once per actor and shared across batches (SURVEY.md C1-C10).
"""

from __future__ import annotations

import copy
import itertools
from typing import Any, Optional

from .errors import JsonLdError
from . import url as URL
from .utils import (
    compare_shortest_least,
    is_absolute_iri,
    is_keyword,
    is_relative_iri,
    is_value,
    shortest_least_key,
)

_MISSING = object()


class Context:
    # monotonically assigned identity token: memo keys use this instead of
    # id() so an address-reused Context can never alias a stale cache entry
    _serial_counter = itertools.count(1)

    def __init__(self, options=None, map_: Optional[dict] = None):
        from .options import JsonLdOptions

        self._serial = next(Context._serial_counter)
        self.options = options if options is not None else JsonLdOptions()
        self.map: dict = dict(map_) if map_ else {}
        self.term_definitions: dict = {}
        self.inverse: Optional[dict] = None
        if self.options.base is not None:
            self.map["@base"] = self.options.base

    # -- plain-map helpers (the reference Context extends JObject) ----------
    def get(self, key, default=None):
        return self.map.get(key, default)

    def __contains__(self, key):
        return key in self.map

    def clone(self) -> "Context":
        rval = Context(self.options)
        rval.map = copy.deepcopy(self.map)
        rval.term_definitions = copy.deepcopy(self.term_definitions)
        return rval

    # ------------------------------------------------------------------
    # Context Processing Algorithm (Context.cs:137-321)
    # ------------------------------------------------------------------
    def parse(self, local_context: Any, remote_contexts: Optional[list] = None) -> "Context":
        if remote_contexts is None:
            remote_contexts = []
        result = self.clone()
        if not isinstance(local_context, list):
            local_context = [local_context]
        for context in local_context:
            # 3.1
            if context is None:
                result = Context(self.options)
                continue
            if isinstance(context, Context):
                result = context.clone()
                continue
            if isinstance(context, str):
                # 3.2 remote context
                uri = URL.resolve(result.map.get("@base"), context)
                if uri in remote_contexts:
                    raise JsonLdError(JsonLdError.RECURSIVE_CONTEXT_INCLUSION, uri)
                remote_contexts.append(uri)
                try:
                    rd = self.options.document_loader.load_document(uri)
                except JsonLdError as err:
                    if str(err).startswith(JsonLdError.LOADING_DOCUMENT_FAILED):
                        raise JsonLdError(JsonLdError.LOADING_REMOTE_CONTEXT_FAILED)
                    raise
                remote_context = rd.document
                if not isinstance(remote_context, dict) or "@context" not in remote_context:
                    raise JsonLdError(JsonLdError.INVALID_REMOTE_CONTEXT, context)
                result = result.parse(remote_context["@context"], remote_contexts)
                continue
            if not isinstance(context, dict):
                # 3.3
                raise JsonLdError(JsonLdError.INVALID_LOCAL_CONTEXT, context)
            # 3.4
            if not remote_contexts and "@base" in context:
                value = context["@base"]
                if value is None:
                    result.map.pop("@base", None)
                elif isinstance(value, str):
                    if is_absolute_iri(value):
                        result.map["@base"] = value
                    else:
                        base_uri = result.map.get("@base")
                        if not is_absolute_iri(base_uri):
                            raise JsonLdError(JsonLdError.INVALID_BASE_IRI, base_uri)
                        result.map["@base"] = URL.resolve(base_uri, value)
                else:
                    raise JsonLdError(JsonLdError.INVALID_BASE_IRI, "@base must be a string")
            # 3.5
            if "@vocab" in context:
                value = context["@vocab"]
                if value is None:
                    result.map.pop("@vocab", None)
                elif isinstance(value, str):
                    if is_absolute_iri(value):
                        result.map["@vocab"] = value
                    else:
                        raise JsonLdError(
                            JsonLdError.INVALID_VOCAB_MAPPING,
                            "@value must be an absolute IRI",
                        )
                else:
                    raise JsonLdError(
                        JsonLdError.INVALID_VOCAB_MAPPING,
                        "@vocab must be a string or null",
                    )
            # 3.6
            if "@language" in context:
                value = context["@language"]
                if value is None:
                    result.map.pop("@language", None)
                elif isinstance(value, str):
                    result.map["@language"] = value.lower()
                else:
                    raise JsonLdError(JsonLdError.INVALID_DEFAULT_LANGUAGE, value)
            # 3.7
            defined: dict = {}
            for key in context.keys():
                if key in ("@base", "@vocab", "@language"):
                    continue
                result.create_term_definition(context, key, defined)
        return result

    # ------------------------------------------------------------------
    # Create Term Definition (Context.cs:333-532)
    # ------------------------------------------------------------------
    def create_term_definition(self, context: dict, term: str, defined: dict) -> None:
        if term in defined:
            if defined[term]:
                return
            raise JsonLdError(JsonLdError.CYCLIC_IRI_MAPPING, term)
        defined[term] = False
        if is_keyword(term):
            raise JsonLdError(JsonLdError.KEYWORD_REDEFINITION, term)
        self.term_definitions.pop(term, None)
        value = context[term]
        if value is None or (
            isinstance(value, dict) and "@id" in value and value["@id"] is None
        ):
            self.term_definitions[term] = None
            defined[term] = True
            return
        if isinstance(value, str):
            value = {"@id": value}
        if not isinstance(value, dict):
            raise JsonLdError(JsonLdError.INVALID_TERM_DEFINITION, value)
        val = value
        # 9)
        definition: dict = {}
        # 10)
        if "@type" in val:
            if not isinstance(val["@type"], str):
                raise JsonLdError(JsonLdError.INVALID_TYPE_MAPPING, val["@type"])
            type_ = val["@type"]
            try:
                type_ = self.expand_iri(val["@type"], False, True, context, defined)
            except JsonLdError as error:
                if error.code != JsonLdError.INVALID_IRI_MAPPING:
                    raise
                raise JsonLdError(JsonLdError.INVALID_TYPE_MAPPING, type_)
            if type_ == "@id" or type_ == "@vocab" or (
                not type_.startswith("_:") and is_absolute_iri(type_)
            ):
                definition["@type"] = type_
            else:
                raise JsonLdError(JsonLdError.INVALID_TYPE_MAPPING, type_)
        # 11)
        if "@reverse" in val:
            if "@id" in val:
                raise JsonLdError(JsonLdError.INVALID_REVERSE_PROPERTY, val)
            if not isinstance(val["@reverse"], str):
                raise JsonLdError(
                    JsonLdError.INVALID_IRI_MAPPING,
                    "Expected String for @reverse value. got "
                    + ("null" if val["@reverse"] is None else type(val["@reverse"]).__name__),
                )
            reverse = self.expand_iri(val["@reverse"], False, True, context, defined)
            if not is_absolute_iri(reverse):
                raise JsonLdError(
                    JsonLdError.INVALID_IRI_MAPPING,
                    "Non-absolute @reverse IRI: " + reverse,
                )
            definition["@id"] = reverse
            if "@container" in val:
                container = val["@container"]
                if container is None or container == "@set" or container == "@index":
                    definition["@container"] = container
                else:
                    raise JsonLdError(
                        JsonLdError.INVALID_REVERSE_PROPERTY,
                        "reverse properties only support set- and index-containers",
                    )
            definition["@reverse"] = True
            self.term_definitions[term] = definition
            defined[term] = True
            return
        # 12)
        definition["@reverse"] = False
        # 13)
        if val.get("@id") is not None and val.get("@id") != term:
            if not isinstance(val["@id"], str):
                raise JsonLdError(
                    JsonLdError.INVALID_IRI_MAPPING,
                    "expected value of @id to be a string",
                )
            res = self.expand_iri(val["@id"], False, True, context, defined)
            if is_keyword(res) or is_absolute_iri(res):
                if res == "@context":
                    raise JsonLdError(JsonLdError.INVALID_KEYWORD_ALIAS, "cannot alias @context")
                definition["@id"] = res
            else:
                raise JsonLdError(
                    JsonLdError.INVALID_IRI_MAPPING,
                    "resulting IRI mapping should be a keyword, absolute IRI or blank node",
                )
        elif ":" in term:
            # 14)
            col_index = term.index(":")
            prefix = term[:col_index]
            suffix = term[col_index + 1:]
            if prefix in context:
                self.create_term_definition(context, prefix, defined)
            if prefix in self.term_definitions:
                definition["@id"] = self.term_definitions[prefix]["@id"] + suffix
            else:
                definition["@id"] = term
        else:
            # 15)
            if "@vocab" in self.map:
                definition["@id"] = self.map["@vocab"] + term
            else:
                raise JsonLdError(
                    JsonLdError.INVALID_IRI_MAPPING,
                    "relative term definition without vocab mapping",
                )
        # 16)
        if "@container" in val:
            container = val["@container"]
            if container not in ("@list", "@set", "@index", "@language"):
                raise JsonLdError(
                    JsonLdError.INVALID_CONTAINER_MAPPING,
                    "@container must be either @list, @set, @index, or @language",
                )
            definition["@container"] = container
        # 17)
        if "@language" in val and "@type" not in val:
            language = val["@language"]
            if language is None or isinstance(language, str):
                definition["@language"] = language.lower() if language is not None else None
            else:
                raise JsonLdError(
                    JsonLdError.INVALID_LANGUAGE_MAPPING,
                    "@language must be a string or null",
                )
        # 18)
        self.term_definitions[term] = definition
        defined[term] = True

    # ------------------------------------------------------------------
    # IRI Expansion (Context.cs:546-621)
    # ------------------------------------------------------------------
    def expand_iri(self, value: Optional[str], relative: bool, vocab: bool,
                   context: Optional[dict], defined: Optional[dict]) -> Optional[str]:
        # 1)
        if value is None or is_keyword(value):
            return value
        # 2)
        if (
            context is not None
            and value in context
            and defined is not None
            and value in defined
            and not defined[value]
        ):
            self.create_term_definition(context, value, defined)
        # 3)
        if vocab and value in self.term_definitions:
            td = self.term_definitions[value]
            if td is not None:
                return td.get("@id")
            return None
        # 4)
        col_index = value.find(":")
        if col_index >= 0:
            prefix = value[:col_index]
            suffix = value[col_index + 1:]
            # 4.2)
            if prefix == "_" or suffix.startswith("//"):
                return value
            # 4.3)
            if context is not None and prefix in context and (
                defined is None or not defined.get(prefix, False)
            ):
                self.create_term_definition(context, prefix, defined)
            # 4.4)
            if prefix in self.term_definitions:
                td = self.term_definitions[prefix]
                if td is not None:
                    return td["@id"] + suffix
                # reference would raise a null-deref here; fall through instead
                return value
            # 4.5)
            return value
        # 5)
        if vocab and "@vocab" in self.map:
            return self.map["@vocab"] + value
        if relative:
            # 6)
            return URL.resolve(self.map.get("@base"), value)
        if context is not None and is_relative_iri(value):
            raise JsonLdError(JsonLdError.INVALID_IRI_MAPPING, "not an absolute IRI: " + value)
        # 7)
        return value

    # ------------------------------------------------------------------
    # Value Expansion (Context.cs:1218-1269)
    # ------------------------------------------------------------------
    def expand_value(self, active_property: Optional[str], value: Any) -> dict:
        rval: dict = {}
        td = self.get_term_definition(active_property)
        # 1)
        if td is not None and td.get("@type") == "@id":
            rval["@id"] = self.expand_iri(value, True, False, None, None)
            return rval
        # 2)
        if td is not None and td.get("@type") == "@vocab":
            rval["@id"] = self.expand_iri(value, True, True, None, None)
            return rval
        # 3)
        rval["@value"] = value
        # 4)
        if td is not None and "@type" in td:
            rval["@type"] = td["@type"]
        elif isinstance(value, str):
            # 5.1)
            if td is not None and "@language" in td:
                lang = td["@language"]
                if lang is not None:
                    rval["@language"] = lang
            # 5.2)
            elif self.map.get("@language") is not None:
                rval["@language"] = self.map["@language"]
        return rval

    # ------------------------------------------------------------------
    # Value Compaction (Context.cs:68-126)
    # ------------------------------------------------------------------
    def compact_value(self, active_property: Optional[str], value: dict) -> Any:
        # 1)
        number_members = len(value)
        # 2)
        if "@index" in value and self.get_container(active_property) == "@index":
            number_members -= 1
        # 3)
        if number_members > 2:
            return value
        # 4)
        type_mapping = self.get_type_mapping(active_property)
        language_mapping = self.get_language_mapping(active_property)
        if "@id" in value:
            if number_members == 1 and type_mapping == "@id":
                return self.compact_iri(value["@id"])
            if number_members == 1 and type_mapping == "@vocab":
                return self.compact_iri(value["@id"], relative_to_vocab=True)
            return value
        value_value = value.get("@value")
        # 5)
        if "@type" in value and value["@type"] is not None and value["@type"] == type_mapping:
            return value_value
        # 6)
        if "@language" in value:
            v_lang = value["@language"]
            if v_lang is not None and (
                v_lang == language_mapping or v_lang == self.map.get("@language")
            ):
                return value_value
        # 7)
        td = self.get_term_definition(active_property)
        if number_members == 1 and (
            not isinstance(value_value, str)
            or "@language" not in self.map
            or (td is not None and "@language" in td and language_mapping is None)
        ):
            return value_value
        # 8)
        return value

    # ------------------------------------------------------------------
    # Inverse Context Creation (Context.cs:952-1085)
    # ------------------------------------------------------------------
    def get_inverse(self) -> dict:
        if self.inverse is not None:
            return self.inverse
        self.inverse = {}
        terms = sorted(self.term_definitions.keys(), key=shortest_least_key)
        for term in terms:
            definition = self.term_definitions[term]
            # 3.1)
            if definition is None:
                continue
            # 3.2)
            container = definition.get("@container")
            if container is None:
                container = "@none"
            # 3.3)
            iri = definition.get("@id")
            # 3.4 + 3.5)
            container_map = self.inverse.get(iri)
            if container_map is None:
                container_map = {}
                self.inverse[iri] = container_map
            # 3.6 + 3.7)
            type_language_map = container_map.get(container)
            if type_language_map is None:
                type_language_map = {"@language": {}, "@type": {}}
                container_map[container] = type_language_map
            # 3.8)
            if definition.get("@reverse") is True:
                type_map = type_language_map["@type"]
                if "@reverse" not in type_map:
                    type_map["@reverse"] = term
            elif "@type" in definition:
                # 3.9)
                type_map = type_language_map["@type"]
                if definition["@type"] not in type_map:
                    type_map[definition["@type"]] = term
            elif "@language" in definition:
                # 3.10)
                language_map = type_language_map["@language"]
                language = definition["@language"]
                if language is None:
                    language = "@null"
                if language not in language_map:
                    language_map[language] = term
            else:
                # 3.11)
                language_map = type_language_map["@language"]
                if "@language" not in language_map:
                    language_map["@language"] = term
                if "@none" not in language_map:
                    language_map["@none"] = term
                type_map = type_language_map["@type"]
                if "@none" not in type_map:
                    type_map["@none"] = term
        return self.inverse

    # ------------------------------------------------------------------
    # Term Selection (Context.cs:1104-1138)
    # ------------------------------------------------------------------
    def select_term(self, iri: str, containers: list, type_language: str,
                    preferred_values: list) -> Optional[str]:
        inv = self.get_inverse()
        container_map = inv[iri]
        for container in containers:
            if container not in container_map:
                continue
            type_language_map = container_map[container]
            value_map = type_language_map[type_language]
            for item in preferred_values:
                if item not in value_map:
                    continue
                return value_map[item]
        return None

    # ------------------------------------------------------------------
    # IRI Compaction (Context.cs:643-930)
    # ------------------------------------------------------------------
    def compact_iri(self, iri: Optional[str], value: Any = None,
                    relative_to_vocab: bool = False, reverse: bool = False) -> Optional[str]:
        # 1)
        if iri is None:
            return None
        if not isinstance(iri, str):
            # the reference would throw an InvalidCastException casting the
            # token to string (Context.cs:643); raise the typed error instead
            raise JsonLdError(
                JsonLdError.INVALID_INPUT, "compact_iri expects a string IRI"
            )
        # 2)
        if relative_to_vocab and iri in self.get_inverse():
            # 2.1)
            default_language = self.map.get("@language")
            if default_language is None:
                default_language = "@none"
            # 2.2)
            containers: list = []
            # 2.3)
            type_language = "@language"
            type_language_value: Optional[str] = "@null"
            # 2.4)
            if isinstance(value, dict) and "@index" in value:
                containers.append("@index")
            # 2.5)
            if reverse:
                type_language = "@type"
                type_language_value = "@reverse"
                containers.append("@set")
            elif isinstance(value, dict) and "@list" in value:
                # 2.6)
                if "@index" not in value:
                    containers.append("@list")
                lst = value["@list"]
                common_language = default_language if len(lst) == 0 else None
                common_type = None
                # 2.6.4)
                for item in lst:
                    item_language = "@none"
                    item_type = "@none"
                    if is_value(item):
                        if "@language" in item:
                            item_language = item["@language"]
                        elif "@type" in item:
                            item_type = item["@type"]
                        else:
                            item_language = "@null"
                    else:
                        item_type = "@id"
                    if common_language is None:
                        common_language = item_language
                    elif common_language != item_language and is_value(item):
                        common_language = "@none"
                    if common_type is None:
                        common_type = item_type
                    elif common_type != item_type:
                        common_type = "@none"
                    if common_language == "@none" and common_type == "@none":
                        break
                common_language = common_language if common_language is not None else "@none"
                common_type = common_type if common_type is not None else "@none"
                # 2.6.7)
                if common_type != "@none":
                    type_language = "@type"
                    type_language_value = common_type
                else:
                    type_language_value = common_language
            else:
                # 2.7)
                if isinstance(value, dict) and "@value" in value:
                    if "@language" in value and "@index" not in value:
                        containers.append("@language")
                        type_language_value = value["@language"]
                    elif "@type" in value:
                        type_language = "@type"
                        type_language_value = value["@type"]
                else:
                    # 2.7.2)
                    type_language = "@type"
                    type_language_value = "@id"
                containers.append("@set")
            # 2.8)
            containers.append("@none")
            # 2.9)
            if type_language_value is None:
                type_language_value = "@null"
            # 2.10)
            preferred_values: list = []
            # 2.11)
            if type_language_value == "@reverse":
                preferred_values.append("@reverse")
            # 2.12)
            if type_language_value in ("@reverse", "@id") and isinstance(value, dict) and "@id" in value:
                result = self.compact_iri(value["@id"], None, True, True)
                td = self.term_definitions.get(result)
                if (
                    td is not None
                    and "@id" in td
                    and value["@id"] is not None
                    and value["@id"] == td["@id"]
                ):
                    preferred_values.append("@vocab")
                    preferred_values.append("@id")
                else:
                    preferred_values.append("@id")
                    preferred_values.append("@vocab")
            else:
                # 2.13)
                preferred_values.append(type_language_value)
            preferred_values.append("@none")
            # 2.14)
            term = self.select_term(iri, containers, type_language, preferred_values)
            # 2.15)
            if term is not None:
                return term
        # 3)
        if relative_to_vocab and "@vocab" in self.map:
            vocab = self.map["@vocab"]
            # 3.1)
            if iri.startswith(vocab) and iri != vocab:
                suffix = iri[len(vocab):]
                if suffix not in self.term_definitions:
                    return suffix
        # 4)
        compact_iri_result = None
        # 5)
        for term_1, term_definition in self.term_definitions.items():
            # 5.1)
            if ":" in term_1:
                continue
            # 5.2)
            if term_definition is None:
                continue
            td_id = term_definition.get("@id")
            if td_id == iri or not (isinstance(td_id, str) and iri.startswith(td_id)):
                continue
            # 5.3)
            candidate = term_1 + ":" + iri[len(td_id):]
            # 5.4)
            if (
                compact_iri_result is None
                or compare_shortest_least(candidate, compact_iri_result) < 0
            ) and (
                candidate not in self.term_definitions
                or (
                    self.term_definitions[candidate] is not None
                    and self.term_definitions[candidate].get("@id") == iri
                    and value is None
                )
            ):
                compact_iri_result = candidate
        # 6)
        if compact_iri_result is not None:
            return compact_iri_result
        # 7)
        if not relative_to_vocab:
            return URL.remove_base(self.map.get("@base"), iri)
        # 8)
        return iri

    # ------------------------------------------------------------------
    # Term-definition lookups (Context.cs:1140-1215)
    # ------------------------------------------------------------------
    def get_container(self, prop: Optional[str]) -> Optional[str]:
        if prop is None:
            return None
        if prop == "@graph":
            return "@set"
        if is_keyword(prop):
            return prop
        td = self.term_definitions.get(prop)
        if td is None:
            return None
        return td.get("@container")

    def is_reverse_property(self, prop: Optional[str]) -> bool:
        if prop is None:
            return False
        td = self.term_definitions.get(prop)
        if td is None:
            return False
        return td.get("@reverse") is True

    def get_type_mapping(self, prop: Optional[str]) -> Optional[str]:
        if prop is None:
            return None
        td = self.term_definitions.get(prop)
        if td is None:
            return None
        return td.get("@type")

    def get_language_mapping(self, prop: Optional[str]) -> Optional[str]:
        if prop is None:
            return None
        td = self.term_definitions.get(prop)
        if td is None:
            return None
        return td.get("@language")

    def get_term_definition(self, key: Optional[str]) -> Optional[dict]:
        if key is None:
            return None
        return self.term_definitions.get(key)

    # ------------------------------------------------------------------
    # Context re-serialization (Context.cs:1278-1335)
    # ------------------------------------------------------------------
    def serialize(self) -> dict:
        ctx: dict = {}
        base = self.map.get("@base")
        if base is not None and base != self.options.base:
            ctx["@base"] = base
        if self.map.get("@language") is not None:
            ctx["@language"] = self.map["@language"]
        if self.map.get("@vocab") is not None:
            ctx["@vocab"] = self.map["@vocab"]
        for term, definition in self.term_definitions.items():
            if definition is None:
                continue
            if (
                definition.get("@language") is None
                and definition.get("@container") is None
                and definition.get("@type") is None
                and (definition.get("@reverse") in (None, False))
            ):
                cid = self.compact_iri(definition.get("@id"))
                ctx[term] = definition.get("@id") if term == cid else cid
            else:
                defn: dict = {}
                cid = self.compact_iri(definition.get("@id"))
                reverse_property = definition.get("@reverse") is True
                if not (term == cid and not reverse_property):
                    defn["@reverse" if reverse_property else "@id"] = cid
                type_mapping = definition.get("@type")
                if type_mapping is not None:
                    defn["@type"] = (
                        type_mapping
                        if is_keyword(type_mapping)
                        else self.compact_iri(type_mapping, relative_to_vocab=True)
                    )
                if definition.get("@container") is not None:
                    defn["@container"] = definition["@container"]
                if definition.get("@language") is not None:
                    lang = definition["@language"]
                    defn["@language"] = None if lang is False else lang
                ctx[term] = defn
        rval: dict = {}
        if ctx:
            rval["@context"] = ctx
        return rval
