"""Canonical blank-node naming (legacy json-ld.org normalization: SHA-1,
``_:c14n`` prefix, ``p``/``r`` direction markers, ``_:a``/``_:z`` first-degree
substitution — the URGNA2012 lineage).

Parity reference: /root/reference/src/json-ld.net/Core/NormalizeUtils.cs
(HashBlankNodes :30-205, HashPaths :242-458, HashQuads :466-488,
Permutator :539-617) and Core/UniqueNamer.cs:7-79.
"""

from __future__ import annotations

import hashlib
from typing import Optional

from .errors import JsonLdError
from .nquads import parse_nquads, to_nquad
from .utils import utf16_key


class UniqueNamer:
    """Stateful issuer ``prefix+counter`` with old->new memo (UniqueNamer.cs:7-79)."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.counter = 0
        self.existing: dict = {}

    def clone(self) -> "UniqueNamer":
        cp = UniqueNamer(self.prefix)
        cp.counter = self.counter
        cp.existing = dict(self.existing)
        return cp

    def get_name(self, old_name: Optional[str] = None) -> str:
        if old_name is not None and old_name in self.existing:
            return self.existing[old_name]
        name = self.prefix + str(self.counter)
        self.counter += 1
        if old_name is not None:
            self.existing[old_name] = name
        return name

    def is_named(self, old_name: str) -> bool:
        return old_name in self.existing


class _HashResult:
    __slots__ = ("hash", "path_namer")

    def __init__(self, hash_: str = "", path_namer: Optional[UniqueNamer] = None):
        self.hash = hash_
        self.path_namer = path_namer


# N-degree path hashing tries every permutation of a same-hash bnode group —
# factorial blowup (SURVEY.md §7 hard-point 2). Groups beyond this size take
# the single sorted permutation instead, with a loud log (no silent cap).
MAX_PERMUTATION_GROUP = 7


class Permutator:
    """Steinhaus-Johnson-Trotter permutations in ordinal order
    (NormalizeUtils.cs:539-617)."""

    def __init__(self, lst: list, max_group: Optional[int] = None):
        cap = MAX_PERMUTATION_GROUP if max_group is None else max_group
        self.list = sorted(lst, key=utf16_key)
        self.done = False
        self.left = {i: True for i in self.list}
        if cap and len(self.list) > cap:
            import logging

            logging.getLogger("rayld.normalize").warning(
                "canonicalization: capping permutation search for a bnode "
                "clique of %d (> %d); using sorted order — canonical labels "
                "may differ from the exhaustive search for this component",
                len(self.list), cap,
            )
            self.capped = True
        else:
            self.capped = False

    def has_next(self) -> bool:
        return not self.done

    def next(self) -> list:
        rval = list(self.list)
        if self.capped:
            self.done = True
            return rval
        # find largest mobile element k
        k = None
        pos = 0
        length = len(self.list)
        for i in range(length):
            element = self.list[i]
            left = self.left[element]
            if (k is None or utf16_key(element) > utf16_key(k)) and (
                (left and i > 0 and utf16_key(element) > utf16_key(self.list[i - 1]))
                or (
                    not left
                    and i < length - 1
                    and utf16_key(element) > utf16_key(self.list[i + 1])
                )
            ):
                k = element
                pos = i
        if k is None:
            self.done = True
        else:
            swap = pos - 1 if self.left[k] else pos + 1
            self.list[pos], self.list[swap] = self.list[swap], k
            for e in self.list:
                if utf16_key(e) > utf16_key(k):
                    self.left[e] = not self.left[e]
        return rval


def _get_adjacent_blank_node_name(node: dict, id_: str) -> Optional[str]:
    """NormalizeUtils.GetAdjacentBlankNodeName (NormalizeUtils.cs:534-537)."""
    if node.get("type") == "blank node" and node.get("value") != id_:
        return node.get("value")
    return None


def _hash_quads(id_: str, bnodes: dict, namer: UniqueNamer) -> str:
    """First-degree hash of all quads mentioning a bnode
    (NormalizeUtils.cs:466-488)."""
    if "hash" in bnodes[id_]:
        return bnodes[id_]["hash"]
    quads = bnodes[id_]["quads"]
    nquads = []
    for quad in quads:
        name = quad.get("name")
        nquads.append(
            to_nquad(quad, name["value"] if name is not None else None, id_)
        )
    nquads.sort(key=utf16_key)
    md = hashlib.sha1()
    for nq in nquads:
        md.update(nq.encode("utf-8"))
    hash_ = md.hexdigest()
    bnodes[id_]["hash"] = hash_
    return hash_


def _hash_paths(id_: str, bnodes: dict, namer: UniqueNamer,
                path_namer: UniqueNamer,
                max_group: Optional[int] = None) -> _HashResult:
    """N-degree path hashing with permutation search
    (NormalizeUtils.cs:242-458)."""
    md = hashlib.sha1()
    groups: dict = {}
    quads = bnodes[id_]["quads"]
    # build adjacency groups
    for quad in quads:
        bnode = _get_adjacent_blank_node_name(quad["subject"], id_)
        direction = None
        if bnode is not None:
            direction = "p"
        else:
            bnode = _get_adjacent_blank_node_name(quad["object"], id_)
            if bnode is not None:
                direction = "r"
        if bnode is not None:
            if namer.is_named(bnode):
                name = namer.get_name(bnode)
            elif path_namer.is_named(bnode):
                name = path_namer.get_name(bnode)
            else:
                name = _hash_quads(bnode, bnodes, namer)
            md1 = hashlib.sha1()
            md1.update(direction.encode("utf-8"))
            md1.update(quad["predicate"]["value"].encode("utf-8"))
            md1.update(name.encode("utf-8"))
            group_hash = md1.hexdigest()
            groups.setdefault(group_hash, []).append(bnode)
    # hash groups in sorted order
    for group_hash in sorted(groups.keys()):
        md.update(group_hash.encode("utf-8"))
        chosen_path = None
        chosen_namer = None
        permutator = Permutator(groups[group_hash], max_group=max_group)
        while True:
            cont_permutation = False
            break_out = False
            permutation = permutator.next()
            path_namer_copy = path_namer.clone()
            path = ""
            recurse = []
            for bnode in permutation:
                if namer.is_named(bnode):
                    path += namer.get_name(bnode)
                else:
                    if not path_namer_copy.is_named(bnode):
                        recurse.append(bnode)
                    path += path_namer_copy.get_name(bnode)
                if (
                    chosen_path is not None
                    and len(path) >= len(chosen_path)
                    and utf16_key(path) > utf16_key(chosen_path)
                ):
                    if permutator.has_next():
                        cont_permutation = True
                    else:
                        md.update(chosen_path.encode("utf-8"))
                        path_namer = chosen_namer
                        break_out = True
                    break
            if cont_permutation:
                continue
            if break_out:
                break
            hit_break_out = False
            for bnode_1 in recurse:
                result = _hash_paths(bnode_1, bnodes, namer, path_namer_copy,
                                     max_group=max_group)
                path += path_namer_copy.get_name(bnode_1) + "<" + result.hash + ">"
                path_namer_copy = result.path_namer
                if (
                    chosen_path is not None
                    and len(path) >= len(chosen_path)
                    and utf16_key(path) > utf16_key(chosen_path)
                ):
                    if not permutator.has_next():
                        md.update(chosen_path.encode("utf-8"))
                        path_namer = chosen_namer
                        break_out = True
                    hit_break_out = True
                    break
            if not hit_break_out:
                if chosen_path is None or utf16_key(path) < utf16_key(chosen_path):
                    chosen_path = path
                    chosen_namer = path_namer_copy
                if not permutator.has_next():
                    md.update(chosen_path.encode("utf-8"))
                    path_namer = chosen_namer
                    break_out = True
            if break_out:
                break
    return _HashResult(md.hexdigest(), path_namer)


class NormalizeUtils:
    def __init__(self, quads: list, bnodes: dict, namer: UniqueNamer, options):
        self.quads = quads
        self.bnodes = bnodes
        self.namer = namer
        self.options = options

    def canonical_quads(self, unnamed_: list) -> list:
        """Assign canonical names and return the renamed quads directly —
        the engine's columnar fast path (skips the reference's serialize ->
        sort -> re-parse round trip, which only matters for text output)."""
        self._assign_canonical_names(list(unnamed_))
        for quad in self.quads:
            self._rename_quad(quad)
        return self.quads

    def _rename_quad(self, quad: dict) -> None:
        for attr in ("subject", "object", "name"):
            if attr in quad:
                qa = quad[attr]
                if (
                    qa is not None
                    and qa.get("type") == "blank node"
                    and not qa["value"].startswith("_:c14n")
                ):
                    qa["value"] = self.namer.get_name(qa["value"])

    def hash_blank_nodes(self, unnamed_: list):
        """Fixpoint first-degree hashing, then per-group N-degree naming, then
        canonical rename + sorted N-Quads (NormalizeUtils.cs:30-205)."""
        self._assign_canonical_names(list(unnamed_))
        normalized = []
        for quad in self.quads:
            self._rename_quad(quad)
            name = quad.get("name")
            normalized.append(
                to_nquad(quad, name["value"] if name is not None else None)
            )
        normalized.sort(key=utf16_key)
        if self.options.format is not None:
            if self.options.format == "application/nquads":
                return "".join(normalized)
            raise JsonLdError(JsonLdError.UNKNOWN_FORMAT, self.options.format)
        return parse_nquads("".join(normalized))

    def _assign_canonical_names(self, unnamed: list) -> None:
        while True:
            next_unnamed: list = []
            duplicates: dict = {}
            unique: dict = {}
            for bnode_1 in unnamed:
                hash_1 = _hash_quads(bnode_1, self.bnodes, self.namer)
                if hash_1 in duplicates:
                    duplicates[hash_1].append(bnode_1)
                    next_unnamed.append(bnode_1)
                elif hash_1 in unique:
                    duplicates[hash_1] = [unique[hash_1], bnode_1]
                    next_unnamed.append(unique[hash_1])
                    next_unnamed.append(bnode_1)
                    del unique[hash_1]
                else:
                    unique[hash_1] = bnode_1
            # name unique-hash bnodes in sorted hash order
            named = False
            for hash_ in sorted(unique.keys()):
                self.namer.get_name(unique[hash_])
                named = True
            if named:
                # a node was named: hashes may have changed; reset hash caches?
                # (the reference recomputes via cached "hash" only for bnodes
                # never rehashed — it does NOT clear the cache, so neither do we;
                # the cache is only consulted by _hash_quads)
                unnamed = next_unnamed
                continue
            # name duplicate-hash groups via N-degree path hashing
            for hash_ in sorted(duplicates.keys()):
                group = duplicates[hash_]
                results = []
                for bnode in group:
                    if self.namer.is_named(bnode):
                        continue
                    path_namer = UniqueNamer("_:b")
                    path_namer.get_name(bnode)
                    results.append(_hash_paths(
                        bnode, self.bnodes, self.namer, path_namer,
                        max_group=getattr(self.options, 'max_permutation_group', None)))
                results.sort(key=lambda r: r.hash)
                for r in results:
                    for key in r.path_namer.existing.keys():
                        self.namer.get_name(key)
            break
