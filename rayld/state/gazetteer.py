"""Deterministic entity-linking gazetteer.

``(surface_form, entity_iri, entity_type)`` rows generated from a fixed seed
(FIXTURES.md §5). The gazetteer is the *small broadcast side* of the linking
stage: built once on the driver, shipped via ``ray.put``, and compiled into a
matcher inside each linker actor's ``__init__`` — never per batch.
"""

from __future__ import annotations

import numpy as np

ENTITY_NS = "https://rayld.dev/entity/"

_FIRST = [
    "ada", "alan", "grace", "edsger", "donald", "barbara", "john", "leslie",
    "tim", "vint", "radia", "margaret", "katherine", "annie", "claude",
    "kurt", "alonzo", "noam", "marvin", "seymour",
]
_LAST = [
    "lovelace", "turing", "hopper", "dijkstra", "knuth", "liskov", "mccarthy",
    "lamport", "berners-lee", "cerf", "perlman", "hamilton", "johnson",
    "easley", "shannon", "goedel", "church", "chomsky", "minsky", "papert",
]
_ORG = [
    "acme", "globex", "initech", "umbrella", "hooli", "wonka", "stark",
    "wayne", "tyrell", "cyberdyne", "aperture", "blackmesa", "oscorp",
    "octan", "monarch", "vandelay", "prestige", "sirius", "virtucon", "zorg",
]
_PLACE = [
    "arcadia", "brookfield", "cedarville", "dunmore", "eastwick", "fairhaven",
    "greendale", "hawkins", "ironton", "jericho", "kingsport", "lakeshore",
    "maplewood", "northfield", "oakvale", "pinecrest", "quarry-bay",
    "riverton", "stonebridge", "twin-peaks",
]


_DIVISION = ["Analytics", "Robotics", "Logistics", "Energy", "Marine", "Aviation"]
_PLACE_SUFFIX = ["Harbor", "Heights", "Valley", "Junction", "Falls"]
_GREEK = [
    "Hydra", "Lyra", "Orion", "Vega", "Atlas", "Nova", "Titan", "Quasar",
    "Pulsar", "Nebula", "Comet", "Meteor", "Aurora", "Zenith", "Apex", "Helix",
]


def build_gazetteer(seed: int = 42) -> list[tuple[str, str, str]]:
    """~1k deterministic (surface_form, entity_iri, entity_type) rows
    (FIXTURES.md §5)."""
    rng = np.random.default_rng(seed)
    rows: list[tuple[str, str, str]] = []
    seen = set()

    def add(surface: str, slug: str, etype: str):
        if slug in seen:
            return
        seen.add(slug)
        rows.append((surface, ENTITY_NS + slug, etype))

    for first in _FIRST:
        for last in _LAST:
            if rng.random() < 0.85:
                surface = f"{first.capitalize()} {last.capitalize()}"
                add(surface, f"person/{first}_{last}", "Person")
    for org in _ORG:
        add(org.capitalize() + " Corp", f"org/{org}", "Organization")
        add(org.capitalize() + " Labs", f"org/{org}_labs", "Organization")
        for div in _DIVISION:
            add(f"{org.capitalize()} {div}", f"org/{org}_{div.lower()}", "Organization")
    for place in _PLACE:
        add(place.replace("-", " ").title(), f"place/{place}", "Place")
        for sfx in _PLACE_SUFFIX:
            add(
                place.replace("-", " ").title() + " " + sfx,
                f"place/{place}_{sfx.lower()}", "Place",
            )
    for name in _GREEK:
        add(f"Project {name}", f"project/{name.lower()}", "Project")
    rows.sort(key=lambda r: r[1])
    return rows


def gazetteer_surfaces(gazetteer: list[tuple[str, str, str]]) -> list[str]:
    return [r[0] for r in gazetteer]
