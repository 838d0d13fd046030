"""IRI parsing / resolution / relativisation.

Parity reference: /root/reference/src/json-ld.net/Util/URL.cs (Parse :50-137,
RemoveDotSegments :139-194, RemoveBase :196-302, Resolve :304-382).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_PARSER = re.compile(
    r"^(?:([^:/?#]+):)?(?:\/\/((?:(([^:@]*)(?::([^:@]*))?)?@)?([^:\/?#]*)(?::(\d*))?))?"
    r"((((?:[^?#\/]*\/)*)([^?#]*))(?:\?([^#]*))?(?:#(.*))?)"
)


class URL:
    """Destructured URL, node.js-style fields (URL.cs:12-48)."""

    def __init__(self):
        self.href = ""
        self.protocol = ""
        self.host = ""
        self.auth = ""
        self.user = ""
        self.password = ""
        self.hostname = ""
        self.port = ""
        self.relative = ""
        self.path = ""
        self.directory = ""
        self.file = ""
        self.query = ""
        self.hash = ""
        self.pathname = None
        self.normalized_path = None
        self.authority = None


def parse(url: str) -> URL:
    """URL.Parse (URL.cs:50-137)."""
    rval = URL()
    rval.href = url
    m = _PARSER.match(url)
    if m is None:
        return rval
    g = [x if x is not None else "" for x in m.groups()]
    (rval.protocol, rval.host, rval.auth, rval.user, rval.password, rval.hostname,
     rval.port, rval.relative, rval.path, rval.directory, rval.file, rval.query,
     rval.hash) = g
    # normalize to node.js API
    if rval.host != "" and rval.path == "":
        rval.path = "/"
    rval.pathname = rval.path
    _parse_authority(rval)
    rval.normalized_path = remove_dot_segments(rval.pathname, rval.authority != "")
    if rval.query != "":
        rval.path += "?" + rval.query
    if rval.protocol != "":
        rval.protocol += ":"
    if rval.hash != "":
        rval.hash = "#" + rval.hash
    return rval


def _parse_authority(parsed: URL) -> None:
    """URL.ParseAuthority (URL.cs:344-380)."""
    if ":" not in parsed.href and parsed.href.startswith("//") and parsed.host == "":
        parsed.pathname = parsed.pathname[2:]
        idx = parsed.pathname.find("/")
        if idx == -1:
            parsed.authority = parsed.pathname
            parsed.pathname = ""
        else:
            parsed.authority = parsed.pathname[:idx]
            parsed.pathname = parsed.pathname[idx:]
    else:
        parsed.authority = parsed.host
        if parsed.auth != "":
            parsed.authority = parsed.auth + "@" + parsed.authority


def _js_split(path: str, delim: str) -> list[str]:
    """JS-style split: keeps a trailing empty entry (URL.cs:150-156)."""
    out = path.split(delim)
    return out


def remove_dot_segments(path: str, has_authority: bool) -> str:
    """RFC3986 5.2.4, reworked like URL.RemoveDotSegments (URL.cs:139-194)."""
    rval = "/" if path.startswith("/") else ""
    inp = path.split("/")
    output: list[str] = []
    n = len(inp)
    for i, seg in enumerate(inp):
        if seg == "." or (seg == "" and n - i > 1):
            continue
        if seg == "..":
            if has_authority or (output and output[-1] != ".."):
                if output:
                    output.pop()
            else:
                output.append("..")
            continue
        output.append(seg)
    return rval + "/".join(output)


def resolve(base_uri: str | None, path_to_resolve: str | None) -> str:
    """Base+relative IRI resolution (URL.Resolve, URL.cs:304-342).

    The reference resolves via .NET ``Uri`` then re-normalises dot segments;
    this matches that observable behaviour with urllib + remove_dot_segments.
    """
    if base_uri is None:
        return path_to_resolve
    if path_to_resolve is None or path_to_resolve.strip() == "":
        return base_uri
    try:
        parsed = urlsplit(base_uri)
        if not parsed.scheme:
            # new Uri(baseUri) would throw for a non-absolute base
            return path_to_resolve
        if path_to_resolve.startswith("?"):
            # drop query+fragment from the base, append the query manually
            root = f"{parsed.scheme}://{parsed.netloc}{parsed.path or '/'}"
            return root + path_to_resolve
        joined = urlsplit(urljoin(base_uri, path_to_resolve))
        path = remove_dot_segments(joined.path, True)
        rval = f"{joined.scheme}://{joined.netloc}{path}"
        if joined.query:
            rval += "?" + joined.query
        if joined.fragment:
            rval += "#" + joined.fragment
        elif path_to_resolve.endswith("#") or (
            "#" in path_to_resolve and path_to_resolve.split("#", 1)[1] == ""
        ):
            rval += "#"
        return rval
    except ValueError:
        return path_to_resolve


def remove_base(base_obj, iri: str) -> str:
    """Absolute -> relative IRI for compaction (URL.RemoveBase, URL.cs:196-302)."""
    if base_obj is None:
        return iri
    if not isinstance(base_obj, str):
        raise TypeError("base must be a string")
    base = parse(base_obj)
    root = ""
    if base.href != "":
        root += base.protocol + "//" + base.authority
    elif not iri.startswith("//"):
        root += "//"
    if not iri.startswith(root):
        return iri
    rel = parse(iri[len(root):])
    base_segments = [s for s in base.normalized_path.split("/") if s != ""]
    if base.normalized_path.endswith("/"):
        base_segments.append("")
    iri_segments = [s for s in rel.normalized_path.split("/") if s != ""]
    if rel.normalized_path.endswith("/"):
        iri_segments.append("")
    while base_segments and iri_segments:
        if base_segments[0] != iri_segments[0]:
            break
        base_segments.pop(0)
        iri_segments.pop(0)
    rval = ""
    if base_segments:
        if not base.normalized_path.endswith("/") or base_segments[0] == "":
            base_segments.pop()
        rval += "../" * len(base_segments)
    rval += "/".join(iri_segments)
    if rel.query != "":
        rval += "?" + rel.query
    if rel.hash != "":
        rval += rel.hash
    if rval == "":
        rval = "./"
    return rval
