"""Pure-Python URL semantics shared by the vectorized UDFs and the datagen.

Behavioral contract comes from the reference (cited per function); the
implementations are new.  Everything here is deterministic and importable on
executors without a SparkSession, so the pandas UDFs in ``urls.py`` can call
straight into it over Arrow batches.
"""

from __future__ import annotations

import posixpath
import re
from urllib.parse import parse_qsl, urlencode, urljoin, urlparse, urlunparse

_SCHEMES = ("http://", "https://", "ftp://")
_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# Approximation of `validators.url` for the subset of URLs this engine sees
# (od_util.py:153-160 requires scheme + trailing slash and then delegates to
# validators.url; our synthetic world never produces the exotic cases where
# the two differ).
_URL_RE = re.compile(
    r"^(?:http|https|ftp)://"
    r"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+"  # dotted host labels
    r"[A-Za-z]{2,63}"  # TLD
    r"(?::\d{1,5})?"  # optional port
    r"(?:/[^\s]*)?$"
)


def is_valid_url(url: str) -> bool:
    """Ref semantics: od_util.py:153-160 — trailing '/', known scheme, valid URL."""
    if not url or not url.endswith("/"):
        return False
    if not url.startswith(_SCHEMES):
        return False
    return _URL_RE.match(url) is not None


def has_extension(link: str) -> bool:
    """Ref semantics: od_util.py:163-164 (len(splitext(link)[1]) > 0) — applied
    to the whole link, so a bare host like 'http://a.com' counts as having
    extension '.com' (reference quirk, preserved)."""
    return len(posixpath.splitext(link or "")[1]) > 0


def is_external_link(base_url: str, url: str) -> bool:
    """Ref semantics: od_util.py:167-172 — urljoin then substring containment."""
    joined = urljoin(base_url, (url or "")).strip()
    return base_url not in joined


def split_ext(name: str) -> tuple[str, str]:
    """Ingest ext-derivation: search/search.py:144-145.

    splitext-style split on the LAST dot; ext lowercased without the dot;
    hidden files ('.bashrc') and trailing-dot names yield ext ''.
    """
    root, ext = posixpath.splitext(name or "")
    if ext and len(ext) > 1:
        return root, ext[1:].lower()
    return root, ""


def canonicalize(url: str) -> dict:
    """Canonical URL per the north rule: lowercase host, strip fragment and
    default port, sort query params, resolve dot segments, force trailing '/'
    (the reference forces it with os.path.join(url, '') — views.py:270).

    Returns dict(url, host, scheme, path, depth, valid) — depth is the number
    of path segments of the directory.
    """
    raw = (url or "").strip()
    if not raw:
        return {"url": "", "host": "", "scheme": "", "path": "", "depth": 0, "valid": False}
    p = urlparse(raw)
    scheme = p.scheme.lower()
    host = p.hostname.lower() if p.hostname else ""
    port = p.port
    netloc = host
    if port is not None and _DEFAULT_PORTS.get(scheme) != port:
        netloc = f"{host}:{port}"
    path = p.path or "/"
    # resolve ./ and ../ segments; keep it a directory
    path = posixpath.normpath(path)
    if path == ".":
        path = "/"
    if path.startswith("//"):  # POSIX normpath preserves a leading '//'
        path = path[1:]
    if not path.endswith("/"):
        path += "/"
    if not path.startswith("/"):
        path = "/" + path
    query = ""
    if p.query:
        query = urlencode(sorted(parse_qsl(p.query, keep_blank_values=True)))
    canon = urlunparse((scheme, netloc, path, "", query, ""))
    depth = path.count("/") - 1
    # Validity is judged on the directory part (the reference's trailing-slash
    # rule predates query strings; od_util.py:153-160 applies to dir roots).
    return {
        "url": canon,
        "host": host,
        "scheme": scheme,
        "path": path,
        "depth": depth,
        "valid": is_valid_url(urlunparse((scheme, netloc, path, "", "", ""))),
    }


def blacklist_key(url: str) -> str:
    """Blacklist normalization: scheme://netloc (database.py:270-272),
    lowercased — blacklist checks run post-canonicalization where the host is
    already lowercase, so the key is case-normalized here too."""
    p = urlparse(url or "")
    return f"{p.scheme.lower()}://{p.netloc.lower()}"


def parent_prefixes(url: str) -> list[str]:
    """All directory-boundary prefixes of a canonical URL, shortest first,
    including the URL itself.

    Equi-izes the reference's prefix theta-join
    ``WHERE url = substr(%s, 0, length(url)+1)`` (database.py:129-136): a URL
    is parent-seen iff ANY of these prefixes is in the websites/seen table.
    Reference URLs are directory roots ending '/', so '/' boundaries are the
    only possible match points.
    """
    p = urlparse(url or "")
    if not p.scheme or not p.netloc:
        return [url] if url else []
    root = f"{p.scheme}://{p.netloc}/"
    out = [root]
    segs = [s for s in (p.path or "/").split("/") if s]
    acc = root
    for s in segs:
        acc = acc + s + "/"
        out.append(acc)
    # Query strings are dropped: prefix membership is a directory-tree
    # property (reference URLs are directory roots, od_util.py:153-160).
    return out
