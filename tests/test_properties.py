"""Property-based checks (hypothesis) for the pure semantic layer."""

import os.path

from hypothesis import given, settings
from hypothesis import strategies as st

from od_database_spark.functions import urlpure

hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{0,8}){1,2}", fullmatch=True)
segs = st.lists(st.from_regex(r"[a-zA-Z0-9_\-]{1,8}", fullmatch=True), max_size=4)
schemes = st.sampled_from(["http", "https", "ftp"])


@st.composite
def urls(draw):
    scheme = draw(schemes)
    host = draw(hosts)
    path = "/".join(draw(segs))
    trail = draw(st.sampled_from(["/", ""]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return f"{scheme}://{host}{port}/{path}{trail}{frag}"


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(url):
    c1 = urlpure.canonicalize(url)
    c2 = urlpure.canonicalize(c1["url"])
    assert c2["url"] == c1["url"]
    assert c2["host"] == c1["host"]
    assert c2["depth"] == c1["depth"]


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonical_url_always_directory(url):
    c = urlpure.canonicalize(url)
    assert c["path"].endswith("/")
    assert c["host"] == c["host"].lower()
    assert "#" not in c["url"]


@given(urls())
@settings(max_examples=200, deadline=None)
def test_prefixes_are_prefixes_and_canonical(url):
    c = urlpure.canonicalize(url)
    prefixes = urlpure.parent_prefixes(c["url"])
    assert prefixes, c["url"]
    no_query = c["url"].split("?")[0]
    for p in prefixes:
        assert no_query.startswith(p) or p == no_query
        assert p.endswith("/")
    # deepest prefix is the directory itself
    assert prefixes[-1] == no_query


@given(st.from_regex(r"[A-Za-z0-9._\- ]{0,20}", fullmatch=True))
@settings(max_examples=500, deadline=None)
def test_split_ext_matches_reference_rule(name):
    """Our split_ext must equal the reference's ingest derivation
    (search/search.py:144-145): splitext + lowercase + len>1 guard."""
    root, ext = urlpure.split_ext(name)
    ref_root, ref_ext = os.path.splitext(name)
    ref_ext_final = ref_ext[1:].lower() if ref_ext and len(ref_ext) > 1 else ""
    assert ext == ref_ext_final, name
    assert root == ref_root, name


@given(st.text(alphabet="abcdefg/._:", max_size=30))
@settings(max_examples=300, deadline=None)
def test_has_extension_matches_splitext(link):
    assert urlpure.has_extension(link) == (len(os.path.splitext(link)[1]) > 0)
