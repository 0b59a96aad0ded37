"""HTML → text extraction, all JVM-side (regexp chains, zero Python).

The boilerplate-strip order matters and is pinned by tests/test_warc.py:

1. drop ``<script>``/``<style>`` ELEMENTS (content included — a generic
   tag-strip first would leak ``var x = "..."`` into the text, and script
   bodies legally contain ``</p>``-style markup),
2. drop comments and the whole ``<head>`` section (title is extracted
   separately),
3. replace remaining tags with a space (so ``a</p><p>b`` doesn't fuse),
4. unescape the five XML entities — ``&amp;`` LAST (else ``&amp;lt;``
   double-unescapes),
5. collapse whitespace runs and trim.

Reference parity: the reference repo is packaging-only; semantics follow
the common trafilatura/jusText-style tag-strip baseline (public
knowledge), kept exactly SQL-expressible so the DuckDB oracle can
recompute expected text from the source documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_title(html: Column) -> Column:
    """First <title> element's raw text ('' when absent)."""
    return F.regexp_extract(html, r"(?s)<title>(.*?)</title>", 1)


def html_link_count(html: Column) -> Column:
    """Number of anchor OPENING tags (href presence not required)."""
    # size(split(s, re)) - 1 == occurrence count; works in whole-stage codegen
    return (F.size(F.split(html, r"<a\b")) - F.lit(1)).cast("int")


def html_text(html: Column) -> Column:
    """Visible text: script/style/head/comments dropped, tags → space,
    entities unescaped once, whitespace collapsed."""
    t = F.regexp_replace(html, r"(?is)<script\b.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b.*?</style>", " ")
    t = F.regexp_replace(t, r"(?is)<head\b.*?</head>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last — see module docstring
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
