"""HTML → text extraction — the WET-extraction stage of a web-crawl
pipeline (raw WARC/HTML in, visible prose out, before language-ID /
quality filtering ever run).

Pure Catalyst regexp chain (JVM-side, codegen'd; no UDF, no HTML
parser dependency): at 10^12 pages the extraction must ride the scan,
and a real DOM parse is neither available in this container nor
needed for the prose-recall/boilerplate-drop tradeoff the training
pipeline wants (same tier as CCNet's WET consumption; full-fidelity
extraction is a swap point, not this operator's contract).

Every pattern is RE2-compatible (no backreferences, inline (?is)
flags, non-greedy blocks) so a SQL oracle can restate the chain
verbatim; element-name patterns use ``<tag(\\s[^>]*)?>`` so ``<head>``
never swallows ``<header>``.

Reference parity note: the reference engine ingests id+SMILES CSVs
(mehc_curation/utils/io_utils.py) and has no markup surface; this is
part of the web-scale ingestion story the graft adds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["extract_text_col", "DROP_BLOCK_TAGS", "NEWLINE_CLOSERS"]

#: non-content containers removed WITH their contents (script/style
#: are code; head is metadata; nav/footer/aside are boilerplate chrome)
DROP_BLOCK_TAGS = ("script", "style", "head", "nav", "footer", "aside")

#: closing tags that end a visual block — each becomes a newline so
#: paragraph structure survives tag stripping
NEWLINE_CLOSERS = ("p|div|h[1-6]|li|tr|table|ul|ol|blockquote"
                   "|header|section|article|main")

#: decode order matters: named/numeric entities first, ``&amp;`` LAST
#: (decoding it first would re-expose entity-looking text like
#: ``&amp;lt;`` as ``&lt;`` and double-decode)
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"))


def extract_text_col(html: Column) -> Column:
    """Visible text of an HTML document as a pure Catalyst expression:

    1. drop :data:`DROP_BLOCK_TAGS` blocks with their contents;
    2. drop ``<!-- comments -->``;
    3. turn ``<br>`` and :data:`NEWLINE_CLOSERS` into newlines;
    4. strip every remaining tag;
    5. decode the six basic entities (``&amp;`` last);
    6. collapse spaces/tabs, trim each line, drop empty lines.

    NULL in → NULL out (the chain is NULL-propagating end to end).
    """
    t = html
    for tag in DROP_BLOCK_TAGS:
        t = F.regexp_replace(t, rf"(?is)<{tag}(\s[^>]*)?>.*?</{tag}>", "")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", "")
    t = F.regexp_replace(t, r"(?i)<br(\s[^>]*)?/?>", "\n")
    t = F.regexp_replace(t, rf"(?i)</({NEWLINE_CLOSERS})>", "\n")
    t = F.regexp_replace(t, r"<[^>]*>", "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    t = F.regexp_replace(t, r"[ \t\r]+", " ")
    # single-arg lambda, NOT bare F.trim: transform() feeds a 2-arg
    # callable (element, index), and trim's optional second parameter
    # is a trim-CHARACTER set — line N would get the digits of N
    # trimmed off its ends
    lines = F.filter(F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
                     lambda x: x != "")
    return F.when(html.isNull(), F.lit(None).cast("string")) \
            .otherwise(F.array_join(lines, "\n"))
