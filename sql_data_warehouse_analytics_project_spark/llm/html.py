"""HTML → training text extraction (the step between a WARC crawl and the
``documents`` table).

The reference's pipeline starts from already-extracted text; a real 100 TB
corpus starts from crawled HTML, and the extraction step — strip markup,
drop script/style, collapse whitespace, shed navigation boilerplate — is
where most of the corpus's quality is decided (trafilatura / jusText do
exactly this; the link-density heuristic below is jusText's core signal,
Pomikálek 2011).

Everything is stdlib: ``html.parser.HTMLParser`` is a tolerant streaming
tokenizer that never raises on malformed markup and decodes character
references for free (``convert_charrefs=True``). The extractor is a pure
string→string function, so the Spark surface is a per-row Arrow kernel
(``mapInPandas``) — partition-invariant, no shuffle, and the whole
operation pipelines with the WARC record scan that feeds it.

Determinism contract (what the DuckDB gate twin replays): text nodes are
grouped into *blocks* at block-level tag boundaries; within a block,
whitespace runs collapse to single spaces and edges trim; empty blocks
drop; blocks join with ``\\n``. With ``drop_boilerplate=True`` a block is
dropped when its anchor-text share exceeds ``max_link_density`` or it is
shorter than ``min_block_chars``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

#: Content inside these elements never reaches the text stream.
_SKIP = frozenset(
    "script style noscript template svg head iframe object embed".split()
)

#: Tags that end the current block (HTML block-level display, plus <br>).
_BLOCK = frozenset(
    "address article aside blockquote br caption dd details div dl dt "
    "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr "
    "li main menu nav ol p pre section table tbody td tfoot th thead tr "
    "ul".split()
)


class _Extractor(HTMLParser):
    """Streaming tokenizer → list of (block_text, n_chars, n_anchor_chars)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._parts: list[str] = []
        self._anchor_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self.title_parts: list[str] = []
        self._in_title = False

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, len(text), self._anchor_chars))
        self._parts = []
        self._anchor_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            # <head> may be left unclosed by sloppy markup; HTMLParser
            # still reports </head>, and <br>-style voids never nest.
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self._flush()
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self.title_parts.append(data)
        if self._skip_depth == 0 and data:
            self._parts.append(data)
            if self._anchor_depth > 0:
                self._anchor_chars += len(" ".join(data.split()))


def _parse(html: str) -> _Extractor:
    """ONE tokenizer pass collecting blocks AND title: the extractor
    already gathers ``title_parts`` while streaming, so callers needing
    both must not feed the parser twice (the old ``html_text_blocks`` +
    ``extract_title`` pairing parsed every document twice — pure CPU
    waste on the pipeline's hottest per-row kernel)."""
    p = _Extractor()
    p.feed(html or "")
    p.close()
    p._flush()
    return p


def _title_of(p: _Extractor) -> str | None:
    title = " ".join("".join(p.title_parts).split())
    return title or None


def html_text_blocks(html: str) -> list[tuple[str, int, int]]:
    """Tokenize → [(block_text, n_chars, n_anchor_chars)] (test surface)."""
    return _parse(html).blocks


def extract_title(html: str) -> str | None:
    """The <title> content, whitespace-normalized (None when absent)."""
    return _title_of(_parse(html))


def extract_html_text(
    html: str,
    *,
    drop_boilerplate: bool = False,
    max_link_density: float = 0.5,
    min_block_chars: int = 0,
) -> str:
    """Extract visible text from HTML (see module docstring contract)."""
    blocks = html_text_blocks(html)
    if drop_boilerplate:
        blocks = [
            (t, n, a) for (t, n, a) in blocks
            if n >= min_block_chars and (a / n) <= max_link_density
        ]
    return "\n".join(t for (t, _, _) in blocks)


def html_to_text(
    df: DataFrame,
    *,
    html_col: str = "html",
    id_cols: tuple[str, ...] = ("target_uri",),
    drop_boilerplate: bool = True,
    max_link_density: float = 0.5,
    min_block_chars: int = 0,
) -> DataFrame:
    """Arrow-batched extraction over a DataFrame of HTML strings.

    Emits ``id_cols`` + ``text`` + ``title`` + ``n_blocks_kept`` +
    ``n_blocks_dropped``. Pure per-row kernel — partition-invariant,
    safe to run straight off the WARC scan with no shuffle in between.
    """
    id_cols = tuple(id_cols)
    dtypes = dict(df.dtypes)
    schema = ", ".join(
        [f"{c} {dtypes[c]}" for c in id_cols]
        + ["text string", "title string",
           "n_blocks_kept int", "n_blocks_dropped int"]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, titles, kept, dropped = [], [], [], []
            for raw in pdf[html_col]:
                html = raw if isinstance(raw, str) else ""
                # one tokenizer pass yields blocks AND title (the
                # separate extract_title call re-parsed every document
                # — 2× the kernel's dominant CPU for nothing)
                parsed = _parse(html)
                blocks = parsed.blocks
                if drop_boilerplate:
                    keep = [
                        b for b in blocks
                        if b[1] >= min_block_chars
                        and (b[2] / b[1]) <= max_link_density
                    ]
                else:
                    keep = blocks
                texts.append("\n".join(t for (t, _, _) in keep))
                titles.append(_title_of(parsed))
                kept.append(len(keep))
                dropped.append(len(blocks) - len(keep))
            out = pdf[list(id_cols)].copy()
            out["text"] = texts
            out["title"] = titles
            out["n_blocks_kept"] = kept
            out["n_blocks_dropped"] = dropped
            yield out

    return df.select(*id_cols, html_col).mapInPandas(kernel, schema)
