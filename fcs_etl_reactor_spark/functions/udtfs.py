"""Python UDTFs (SURVEY.md §2.12 U5) — table-generating functions.

UDTFs are the lateral-view escape hatch: one input row → many output
rows with arbitrary Python logic. Used sparingly (explode+transform
covers most shapes JVM-side); the canonical use here is n-gram
expansion with per-gram metadata that would otherwise take several
chained higher-order functions.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="gram STRING, start_pos INT, n INT")
class NGramExpander:
    """Emit all word n-grams (n in [n_lo, n_hi]) of a text with their
    starting token position — the shingle generator as a UDTF."""

    def eval(self, text: str, n_lo: int, n_hi: int):  # noqa: D102
        if not text:
            return
        toks = [t for t in text.split(" ") if t]
        for n in range(n_lo, n_hi + 1):
            for i in range(len(toks) - n + 1):
                yield (" ".join(toks[i : i + n]), i, n)


@udtf(returnType="key STRING, value STRING")
class TextSegmentParser:
    """Parse an FCS-style delimiter-separated TEXT segment string into
    key/value rows (first char is the delimiter; doubled delimiter
    escapes a literal)."""

    def eval(self, segment: str):  # noqa: D102
        if not segment or len(segment) < 2:
            return
        delim = segment[0]
        body = segment[1:]
        if body.endswith(delim):
            body = body[:-1]
        sentinel = "\x00ESC\x00"
        parts = [
            p.replace(sentinel, delim)
            for p in body.replace(delim + delim, sentinel).split(delim)
        ]
        for i in range(0, len(parts) - 1, 2):
            yield (parts[i].strip().upper(), parts[i + 1])
