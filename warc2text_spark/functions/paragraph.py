"""Paragraph identification (bilangwriter.cc:156-169).

Split on ``\\n`` keeping empty fields, drop trailing empties, then suffix
each line with ``\\t{i+1}:{n}`` and ``\\n``-join.
"""

from __future__ import annotations


def paragraph_id(text: str) -> str:
    lines = text.split("\n")
    while lines and lines[-1] == "":
        lines.pop()
    n = len(lines)
    return "".join(f"{line}\t{i + 1}:{n}\n" for i, line in enumerate(lines))
