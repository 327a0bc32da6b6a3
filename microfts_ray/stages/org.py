"""Org-mode chunker: faithful port of the reference state machine.

Mirrors /root/reference/fulltext.go:105-201 (forParts / orgPart /
classify): text splits into org elements (headline, block, dynblock,
keyword, drawer, footnote, list item with continuation absorption,
table line, horizontal rule, latex env, blank, paragraph). Paragraphs
accumulate until a non-paragraph line or a blank line flushes them.
Only parts containing at least one gram become chunks (indexOrg,
fts-lmdb.go:546-576) — unlike the line chunker where every line is a
chunk.

Quirks preserved on purpose:
  * HEADLINE tests the UNtrimmed first char ('*' at column 0 only);
  * the latex-env pattern requires a literal newline and therefore
    never matches a single classify() line (same dead branch as the
    reference);
  * list-item absorption walks with the same offset bookkeeping,
    including the `nextEnd == listEnd` early break.
"""

from __future__ import annotations

import re

PARAGRAPH = 0
HEADLINE = 1
BLOCK = 2
DYNBLOCK = 3
KEYWORD = 4
DRAWER = 5
FOOTNOTE = 6
LIST_ITEM = 7
TABLE_LINE = 8
HR = 9
LATEXT_ENV = 10
BLANK = 11

_footnote = re.compile(r"(?i)^[ \t]*\[fn:[^\]]")
_hr = re.compile(r"(?i)^[ \t]*-----+")
_latex_env = re.compile(r"(?i)^[ \t]*\\begin\{.*?\n[ \t]\\end\{")
_drawer = re.compile(r"(?i)^[ \t]*:[a-z0-9_]+[ \t]*:")
_block = re.compile(r"(?i)^[ \t]*#\+begin(_[a-z0-9_]+)")
_dynblock = re.compile(r"(?i)^[ \t]*#\+begin:")
_keyword = re.compile(r"^[ \t]*#\+[a-zA-Z0-9_]+:")
_list_item = re.compile(r"(?i)^([ \t]*[+-]|[ \t]+\*|[ \t]*([0-9]*|[a-z])\.)([ \t]|$)")
_table_line = re.compile(r"(?i)^[ \t]*(\||\+-)")


def classify(cur: str) -> tuple[int, str]:
    """Reference classify (fulltext.go:172-201): (type, block
    terminator or '')."""
    trimmed = cur.lstrip(" \t")
    if trimmed == "":
        return BLANK, ""
    if cur[0] == "*":
        return HEADLINE, ""
    if trimmed[0] == "[" and _footnote.match(trimmed):
        return FOOTNOTE, ""
    if len(trimmed) > 4 and trimmed.startswith("-----") and _hr.match(trimmed):
        return HR, ""
    if len(trimmed) > 7 and trimmed.startswith("\\begin") and _latex_env.match(trimmed):
        return LATEXT_ENV, ""
    if trimmed[0] == ":" and _drawer.match(trimmed):
        return DRAWER, ":end:"
    if len(trimmed) > 2 and trimmed.startswith("#+"):
        m = _block.match(trimmed)
        if m:
            return BLOCK, f"#+end_{m.group(1).lower()}"
        if _dynblock.match(trimmed):
            return DYNBLOCK, "#+end:"
        if _keyword.match(trimmed):
            return KEYWORD, ""
        return PARAGRAPH, ""
    if _list_item.match(trimmed):
        return LIST_ITEM, ""
    if _table_line.match(trimmed):
        return TABLE_LINE, ""
    return PARAGRAPH, ""


def org_part(pos: int, s: str) -> tuple[int, int, int]:
    """Reference orgPart (fulltext.go:114-170): next element
    (type, start, end) scanning from pos."""
    para = pos
    while pos < len(s):
        cur = s[pos:]
        line_end = cur.find("\n")
        if line_end < 0:
            line_end = len(cur)
        typ, block_end = classify(cur[:line_end])
        if typ == LIST_ITEM:
            item = cur[:line_end]
            offset = len(item) - len(item.lstrip(" \t"))
            next_str = cur[line_end:]
            list_end = line_end
            while True:
                next_end = next_str.find("\n")
                if next_end < 0:
                    next_end = len(next_str)
                if next_end == list_end:
                    break
                next_item = next_str[:next_end]
                item_type, _ = classify(next_item)
                if item_type == PARAGRAPH:
                    next_offset = len(next_item) - len(next_item.lstrip(" \t"))
                    if next_offset <= offset:
                        break
                elif item_type != BLANK:
                    break
                list_end += next_end + 1
                if next_end + 1 >= len(next_str):
                    break
                next_str = next_str[next_end + 1 :]
            line_end = list_end
        elif block_end != "":
            # absorb lines until the matching terminator
            while True:
                sub = cur[line_end + 1 :]
                sub_end = sub.find("\n")
                if sub_end < 0:
                    sub_end = len(sub)
                trimmed = sub[:sub_end].strip(" \t").lower()
                line_end += 1 + sub_end
                if line_end >= len(cur) or trimmed == block_end:
                    break
        if typ != PARAGRAPH:
            if para < pos:
                return PARAGRAPH, para, pos
            if typ != BLANK:
                return typ, pos, pos + line_end
            para = pos + line_end + 1
        elif pos - para > 1 and s[pos - 2 : pos] == "\n\n":
            return PARAGRAPH, para, pos
        pos += line_end + 1
    if para < len(s):
        return PARAGRAPH, para, len(s)
    return BLANK, len(s), len(s)


def for_parts(s: str) -> list[tuple[int, int, int, int]]:
    """Reference forParts (fulltext.go:105-113): list of
    (line, type, start, end) with trailing whitespace trimmed from
    end; line is the 1-based line of start."""
    out = []
    pos = 0
    line = 1
    prev = 0
    while pos < len(s):
        typ, start, end = org_part(pos, s)
        line += s.count("\n", prev, start)
        text = s[start:end]
        trimmed_end = end - (len(text) - len(text.rstrip(" \t\n")))
        out.append((line, typ, start, trimmed_end))
        prev = start
        pos = end
    return out


def split_org_parts(content: str) -> list[tuple[int, str]]:
    """indexOrg chunking (fts-lmdb.go:546-576): (start_line, text) for
    every part that yields at least one gram."""
    from ..functions.grams import gram_set

    out = []
    for line, _typ, start, end in for_parts(content):
        text = content[start:end]
        if gram_set(text):
            out.append((line, text))
    return out
