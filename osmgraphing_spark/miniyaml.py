"""Dependency-free parser for the YAML subset the reference's configs use.

The reference is driven by YAML configs (`osmgraphing --config cfg.yaml`,
/root/reference/src/configs/parsing/mod.rs:86-142 lowers Raw → Proto →
Config) and its resources/*.yaml files exercise exactly this subset:

- block maps (``key: value`` / ``key:`` + indented block)
- block sequences (``- item``, including ``- key:`` map items whose
  remaining keys continue at the item's column, and nested blocks under a
  list-item key, e.g. ``- convert:\\n    from: {...}``)
- inline flow collections: ``{ info: 'NodeId', id: 'node-id' }``, ``[]``
- scalars: single/double-quoted strings, ints, floats, true/false/null/~
- full-line and trailing ``#`` comments (quote-aware)

PyYAML is not available in this environment, so a reference user migrating
their blueprint.yaml needs this shim; it is deliberately strict (tabs,
mixed indent, or unsupported YAML features raise ``MiniYamlError`` instead
of guessing). Anchors/aliases, multi-document streams, block scalars
(``|``/``>``) and flow styles spanning lines are NOT supported — none of
the reference's configs use them.
"""

from __future__ import annotations

import re


class MiniYamlError(ValueError):
    pass


_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")


def _strip_comment(line: str) -> str:
    """Remove a trailing comment, ignoring ``#`` inside quotes."""
    quote = None
    for i, ch in enumerate(line):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "#" and (i == 0 or line[i - 1] in " \t"):
            return line[:i]
    return line


def _scalar(text: str):
    t = text.strip()
    if t == "" or t in ("~", "null", "Null", "NULL"):
        return None
    if len(t) >= 2 and t[0] == t[-1] and t[0] in "'\"":
        return t[1:-1]
    if t in ("true", "True", "TRUE"):
        return True
    if t in ("false", "False", "FALSE"):
        return False
    if _INT_RE.match(t):
        return int(t)
    if _FLOAT_RE.match(t):
        return float(t)
    return t


class _Flow:
    """Recursive-descent parser for one-line flow collections."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def _ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def _fail(self, msg: str):
        raise MiniYamlError(f"{msg} at col {self.i} in flow {self.s!r}")

    def parse(self):
        self._ws()
        v = self._value()
        self._ws()
        if self.i != len(self.s):
            self._fail("trailing characters")
        return v

    def _value(self):
        self._ws()
        if self.i >= len(self.s):
            self._fail("unexpected end")
        ch = self.s[self.i]
        if ch == "{":
            return self._map()
        if ch == "[":
            return self._list()
        if ch in "'\"":
            return self._quoted()
        # bare scalar: up to , } ] or :
        j = self.i
        while j < len(self.s) and self.s[j] not in ",}]:":
            j += 1
        tok = self.s[self.i : j]
        self.i = j
        return _scalar(tok)

    def _quoted(self) -> str:
        q = self.s[self.i]
        j = self.s.find(q, self.i + 1)
        if j < 0:
            self._fail("unterminated quote")
        out = self.s[self.i + 1 : j]
        self.i = j + 1
        return out

    def _map(self) -> dict:
        out: dict = {}
        self.i += 1  # {
        self._ws()
        if self.i < len(self.s) and self.s[self.i] == "}":
            self.i += 1
            return out
        while True:
            self._ws()
            key = (
                self._quoted()
                if self.i < len(self.s) and self.s[self.i] in "'\""
                else self._bare_key()
            )
            self._ws()
            if self.i >= len(self.s) or self.s[self.i] != ":":
                self._fail("expected ':'")
            self.i += 1
            out[key] = self._value()
            self._ws()
            if self.i < len(self.s) and self.s[self.i] == ",":
                self.i += 1
                continue
            if self.i < len(self.s) and self.s[self.i] == "}":
                self.i += 1
                return out
            self._fail("expected ',' or '}'")

    def _bare_key(self) -> str:
        j = self.i
        while j < len(self.s) and self.s[j] not in ":,}]":
            j += 1
        key = self.s[self.i : j].strip()
        if not key:
            self._fail("empty key")
        self.i = j
        return key

    def _list(self) -> list:
        out: list = []
        self.i += 1  # [
        self._ws()
        if self.i < len(self.s) and self.s[self.i] == "]":
            self.i += 1
            return out
        while True:
            out.append(self._value())
            self._ws()
            if self.i < len(self.s) and self.s[self.i] == ",":
                self.i += 1
                continue
            if self.i < len(self.s) and self.s[self.i] == "]":
                self.i += 1
                return out
            self._fail("expected ',' or ']'")


def _parse_value_text(text: str):
    t = text.strip()
    if t.startswith("{") or t.startswith("["):
        return _Flow(t).parse()
    return _scalar(t)


def _split_key(text: str) -> tuple[str, str] | None:
    """Split ``key: rest`` at the first ':' outside quotes that is followed
    by whitespace/EOL (so 'path: /a:b' keys correctly). Returns None if the
    line is not a mapping entry."""
    quote = None
    for i, ch in enumerate(text):
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == ":" and (i + 1 == len(text) or text[i + 1] in " \t"):
            key = text[:i].strip()
            if len(key) >= 2 and key[0] == key[-1] and key[0] in "'\"":
                key = key[1:-1]
            return key, text[i + 1 :].strip()
    return None


class _Lines:
    def __init__(self, text: str):
        self.items: list[tuple[int, str]] = []
        for ln_no, raw in enumerate(text.splitlines(), 1):
            if "\t" in raw[: len(raw) - len(raw.lstrip())]:
                raise MiniYamlError(f"tab indentation at line {ln_no}")
            line = _strip_comment(raw).rstrip()
            if not line.strip():
                continue
            if line.strip() == "---":
                continue
            indent = len(line) - len(line.lstrip())
            self.items.append((indent, line.strip()))
        self.pos = 0

    def peek(self) -> tuple[int, str] | None:
        return self.items[self.pos] if self.pos < len(self.items) else None

    def next(self) -> tuple[int, str]:
        item = self.items[self.pos]
        self.pos += 1
        return item

    def push(self, indent: int, text: str) -> None:
        self.items.insert(self.pos, (indent, text))


def _parse_block(ls: _Lines, indent: int):
    head = ls.peek()
    if head is None or head[0] < indent:
        return None
    if head[1].startswith("- ") or head[1] == "-":
        return _parse_seq(ls, head[0])
    if _split_key(head[1]) is None:
        # plain scalar as a block value (e.g. ``method:`` newline ``averaging``);
        # consecutive plain lines at the same indent fold with a space
        parts = []
        while True:
            nxt = ls.peek()
            if (
                nxt is None
                or nxt[0] != head[0]
                or nxt[1].startswith("- ")
                or nxt[1] == "-"
                or _split_key(nxt[1]) is not None
            ):
                break
            parts.append(ls.next()[1])
        return _scalar(" ".join(parts))
    return _parse_map(ls, head[0])


def _parse_seq(ls: _Lines, indent: int) -> list:
    out: list = []
    while True:
        head = ls.peek()
        if head is None or head[0] != indent or not (
            head[1].startswith("- ") or head[1] == "-"
        ):
            return out
        _, text = ls.next()
        rest = text[1:].lstrip()
        item_col = indent + (len(text) - len(rest))  # column where rest starts
        if not rest:
            nxt = ls.peek()
            if nxt is None or nxt[0] <= indent:
                out.append(None)
            else:
                out.append(_parse_block(ls, nxt[0]))
            continue
        if _split_key(rest) is not None:
            # map item: re-inject the inline first entry at its true column
            ls.push(item_col, rest)
            out.append(_parse_map(ls, item_col))
        else:
            out.append(_parse_value_text(rest))


def _parse_map(ls: _Lines, indent: int) -> dict:
    out: dict = {}
    while True:
        head = ls.peek()
        if head is None or head[0] != indent or head[1].startswith("- ") or head[1] == "-":
            return out
        kv = _split_key(head[1])
        if kv is None:
            raise MiniYamlError(f"expected 'key:' mapping entry, got {head[1]!r}")
        ls.next()
        key, rest = kv
        if key in out:
            raise MiniYamlError(f"duplicate key {key!r}")
        if rest:
            out[key] = _parse_value_text(rest)
            continue
        nxt = ls.peek()
        if nxt is not None and (
            nxt[0] > indent
            or (nxt[0] == indent and (nxt[1].startswith("- ") or nxt[1] == "-"))
        ):
            # nested block; YAML allows a sequence at the SAME indent as its key
            out[key] = _parse_block(ls, nxt[0])
        else:
            out[key] = None


def loads(text: str):
    ls = _Lines(text)
    if ls.peek() is None:
        return None
    value = _parse_block(ls, 0)
    if ls.peek() is not None:
        indent, line = ls.peek()
        raise MiniYamlError(f"unparsed content at indent {indent}: {line!r}")
    return value


def load(path: str):
    with open(path) as f:
        return loads(f.read())
