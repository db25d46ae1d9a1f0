"""Tokenizer for the GQL surface language.

Covers the token surface of the reference grammar (``src/gql.l`` in
webbery/GQLite): single-quoted strings, integers/reals/``inf``, tagged
literals ``0d<epoch>`` (datetime), ``0b'BASE64'`` (binary), ``0h'geohash'``
(geohash), arrows ``-> <- --``, ``*`` wildcard, ``=>`` lambdas, ``$``-prefixed
operators, identifiers, punctuation.  Pure Python, no third-party deps.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass

from ..errors import GQLParseError


# token kinds
LBRACE, RBRACE, LBRACKET, RBRACKET, LPAREN, RPAREN = (
    "LBRACE", "RBRACE", "LBRACKET", "RBRACKET", "LPAREN", "RPAREN")
COLON, COMMA, SEMI, STAR, DOT = "COLON", "COMMA", "SEMI", "STAR", "DOT"
STRING, INT, FLOAT, DATETIME, BINARY, GEOHASH = (
    "STRING", "INT", "FLOAT", "DATETIME", "BINARY", "GEOHASH")
IDENT, ARROW_R, ARROW_L, DASH2, FATARROW = (
    "IDENT", "ARROW_R", "ARROW_L", "DASH2", "FATARROW")
OP, EOF = "OP", "EOF"  # OP: + - * / = < > ! etc. inside lambda bodies


@dataclass
class Token:
    kind: str
    value: object
    pos: int

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Token({self.kind}, {self.value!r})"


_PUNCT = {
    "{": LBRACE, "}": RBRACE, "[": LBRACKET, "]": RBRACKET,
    "(": LPAREN, ")": RPAREN, ":": COLON, ",": COMMA, ";": SEMI, ".": DOT,
}

_KEYWORD_OPS = {"$lt", "$gt", "$lte", "$gte", "$and", "$or", "$near", "$geometry"}


_ASCII_DIGITS = set("0123456789")


def _is_digit(ch: str) -> bool:
    """ASCII digits only — str.isdigit() accepts unicode digits ('²')
    that int()/float() reject (found by hypothesis fuzzing)."""
    return ch in _ASCII_DIGITS


def _is_ident_start(ch: str) -> bool:
    return ch.isalpha() or ch in "_$" or ord(ch) > 127


def _is_ident_char(ch: str) -> bool:
    return ch.isalnum() or ch in "_$" or ord(ch) > 127


def tokenize(text: str) -> list[Token]:
    """Tokenize a GQL script into a flat token list (EOF-terminated)."""
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in " \t\r\n":
            i += 1
            continue
        if ch == "/" and i + 1 < n and text[i + 1] == "/":  # line comment
            while i < n and text[i] != "\n":
                i += 1
            continue
        if ch == "/" and i + 1 < n and text[i + 1] == "*":  # block comment
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if ch in _PUNCT:
            toks.append(Token(_PUNCT[ch], ch, i))
            i += 1
            continue
        if ch == "*":
            toks.append(Token(STAR, "*", i))
            i += 1
            continue
        if ch == "'":
            val, i = _read_string(text, i)
            toks.append(Token(STRING, val, i))
            continue
        # arrows / dashes / numbers
        if ch == "-":
            nxt = text[i + 1] if i + 1 < n else ""
            if nxt == ">":
                toks.append(Token(ARROW_R, "->", i)); i += 2; continue
            if nxt == "-":
                toks.append(Token(DASH2, "--", i)); i += 2; continue
            if _is_digit(nxt) or (nxt == "." and i + 2 < n
                                  and _is_digit(text[i + 2])):
                tok, i = _read_number(text, i)
                toks.append(tok)
                continue
            toks.append(Token(OP, "-", i)); i += 1; continue
        if ch == "<":
            if i + 1 < n and text[i + 1] == "-":
                toks.append(Token(ARROW_L, "<-", i)); i += 2; continue
            toks.append(Token(OP, "<", i)); i += 1; continue
        if ch == "=":
            if i + 1 < n and text[i + 1] == ">":
                toks.append(Token(FATARROW, "=>", i)); i += 2; continue
            toks.append(Token(OP, "=", i)); i += 1; continue
        if ch in "+/>!":
            toks.append(Token(OP, ch, i)); i += 1; continue
        # tagged literals 0d / 0b / 0h, else plain number
        if _is_digit(ch):
            if ch == "0" and i + 1 < n and text[i + 1] in "dbh":
                tag = text[i + 1]
                if tag == "d" and i + 2 < n and (_is_digit(text[i + 2]) or text[i + 2] == "-"):
                    j = i + 2
                    if text[j] == "-":
                        j += 1
                    while j < n and (_is_digit(text[j]) or text[j] == "."):
                        j += 1
                    raw = text[i + 2:j]
                    toks.append(Token(DATETIME, float(raw) if "." in raw else int(raw), i))
                    i = j
                    continue
                if tag in "bh" and i + 2 < n and text[i + 2] == "'":
                    s, j = _read_string(text, i + 2)
                    if tag == "b":
                        try:
                            toks.append(Token(BINARY, base64.b64decode(s), i))
                        except Exception as exc:
                            raise GQLParseError(f"bad base64 literal at {i}: {exc}") from exc
                    else:
                        toks.append(Token(GEOHASH, s, i))
                    i = j
                    continue
            tok, i = _read_number(text, i)
            toks.append(tok)
            continue
        if _is_ident_start(ch):
            j = i + 1
            while j < n and _is_ident_char(text[j]):
                j += 1
            word = text[i:j]
            if word == "inf":
                toks.append(Token(FLOAT, float("inf"), i))
            else:
                toks.append(Token(IDENT, word, i))
            i = j
            continue
        raise GQLParseError(f"unexpected character {ch!r} at offset {i}")
    toks.append(Token(EOF, None, n))
    return toks


def _read_string(text: str, i: int) -> tuple[str, int]:
    """Read a single-quoted string starting at ``i`` (on the quote).

    Backslash only escapes a quote (``\\'``); otherwise it is literal, matching
    the reference corpus which embeds raw Windows paths.
    """
    out: list[str] = []
    j = i + 1
    n = len(text)
    while j < n:
        ch = text[j]
        if ch == "\\" and j + 1 < n and text[j + 1] == "'":
            out.append("'")
            j += 2
            continue
        if ch == "'":
            return "".join(out), j + 1
        out.append(ch)
        j += 1
    raise GQLParseError(f"unterminated string starting at offset {i}")


def _read_number(text: str, i: int) -> tuple[Token, int]:
    j = i
    n = len(text)
    if text[j] == "-":
        j += 1
    seen_dot = seen_exp = False
    while j < n:
        ch = text[j]
        if _is_digit(ch):
            j += 1
        elif ch == "." and not seen_dot and not seen_exp and j + 1 < n and _is_digit(text[j + 1]):
            seen_dot = True
            j += 1
        elif ch in "eE" and not seen_exp and j + 1 < n and (_is_digit(text[j + 1]) or text[j + 1] in "+-"):
            seen_exp = True
            j += 2
        else:
            break
    raw = text[i:j]
    if not any(_is_digit(c) for c in raw):
        raise GQLParseError(f"malformed number {raw!r} at offset {i}")
    if seen_dot or seen_exp:
        return Token(FLOAT, float(raw), i), j
    return Token(INT, int(raw), i), j
