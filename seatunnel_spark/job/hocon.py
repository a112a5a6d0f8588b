"""HOCON-lite parser — enough of the HOCON surface to run the
reference's job config files unchanged.

Reference config shape: docs/en/concept/config.md:28-70 and
config/v2.batch.config.template. Supported subset: nested objects
(`key { ... }` and `key = { ... }`), arrays, quoted/unquoted scalars,
`#` and `//` comments, triple-quoted strings, dotted keys as literal
keys (job.mode stays "job.mode", matching SeaTunnel's usage), and
`${var}` substitution from a supplied dict (the `-i k=v` CLI feature).

Duplicate keys inside source/transform/sink sections are kept as
separate plugin instances (SeaTunnel semantics), not HOCON-merged.
"""

from __future__ import annotations

import re


class HoconError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>[ \t\r]+)
  | (?P<comment>(\#|//)[^\n]*)
  | (?P<nl>\n)
  | (?P<triple>\"\"\"(?:.|\n)*?\"\"\")
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<subst>\$\{[^}\n]*\})
  | (?P<punct>[{}\[\]=:,])
  | (?P<bare>[^\s{}\[\]=:,#\n"]+)
    """,
    re.X,
)


def _tokenize(text: str) -> tuple[list[str], list[tuple[int, int]]]:
    """Returns (tokens, spans). Commas are real tokens (they terminate
    HOCON value concatenation); spans give source offsets so adjacent
    values concatenate with their original whitespace preserved."""
    tokens: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise HoconError(f"cannot tokenize at: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        tokens.append("\n" if kind == "nl" else m.group())
        spans.append(m.span())
    return tokens, spans


def _unquote(tok: str):
    if tok.startswith('"""'):
        return tok[3:-3]
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\").replace(
            "\\n", "\n"
        ).replace("\\t", "\t")
    return tok


def _scalar(tok: str):
    if tok.startswith('"'):
        return _unquote(tok)
    low = tok.lower()
    if low in ("true", "on", "yes"):
        return True
    if low in ("false", "off", "no"):
        return False
    if low in ("null", "none"):
        return None
    if re.fullmatch(r"[+-]?\d+", tok):
        return int(tok)
    if re.fullmatch(r"[+-]?\d*\.\d+([eE][+-]?\d+)?", tok) or re.fullmatch(
        r"[+-]?\d+[eE][+-]?\d+", tok
    ):
        return float(tok)
    return tok


class _Parser:
    # Sections whose children are plugin instances: duplicates allowed.
    PLUGIN_SECTIONS = ("source", "transform", "sink")

    # Separators skipped by default lookahead: newlines and commas both
    # end an entry/element; commas additionally terminate value
    # concatenation (handled by raw lookahead in _parse_value).
    _SEPS = ("\n", ",")

    def __init__(self, tokens: list[str], variables: dict | None = None,
                 spans: list[tuple[int, int]] | None = None, src: str = ""):
        self.toks = tokens
        self.spans = spans or [(0, 0)] * len(tokens)
        self.src = src
        self.i = 0
        self.vars = variables or {}

    def _peek(self, skip_nl: bool = True):
        j = self.i
        while j < len(self.toks) and skip_nl and self.toks[j] in self._SEPS:
            j += 1
        return self.toks[j] if j < len(self.toks) else None

    def _next(self, skip_nl: bool = True):
        while self.i < len(self.toks) and skip_nl and self.toks[self.i] in self._SEPS:
            self.i += 1
        if self.i >= len(self.toks):
            raise HoconError("unexpected end of input")
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def _substitute(self, value):
        if isinstance(value, str) and "${" in value:
            def repl(m):
                name = m.group(1)
                if name in self.vars:
                    return str(self.vars[name])
                # Unknown placeholders stay literal: typesafe-config
                # does not substitute inside quoted strings, and
                # downstream consumers resolve their own (e.g.
                # MicrosoftModel's ${model} in api_path,
                # llm_microsoft_transform.conf:52).
                return m.group(0)
            return re.sub(r"\$\{([^}]+)\}", repl, value)
        return value

    def parse_root(self) -> dict:
        root: dict = {}
        while self._peek() is not None:
            self._parse_entry(root, plugin_list_parent=True)
        return root

    def _parse_entry(self, obj: dict, plugin_list_parent: bool = False) -> None:
        key_tok = self._next()
        if key_tok in ("{", "[", "=", ":", "}"):
            raise HoconError(f"expected key, got {key_tok!r}")
        key = _unquote(key_tok)
        nxt = self._peek()
        if nxt == "{":
            self._next()
            value = self._parse_object(
                as_plugin_section=(plugin_list_parent and key in self.PLUGIN_SECTIONS)
            )
        elif nxt in ("=", ":"):
            self._next()
            value = self._parse_value(
                as_plugin_section=(plugin_list_parent and key in self.PLUGIN_SECTIONS)
            )
        else:
            raise HoconError(f"expected '=' or '{{' after key {key!r}, got {nxt!r}")
        if key in obj and isinstance(obj[key], dict) and isinstance(value, dict):
            obj[key].update(value)  # HOCON object merge
        else:
            obj[key] = value

    def _parse_value(self, as_plugin_section: bool = False):
        tok = self._peek()
        if tok == "{":
            self._next()
            return self._parse_object(as_plugin_section=as_plugin_section)
        if tok == "[":
            self._next()
            return self._parse_array()
        first = self._next()
        # HOCON value concatenation: scalar tokens adjacent on the same
        # line (no comma/newline between) join into ONE string, keeping
        # the original inter-token whitespace. This is how the
        # reference's e2e confs embed JSON in templates
        # (json_path_basic_type_test.conf:30: the JSON's own quotes
        # alternate HOCON string boundaries).
        parts = [first]
        while (self.i < len(self.toks)
               and self.toks[self.i] not in ("\n", ",", "{", "[", "]", "}",
                                             "=", ":")):
            gap = self.src[self.spans[self.i - 1][1]: self.spans[self.i][0]]
            parts.append(gap.replace("\r", ""))
            parts.append(self.toks[self.i])
            self.i += 1
        if len(parts) == 1:
            return self._substitute(_scalar(first))
        return self._substitute("".join(
            _unquote(p) if k % 2 == 0 else p for k, p in enumerate(parts)))

    def _parse_object(self, as_plugin_section: bool = False):
        """Parse until matching '}'. In plugin sections, children become a
        list of {plugin_name, **options} dicts, preserving duplicates."""
        if as_plugin_section:
            plugins: list[dict] = []
            while True:
                if self._peek() == "}":
                    self._next()
                    return plugins
                name_tok = self._next()
                name = _unquote(name_tok)
                nxt = self._peek()
                if nxt == "{":
                    self._next()
                    body = self._parse_object()
                elif nxt in ("=", ":"):
                    self._next()
                    body = self._parse_value()
                else:
                    raise HoconError(f"expected plugin block after {name!r}")
                if not isinstance(body, dict):
                    raise HoconError(f"plugin {name!r} must be an object")
                plugins.append({"plugin_name": name, **body})
        obj: dict = {}
        while True:
            if self._peek() == "}":
                self._next()
                return obj
            self._parse_entry(obj)

    def _parse_array(self):
        items = []
        while True:
            tok = self._peek()
            if tok == "]":
                self._next()
                return items
            items.append(self._parse_value())


# `-i key=value` placeholders: ${name} and ${name:default}
# (docs/en/concept/config.md:236-320). The reference substitutes
# TEXTUALLY before parsing — `-i strTemplate=[abc,def]` turns
# `string.template = ${strTemplate}` into an array literal — so the
# replacement happens on the source text, not on parsed values.
# Unset variables without a default stay literal (config.md:230 "the
# value of the variable will be retained"), which also preserves
# downstream-resolved placeholders like ES dynamic indexes or the
# MicrosoftModel ${model} api_path.
_VAR_RE = re.compile(r"\$\{([A-Za-z_][\w.-]*)(?::([^}\n]*))?\}")


def substitute_variables(text: str, variables: dict | None) -> str:
    variables = variables or {}

    def repl(m):
        name, default = m.group(1), m.group(2)
        if name in variables:
            return str(variables[name])
        if default is not None:
            return default
        return m.group(0)

    return _VAR_RE.sub(repl, text)


def parse_hocon(text: str, variables: dict | None = None) -> dict:
    """Parse a HOCON job config into the dict shape JobSpec.from_dict takes."""
    text = substitute_variables(text, variables)
    tokens, spans = _tokenize(text)
    return _Parser(tokens, variables, spans=spans, src=text).parse_root()


def load_hocon(path: str, variables: dict | None = None) -> dict:
    with open(path) as f:
        return parse_hocon(f.read(), variables)
