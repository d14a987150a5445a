"""Minimal HOCON parser — no third-party dependency.

Covers the subset the reference's config files actually use
(config.aws.reference.hocon, config.aws.minimal.hocon, reference.conf,
golden cases AwsConfigSpec.scala:50-75):

  - '#' and '//' comments
  - objects with optional ':'/'=' separators and optional commas
    (including `"key" { ... }` with no separator)
  - quoted and unquoted keys (unquoted dotted keys create nested paths)
  - arrays, booleans, null, ints, floats, quoted strings (incl. escapes),
    unquoted strings running to end-of-line ("1 minute" style durations)
  - duplicate keys: objects deep-merge, scalars last-wins
  - ${path} and ${?path} substitutions, resolved against the document root
    first, then the environment; optional substitutions that resolve to
    nothing leave the previous value in place (or omit the field), exactly
    the `"accept": ${?ACCEPT_LIMITED_USE_LICENSE}` fallback idiom in the
    reference's reference.conf
  - `"key": ${sub}` followed by `"key": {...}` object-merge-over-substitution
  - include "relative/path.conf" (merged into the enclosing object)

It is intentionally NOT a full HOCON implementation (no triple-quoted
strings, no +=, no string/value concatenation with substitutions inside one
value) — each unsupported construct fails loudly rather than misparsing.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Mapping
from dataclasses import dataclass
from typing import Any


class HoconError(ValueError):
    pass


_MISSING = object()


@dataclass
class _Sub:
    path: str
    optional: bool


@dataclass
class _Fallback:
    """Optional substitution layered over an earlier value for the same key."""

    sub: _Sub
    previous: Any  # _MISSING if the key had no earlier value


@dataclass
class _ObjMerge:
    """`key: ${sub}` then `key: {...}` — the object merges over the
    resolved substitution."""

    sub: _Sub
    over: dict


class _Parser:
    def __init__(self, text: str, base_dir: str | None = None):
        self.t = text
        self.i = 0
        self.n = len(text)
        self.base_dir = base_dir

    # ---- low-level ----

    def _skip_ws(self, newlines: bool = True) -> None:
        while self.i < self.n:
            c = self.t[self.i]
            if c == "#" or self.t.startswith("//", self.i):
                while self.i < self.n and self.t[self.i] != "\n":
                    self.i += 1
            elif c in " \t\r" or (newlines and c == "\n"):
                self.i += 1
            else:
                return

    def _peek(self) -> str:
        return self.t[self.i] if self.i < self.n else ""

    def _err(self, msg: str) -> HoconError:
        line = self.t.count("\n", 0, self.i) + 1
        return HoconError(f"{msg} at line {line}")

    # ---- entry ----

    def parse(self) -> dict:
        self._skip_ws()
        if self._peek() == "{":
            obj = self._object()
        else:
            # braces-omitted root object
            obj = self._object(root_without_braces=True)
        self._skip_ws()
        if self.i < self.n:
            raise self._err(f"trailing content {self.t[self.i:self.i+20]!r}")
        return obj

    # ---- productions ----

    def _object(self, root_without_braces: bool = False) -> dict:
        out: dict = {}
        if not root_without_braces:
            assert self._peek() == "{"
            self.i += 1
        while True:
            self._skip_ws()
            if self.i >= self.n:
                if root_without_braces:
                    return out
                raise self._err("unterminated object")
            c = self._peek()
            if c == "}":
                if root_without_braces:
                    raise self._err("unexpected '}'")
                self.i += 1
                return out
            if c == ",":
                self.i += 1
                continue
            if self.t.startswith("include", self.i) and self.base_dir is not None:
                save = self.i
                self.i += len("include")
                self._skip_ws(newlines=False)
                if self._peek() == '"':
                    inc_path = self._quoted_string()
                    # parse WITHOUT resolving: the included file's
                    # substitutions resolve against the includer's final
                    # root (typesafe-config include semantics)
                    full = os.path.join(self.base_dir, inc_path)
                    with open(full) as f:
                        included = _Parser(
                            f.read(), base_dir=os.path.dirname(full)
                        ).parse()
                    for k, v in included.items():
                        _assign(out, k, v)
                    continue
                self.i = save  # an actual key named include*
            keys = self._key()
            self._skip_ws(newlines=False)
            c = self._peek()
            if c in ":=":
                self.i += 1
                self._skip_ws(newlines=False)
                val = self._value()
            elif c == "{":
                val = self._object()
            else:
                raise self._err(f"expected ':', '=' or '{{' after key {'.'.join(keys)!r}")
            node = out
            for k in keys[:-1]:
                nxt = node.get(k)
                if not isinstance(nxt, dict):
                    nxt = {}
                    node[k] = nxt
                node = nxt
            _assign(node, keys[-1], val)

    def _key(self) -> list[str]:
        if self._peek() == '"':
            return [self._quoted_string()]
        m = re.match(r"[A-Za-z0-9_\-.]+", self.t[self.i :])
        if not m:
            raise self._err(f"expected key, found {self.t[self.i:self.i+10]!r}")
        self.i += m.end()
        return m.group(0).split(".")

    def _quoted_string(self) -> str:
        assert self._peek() == '"'
        j = self.i + 1
        buf = []
        while j < self.n:
            c = self.t[j]
            if c == "\\":
                esc = self.t[j : j + 2]
                buf.append(json.loads(f'"{esc}"'))
                j += 2
            elif c == '"':
                self.i = j + 1
                return "".join(buf)
            else:
                buf.append(c)
                j += 1
        raise self._err("unterminated string")

    def _value(self) -> Any:
        c = self._peek()
        if c == "{":
            return self._object()
        if c == "[":
            return self._array()
        if c == '"':
            return self._quoted_string()
        if self.t.startswith("${", self.i):
            end = self.t.find("}", self.i)
            if end < 0:
                raise self._err("unterminated substitution")
            body = self.t[self.i + 2 : end].strip()
            self.i = end + 1
            optional = body.startswith("?")
            return _Sub(body[1:].strip() if optional else body, optional)
        # unquoted value: runs to end of line / ',' / '}' / ']' / comment
        j = self.i
        while j < self.n and self.t[j] not in "\n,}]#":
            if self.t.startswith("//", j):
                break
            j += 1
        rawv = self.t[self.i : j].strip()
        self.i = j
        if not rawv:
            raise self._err("empty value")
        return _scalar(rawv)

    def _array(self) -> list:
        assert self._peek() == "["
        self.i += 1
        out = []
        while True:
            self._skip_ws()
            if self.i >= self.n:
                raise self._err("unterminated array")
            c = self._peek()
            if c == "]":
                self.i += 1
                return out
            if c == ",":
                self.i += 1
                continue
            out.append(self._value())


def _scalar(s: str) -> Any:
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "null":
        return None
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    try:
        return float(s)
    except ValueError:
        return s


def _assign(node: dict, key: str, val: Any) -> None:
    """HOCON duplicate-key semantics."""
    prev = node.get(key, _MISSING)
    if isinstance(val, dict) and isinstance(prev, dict):
        node[key] = _deep_merge(prev, val)
    elif isinstance(val, dict) and isinstance(prev, _Sub):
        node[key] = _ObjMerge(prev, val)
    elif isinstance(val, _Sub) and val.optional:
        node[key] = _Fallback(val, prev)
    else:
        node[key] = val


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _lookup(root: dict, dotted: str) -> Any:
    node: Any = root
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return _MISSING
        node = node[part]
    return node


def _fully_resolved(v: Any) -> bool:
    if isinstance(v, (_Sub, _Fallback, _ObjMerge)):
        return False
    if isinstance(v, dict):
        return all(_fully_resolved(x) for x in v.values())
    if isinstance(v, list):
        return all(_fully_resolved(x) for x in v)
    return True


def _resolve_sub(sub: _Sub, root: dict, env: Mapping[str, str]) -> Any:
    hit = _lookup(root, sub.path)
    if hit is not _MISSING and _fully_resolved(hit):
        return hit
    if sub.path in env:
        return _scalar(env[sub.path])
    return _MISSING


def _resolve_pass(node: Any, root: dict, env: Mapping[str, str]) -> tuple[Any, bool]:
    """One substitution pass. Returns (new_node, made_progress)."""
    if isinstance(node, _Sub):
        v = _resolve_sub(node, root, env)
        if v is _MISSING:
            if node.optional:
                return _MISSING, True
            return node, False
        return v, True
    if isinstance(node, _Fallback):
        v = _resolve_sub(node.sub, root, env)
        if v is not _MISSING:
            return v, True
        return (node.previous, True)  # unresolved optional -> earlier value
    if isinstance(node, _ObjMerge):
        v = _resolve_sub(node.sub, root, env)
        if v is _MISSING:
            return node, False
        if not isinstance(v, dict):
            raise HoconError(f"substitution ${{{node.sub.path}}} is not an object")
        return _deep_merge(v, node.over), True
    if isinstance(node, dict):
        progress = False
        out = {}
        for k, v in node.items():
            nv, p = _resolve_pass(v, root, env)
            progress = progress or p
            if nv is not _MISSING:
                out[k] = nv
        return out, progress
    if isinstance(node, list):
        progress = False
        out_l = []
        for v in node:
            nv, p = _resolve_pass(v, root, env)
            progress = progress or p
            if nv is not _MISSING:
                out_l.append(nv)
        return out_l, progress
    return node, False


def _find_unresolved(node: Any) -> list[str]:
    if isinstance(node, _Sub):
        return [node.path]
    if isinstance(node, (_Fallback,)):
        return [node.sub.path]
    if isinstance(node, _ObjMerge):
        return [node.sub.path]
    if isinstance(node, dict):
        return [p for v in node.values() for p in _find_unresolved(v)]
    if isinstance(node, list):
        return [p for v in node for p in _find_unresolved(v)]
    return []


def loads(text: str, env: Mapping[str, str] | None = None, base_dir: str | None = None) -> dict:
    """Parse HOCON text to a plain dict, substitutions resolved."""
    env = os.environ if env is None else env
    tree = _Parser(text, base_dir=base_dir).parse()
    for _ in range(20):
        tree, progress = _resolve_pass(tree, tree, env)
        if _fully_resolved(tree):
            return tree
        if not progress:
            break
    missing = sorted(set(_find_unresolved(tree)))
    raise HoconError(f"could not resolve substitution(s): {', '.join(missing)}")


def load(path: str, env: Mapping[str, str] | None = None) -> dict:
    with open(path) as f:
        return loads(f.read(), env=env, base_dir=os.path.dirname(os.path.abspath(path)))
