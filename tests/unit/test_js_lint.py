"""Syntax-rot guard for the JS surfaces (no JS runtime in this image).

node/emcc are absent (VERDICT r2 missing #1/#2), so the .mjs files cannot
be executed here. This is the committed lint mitigation: a small JS
tokenizer (comments, strings, template literals with ${} nesting, regex
literals) that verifies every bindings .mjs file has balanced brackets,
no unterminated strings/comments, and still exports the symbols its tests
and consumers import. Catches merge-conflict markers, truncated files and
structural typos — the failure classes an unexecuted file actually rots
into.
"""
from __future__ import annotations

import re
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[2]
MJS_FILES = sorted((ROOT / "bindings").rglob("*.mjs")) + \
    sorted((ROOT / "examples").glob("*.mjs"))

# tokens that can directly precede a regex literal (otherwise `/` = divide)
_REGEX_PRECEDERS = set("=([{,;:!&|?+-*%^~<>")
_REGEX_KEYWORDS = {"return", "typeof", "instanceof", "in", "of", "new",
                   "delete", "void", "throw", "case", "do", "else", "yield",
                   "await"}


def strip_js(src: str, path: str) -> str:
    """Return src with comments/strings/regexes blanked (newlines kept),
    raising AssertionError on unterminated constructs."""
    out = []
    i, n = 0, len(src)
    last_word = ""
    last_sig = ""  # last significant (non-space) char emitted

    def _line(pos):
        return src.count("\n", 0, pos) + 1

    while i < n:
        ch = src[i]
        nxt = src[i + 1] if i + 1 < n else ""
        if ch == "/" and nxt == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if ch == "/" and nxt == "*":
            j = src.find("*/", i + 2)
            assert j >= 0, f"{path}:{_line(i)}: unterminated block comment"
            out.append("\n" * src.count("\n", i, j))
            i = j + 2
            continue
        if ch in "'\"":
            j = i + 1
            while j < n and src[j] != ch:
                if src[j] == "\\":
                    j += 1
                elif src[j] == "\n":
                    raise AssertionError(
                        f"{path}:{_line(i)}: unterminated string")
                j += 1
            assert j < n, f"{path}:{_line(i)}: unterminated string"
            out.append('""')
            last_sig = '"'
            i = j + 1
            continue
        if ch == "`":
            # template literal: blank it but keep ${...} contents for
            # bracket balancing (recursion depth via brace counting)
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "`":
                    break
                if src[j] == "$" and j + 1 < n and src[j + 1] == "{":
                    depth = 1
                    k = j + 2
                    while k < n and depth:
                        if src[k] == "{":
                            depth += 1
                        elif src[k] == "}":
                            depth -= 1
                        elif src[k] in "'\"`":
                            q = src[k]
                            k += 1
                            while k < n and src[k] != q:
                                k += 2 if src[k] == "\\" else 1
                        k += 1
                    assert depth == 0, (
                        f"{path}:{_line(j)}: unterminated ${{}} interpolation")
                    j = k
                    continue
                j += 1
            assert j < n, f"{path}:{_line(i)}: unterminated template literal"
            out.append('""' + "\n" * src.count("\n", i, j))
            last_sig = '"'
            i = j + 1
            continue
        if ch == "/":
            starts_regex = (
                last_sig in _REGEX_PRECEDERS
                or last_sig == ""
                or last_word in _REGEX_KEYWORDS
            )
            if starts_regex:
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 1
                    elif src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        raise AssertionError(
                            f"{path}:{_line(i)}: unterminated regex")
                    j += 1
                assert j < n, f"{path}:{_line(i)}: unterminated regex"
                while j + 1 < n and src[j + 1].isalpha():
                    j += 1  # flags
                out.append('""')
                last_sig = '"'
                i = j + 1
                continue
        out.append(ch)
        if not ch.isspace():
            last_sig = ch
            if ch.isalnum() or ch in "_$":
                last_word += ch
            else:
                last_word = ""
        elif last_word and not (ch.isalnum() or ch in "_$"):
            # keep last_word across one space boundary for `return /.../`
            pass
        i += 1
    return "".join(out)


@pytest.mark.parametrize("path", MJS_FILES, ids=lambda p: str(p.relative_to(ROOT)))
def test_mjs_brackets_balanced(path):
    src = path.read_text()
    assert "<<<<<<<" not in src and ">>>>>>>" not in src, "conflict markers"
    stripped = strip_js(src, str(path))
    pairs = {")": "(", "]": "[", "}": "{"}
    stack = []
    for idx, ch in enumerate(stripped):
        if ch in "([{":
            stack.append((ch, idx))
        elif ch in ")]}":
            line = stripped.count("\n", 0, idx) + 1
            assert stack, f"{path}:{line}: unmatched {ch}"
            top, _ = stack.pop()
            assert top == pairs[ch], f"{path}:{line}: mismatched {ch}"
    assert not stack, (
        f"{path}: unclosed {stack[-1][0]} at line "
        f"{stripped.count(chr(10), 0, stack[-1][1]) + 1}"
    )


def _exports(path: Path) -> set:
    src = strip_js(path.read_text(), str(path))
    names = set(re.findall(
        r"export\s+(?:default\s+)?(?:class|function|const|let|var)\s+(\w+)",
        src))
    names |= set(re.findall(r"export\s+default\s+(\w+)\s*;", src))
    for grp in re.findall(r"export\s*\{([^}]*)\}", src):
        for item in grp.split(","):
            item = item.strip()
            if item:
                names.add(item.split(" as ")[-1].strip())
    return names


def _class_body(src: str, header_re: str, cls: str, path) -> str:
    """Balanced-brace class body (stripped source: no strings/comments)."""
    m = re.search(header_re, src)
    assert m, f"{path}: class {cls} not found"
    start = src.index("{", m.end() - 1)
    depth = 0
    for i in range(start, len(src)):
        if src[i] == "{":
            depth += 1
        elif src[i] == "}":
            depth -= 1
            if depth == 0:
                return src[start + 1: i]
    raise AssertionError(f"{path}: unbalanced class body for {cls}")


def _depth1_members(body: str) -> set:
    """Identifiers followed by '(' or '<' at class-member depth (brace
    depth 0 within the body) — method definitions, not calls in bodies."""
    names = set()
    depth = 0
    i = 0
    while i < len(body):
        ch = body[i]
        if ch in "{([":
            depth += 1
        elif ch in "})]":
            depth -= 1
        elif depth == 0 and (ch.isalpha() or ch == "_"):
            # skip identifiers in type position (after ':', '|', '<', ',')
            p = i - 1
            while p >= 0 and body[p] in " \t\n":
                p -= 1
            if p >= 0 and body[p] in ":|<,>":
                j = i
                while j < len(body) and (body[j].isalnum() or body[j] in "_$"):
                    j += 1
                i = j
                continue
            j = i
            while j < len(body) and (body[j].isalnum() or body[j] in "_$"):
                j += 1
            word = body[i:j]
            k = j
            while k < len(body) and body[k] in " \t\n":
                k += 1
            if k < len(body) and body[k] in "(<":
                names.add(word)
            i = j
            continue
        i += 1
    return names


_MODIFIERS = {"static", "async", "get", "set", "constructor", "super",
              "if", "for", "while", "switch", "catch", "return"}


def _mjs_methods(path: Path, cls: str) -> set:
    src = strip_js(path.read_text(), str(path))
    body = _class_body(src, rf"class {cls}\b[^{{]*", cls, path)
    return {n for n in _depth1_members(body)
            if not n.startswith("_") and n not in _MODIFIERS}


def _dts_methods(path: Path, cls: str) -> set:
    src = strip_js(path.read_text(), str(path))
    body = _class_body(src, rf"declare class {cls}\b[^{{]*", cls, path)
    return {n for n in _depth1_members(body)
            if not n.startswith("_") and n not in _MODIFIERS}


@pytest.mark.parametrize("mjs,dts,cls", [
    ("bindings/node/index.mjs", "bindings/node/index.d.ts", "VectorDBSession"),
    ("bindings/js/client.mjs", "bindings/js/client.d.ts", "VectorDbClient"),
    ("bindings/js/client.mjs", "bindings/js/client.d.ts", "SearchBuilder"),
])
def test_dts_matches_implementation(mjs, dts, cls):
    """The shipped .d.ts is the SDK contract (reference ships generated
    declarations, bindings/node/index.d.ts:107-242); it must not drift from
    the implementation."""
    impl = _mjs_methods(ROOT / mjs, cls)
    decl = _dts_methods(ROOT / dts, cls)
    assert decl <= impl, f"{cls}: declared but unimplemented {decl - impl}"
    assert impl <= decl, f"{cls}: implemented but undeclared {impl - decl}"


def test_expected_exports_present():
    """The symbols consumers import must stay exported (the wire the tests
    and reference SDK users depend on)."""
    want = {
        "bindings/wasm/index.mjs": {"FvdbEmbedded", "SearchFilter"},
        "bindings/wasm/kernels.mjs": {"FvdbKernels"},
        "bindings/wasm/kernels-index.mjs": {
            "InMemoryIndex", "SearchFilter", "VideoSimilarityIndex",
            "VideoRecommender", "VideoClustering"},
        "bindings/wasm/vector.mjs": {
            "Vector", "VectorBatch", "bindKernels", "cosineSimilarity",
            "euclideanDistance", "cosineSimilaritySimd"},
        "bindings/js/client.mjs": {"VectorDbClient"},
        "bindings/node/index.mjs": {"VectorDBSession"},
    }
    for rel, expected in want.items():
        p = ROOT / rel
        assert p.exists(), f"{rel} missing"
        got = _exports(p)
        assert expected <= got, f"{rel}: missing exports {expected - got}"
