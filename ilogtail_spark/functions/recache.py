"""Per-executor compiled-regex cache.

The reference compiles each pattern once at plugin Init and reuses it
per record (plugins/processor/regex/regex.go:57). In Spark the plan
ships pattern STRINGS to executors; each executor process compiles on
first use and caches by (module, pattern, flags) across Arrow batches
and tasks.

Prefers the PyPI ``regex`` module when available: several grok
default patterns use lookbehind/atomic groups
(plugins/processor/grok/processor_grok_default_patterns.go) that
stdlib ``re`` rejects ((?>...)); ``regex`` accepts both syntaxes.
"""

from __future__ import annotations

try:  # pragma: no cover - environment probe
    import regex as _re_impl

    HAS_REGEX_MODULE = True
except ImportError:  # pragma: no cover
    import re as _re_impl

    HAS_REGEX_MODULE = False

import re as _stdlib_re

_CACHE: dict[tuple[str, int, bool], object] = {}


def compile_cached(pattern: str, flags: int = 0, prefer_regex_module: bool = False):
    key = (pattern, flags, prefer_regex_module)
    pat = _CACHE.get(key)
    if pat is None:
        impl = _re_impl if prefer_regex_module else _stdlib_re
        try:
            pat = impl.compile(pattern, flags)
        except Exception:
            if impl is _stdlib_re and HAS_REGEX_MODULE:
                pat = _re_impl.compile(pattern, flags)
            else:
                raise
        _CACHE[key] = pat
    return pat


if HAS_REGEX_MODULE:
    # compiled patterns report __module__ == "_regex" (the C core),
    # NOT "regex" — identify by type, never by module-name prefix
    _REGEX_PATTERN_TYPE: type | None = type(_re_impl.compile(""))
else:  # pragma: no cover
    _REGEX_PATTERN_TYPE = None


def _is_regex_module(pat) -> bool:
    return _REGEX_PATTERN_TYPE is not None and isinstance(pat, _REGEX_PATTERN_TYPE)


def pattern_may_backtrack(source: str) -> bool:
    """Static check for the catastrophic-backtracking class that
    matters in practice: an UNBOUNDED quantifier (``* + {n,}``)
    applied to a group whose body itself contains an unbounded
    quantifier — the (a+)+, (\\w*)*, (?:/[...]*)+ shapes behind
    essentially all real-world regex DoS. Callers enable the
    wall-clock-bounded ``regex`` engine only for risky patterns; the
    benign majority keeps the ~3x-faster stdlib scan (measured 479k
    vs 168k scans/s on the grok HTTP pattern). Bounded repeats
    ({2,4}) and plain alternations are NOT flagged; ambiguous
    same-first-set alternations under a star ((a|aa)+) escape this
    check — the per-record timeout is defense-in-depth for the
    dominant class, not a completeness proof."""

    def _unbounded_brace(s: str, j: int) -> bool:
        # s[j] == '{': true for {n,} (no max); false for {n} / {n,m}
        k = s.find("}", j)
        if k == -1:
            return False
        body = s[j + 1 : k]
        return body.endswith(",")

    n = len(source)
    i = 0
    stack: list[bool] = []  # per open group: body has an unbounded quantifier
    risky = False
    while i < n:
        c = source[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":  # character class: skip to unescaped ]
            i += 1
            if i < n and source[i] == "^":
                i += 1
            if i < n and source[i] == "]":
                i += 1
            while i < n and source[i] != "]":
                i += 2 if source[i] == "\\" else 1
            i += 1
            continue
        if c == "(":
            stack.append(False)
        elif c == ")":
            inner = stack.pop() if stack else False
            j = i + 1
            outer_unbounded = j < n and (
                source[j] in "*+" or (source[j] == "{" and _unbounded_brace(source, j))
            )
            if outer_unbounded and inner:
                risky = True
            if stack and (inner or outer_unbounded):
                stack[-1] = True
        elif c in "*+" or (c == "{" and _unbounded_brace(source, i)):
            if stack:
                stack[-1] = True
        i += 1
    return risky


def findall_matches_bounded(pat, value: str, timeout_sec: float | None):
    """All matches of ``pat`` in ``value``, bounded by a per-record
    wall-clock timeout when the ``regex`` module provides one — the
    analog of the reference's per-log TimeoutMilliSeconds guard
    against catastrophic backtracking (processor_grok.go:46,148-158).
    On timeout the record counts as UNMATCHED (empty list), like the
    reference's timeout-and-alarm path. With stdlib ``re`` (no timeout
    support) the scan is unbounded — callers compile with
    ``prefer_regex_module=True`` to get the bounded engine."""
    try:
        if timeout_sec and HAS_REGEX_MODULE and _is_regex_module(pat):
            return list(pat.finditer(value, timeout=timeout_sec))
        return list(pat.finditer(value))
    except TimeoutError:
        return []


def search_bounded(pat, value: str, pos: int, timeout_sec: float | None):
    """``pat.search(value, pos)`` with the same timeout guard; returns
    None on timeout (treat as no-match)."""
    try:
        if timeout_sec and HAS_REGEX_MODULE and _is_regex_module(pat):
            return pat.search(value, pos, timeout=timeout_sec)
        return pat.search(value, pos)
    except TimeoutError:
        return None


def match_bounded(pat, value: str, pos: int, timeout_sec: float | None):
    """``pat.match(value, pos)`` with the same timeout guard; returns
    None on timeout (treat as no-match)."""
    try:
        if timeout_sec and HAS_REGEX_MODULE and _is_regex_module(pat):
            return pat.match(value, pos, timeout=timeout_sec)
        return pat.match(value, pos)
    except TimeoutError:
        return None
