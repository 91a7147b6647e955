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
