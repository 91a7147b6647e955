"""processor_grok — multi-pattern grok field extraction.

Reference: plugins/processor/grok/processor_grok.go
  * config :41-58 — CustomPatterns/CustomPatternDir, SourceKey
    (default "content"), Match list, timeout + error flags;
  * match loop :147-193 — patterns tried in Match order; the FIRST
    pattern yielding >=1 non-empty named capture wins; ALL occurrences
    of that pattern contribute captures (repeated aliases -> last
    value wins in our map model);
  * keep-source :128-139 — success && !KeepSource removes the source
    field; failure && !IgnoreParseFailure removes it too; rows are
    never dropped;
  * defaults :360-375 — KeepSource=true, IgnoreParseFailure=true.

Spark mapping: grok exprs are compiled ONCE on the driver
(functions/grok.compile_grok) to plain-regex source + group tables;
executors receive the source strings and compile/cache per process.
The per-row loop runs as a fusable pandas stage (one Arrow pass even
when chained with other python processors).

Per-record timeout: the reference bounds pathological regex
backtracking with a 100 ms wall-clock per-log timeout
(TimeoutMilliSeconds, processor_grok.go:46,148-158). When the PyPI
``regex`` module is present (it is in this image) the same guard runs
here — patterns compile under ``regex`` and every scan passes
``timeout=TimeoutMilliSeconds/1000``; a timed-out record is treated
as unmatched, the reference's timeout-and-alarm path. Without the
module the scan falls back to stdlib ``re`` (unbounded) and the
plan-build-time pattern validation is the only guard.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, ClassVar

from ilogtail_spark.functions.grok import compile_grok
from ilogtail_spark.functions.recache import (
    HAS_REGEX_MODULE,
    compile_cached,
    findall_matches_bounded,
    pattern_may_backtrack,
)
from ilogtail_spark.model import CONTENT_KEY
from ilogtail_spark.operators.base import PandasFieldsProcessor, register


@register
@dataclass
class ProcessorGrok(PandasFieldsProcessor):
    TYPE: ClassVar[str] = "processor_grok"

    Match: list = dc_field(default_factory=list)
    CustomPatterns: dict = dc_field(default_factory=dict)
    SourceKey: str = CONTENT_KEY
    KeepSource: bool = True
    IgnoreParseFailure: bool = True
    NoKeyError: bool = False
    NoMatchError: bool = False
    TimeoutMilliSeconds: int = 100  # accepted; see divergence note
    TimeoutError: bool = False

    def __post_init__(self):
        if not self.Match:
            raise ValueError("processor_grok: Match must be non-empty")
        # driver-side compile: grok -> (regex source, group table)
        self._compiled = [
            compile_grok(expr, self.CustomPatterns) for expr in self.Match
        ]

    def make_fn(self) -> Callable[[dict], dict | None]:
        compiled = list(self._compiled)
        src = self.SourceKey
        keep_src = self.KeepSource
        ignore_fail = self.IgnoreParseFailure
        # the bounded engine costs ~3x per scan, so it is enabled
        # PER PATTERN, only where the static nested-quantifier check
        # says backtracking can actually blow up
        base_timeout = (
            self.TimeoutMilliSeconds / 1000.0
            if self.TimeoutMilliSeconds and HAS_REGEX_MODULE
            else None
        )
        timeouts = [
            base_timeout if base_timeout and pattern_may_backtrack(source) else None
            for source, _ in compiled
        ]

        def fn(d: dict) -> dict:
            val = d.get(src)
            if val is None:
                return d
            captured: dict | None = None
            for (source, groups), t_sec in zip(compiled, timeouts):
                pat = compile_cached(source, prefer_regex_module=t_sec is not None)
                for m in findall_matches_bounded(pat, val, t_sec):
                    gd = m.groupdict()
                    for g, (alias, _t) in groups.items():
                        cap = gd.get(g)
                        if cap:
                            if captured is None:
                                captured = {}
                            captured[alias] = cap
                if captured is not None:
                    break
            ok = captured is not None
            if (ok and not keep_src) or (not ok and not ignore_fail):
                d = {k: v for k, v in d.items() if k != src}
            else:
                d = dict(d)
            if captured:
                d.update(captured)
            return d

        return fn
