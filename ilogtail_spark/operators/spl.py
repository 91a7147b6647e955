"""processor_spl — a compiler for the reference's SPL pipe language.

Reference: ``core/plugin/processor/ProcessorSPL.cpp:30-96`` runs an
SPL script (``docs/cn/plugins/processor/spl/processor-spl-native.md``)
through a closed external engine; the language itself (SLS SPL) is
publicly documented: ``* | cmd args | cmd args ...`` over the event's
fields, with Presto-style SQL expressions.

Spark mapping: each SPL stage compiles to the EXISTING operator for
that semantic (parse-regexp -> processor_regex, parse-json ->
processor_json, parse-csv -> processor_csv, project* -> the
pick/drop/rename processors) or to a Column expression stage
(where/extend) — i.e. the script is just another front-end to the same
compiled DataFrame plan, which is exactly the "Spark SQL is the SPL
analog" design stance made concrete.

Supported subset (the commands the reference's own examples use):

  ``where <expr>``             keep rows where the SQL expr is true
  ``extend k = <expr>``        add/overwrite field k
  ``project f1, f2``           keep only the listed fields
  ``project-away f1, f2``      drop the listed fields
  ``project-rename new = old`` rename a field
  ``parse-regexp f, 'pat' as a, b``  regex capture groups -> fields
  ``parse-json f``             dynamic JSON flatten of field f
  ``parse-csv f as a, b``      RFC-4180 split of field f
  ``parse-kv f [, 'delim', 'sep']``  key-value split of field f
  ``pack-fields f1, f2 as out``      pack listed fields into JSON out
  ``pack-fields -include='re' as out``  pack regex-matched fields
  ``stats agg(expr) as name, ... [by k1, k2]``  grouped aggregation
      (count/sum/avg/min/max; numeric aggs cast the field to double;
      group keys and results become the new event fields)
  ``sort by f [desc]``         global sort (driver-side presentation)
  ``limit n``                  keep at most n rows

Expressions reference fields by bare name (SPL semantics); the
compiler rewrites identifiers to ``fields['name']`` map lookups before
handing the string to Spark's own SQL parser (``F.expr``), so the full
Spark SQL function surface is available inside where/extend — the
closest public analog of SPL's Presto function set.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, ClassVar

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, TAGS_COL
from ilogtail_spark.operators.base import Processor, build, register

# SQL keywords / literals that must NOT be rewritten as field refs
_SQL_KEYWORDS = {
    "and", "or", "not", "as", "case", "when", "then", "else", "end",
    "null", "like", "rlike", "in", "between", "is", "true", "false",
    "cast", "try_cast", "distinct", "interval", "div", "escape",
    # common type names inside cast(x AS T)
    "double", "float", "int", "integer", "bigint", "smallint",
    "tinyint", "long", "string", "varchar", "boolean", "decimal",
    "date", "timestamp", "binary",
    # niladic SQL functions — valid WITHOUT parentheses in Spark SQL;
    # rewriting them to fields['current_timestamp'] would silently
    # turn a function call into a NULL map lookup. Only the
    # unambiguous current_*/local* names are reserved: `user` and
    # `session_user` are overwhelmingly more likely to be event
    # FIELDS in a log pipeline than niladic calls, so those stay
    # field refs (write current_user for the function). A field
    # genuinely named like a reserved name is spelled explicitly:
    # fields['current_date'].
    "current_timestamp", "current_date", "current_user",
    "current_timezone", "current_catalog", "current_database",
    "current_schema", "localtimestamp",
}

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
# numeric literals MUST be matched before identifiers: without the
# alternative, '1e5' tokenizes as '1' + identifier 'e5' and the
# rewriter splices fields['e5'] into the middle of the number
_TOKEN = re.compile(
    r"""'(?:[^'\\]|\\.)*'      # single-quoted string
      | "(?:[^"\\]|\\.)*"      # double-quoted string
      | 0[xX][0-9A-Fa-f]+      # hex literal
      | (?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?  # int/float/scientific
      | [A-Za-z_][A-Za-z0-9_]*(?:\s*\()?  # identifier, maybe a function call
      | .""",
    re.VERBOSE | re.DOTALL,
)


def rewrite_field_refs(expr: str) -> str:
    """Rewrite bare identifiers to ``fields['<name>']`` map lookups,
    leaving string literals, SQL keywords, and function names (an
    identifier directly followed by ``(``) untouched."""
    out: list[str] = []
    for m in _TOKEN.finditer(expr):
        tok = m.group(0)
        first = tok[0]
        if first in "'\"":
            out.append(tok)
            continue
        if _IDENT.match(tok):
            if tok.endswith("("):  # function call — keep verbatim
                out.append(tok)
                continue
            if tok.lower() in _SQL_KEYWORDS:
                out.append(tok)
                continue
            out.append(f"{FIELDS_COL}['{tok}']")
            continue
        out.append(tok)
    return "".join(out)


def _split_on(s: str, delim: str) -> list[str]:
    """Split on a top-level delimiter character, quotes and
    backslash-escapes respected. One scanner serves both the pipe
    splitter and the argument splitter."""
    parts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 2
                continue
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
            buf.append(c)
        elif c == delim:
            parts.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf).strip())
    return parts


def _split_pipes(script: str) -> list[str]:
    return [p for p in _split_on(script, "|") if p]


def _split_args(s: str) -> list[str]:
    return [p for p in _split_on(s, ",") if p]


def _unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        body = s[1:-1]
        return body.replace("\\" + s[0], s[0])
    return s


class SPLCompileError(ValueError):
    pass


_PARSE_REGEXP = re.compile(
    r"^parse-regexp\s+(\w+)\s*,\s*(.+?)\s+as\s+(.+)$", re.DOTALL | re.IGNORECASE
)
_PARSE_CSV = re.compile(
    r"^parse-csv\s+(\w+)\s+as\s+(.+)$", re.DOTALL | re.IGNORECASE
)
_EXTEND = re.compile(r"^extend\s+(\w+)\s*=\s*(.+)$", re.DOTALL | re.IGNORECASE)
_RENAME = re.compile(
    r"^project-rename\s+(\w+)\s*=\s*(\w+)\s*$", re.IGNORECASE
)
_PACK_FIELDS = re.compile(
    r"^pack-fields\s+(.+?)\s+as\s+(\w+)\s*$", re.DOTALL | re.IGNORECASE
)
_PACK_INCLUDE = re.compile(r"^-include\s*=\s*(.+)$", re.DOTALL | re.IGNORECASE)
_STATS = re.compile(
    r"^stats\s+(.+?)(?:\s+by\s+([\w\s,]+))?$", re.DOTALL | re.IGNORECASE
)
_AGG_SPEC = re.compile(
    r"^(count|sum|avg|min|max)\s*\(\s*(\w*)\s*\)\s+as\s+(\w+)$", re.IGNORECASE
)


def compile_spl(script: str) -> list[Callable[[DataFrame], DataFrame]]:
    """SPL script -> ordered list of DataFrame stages (each either a
    configured Processor's ``apply`` or a small expression stage)."""
    stages: list[Callable[[DataFrame], DataFrame]] = []
    parts = _split_pipes(script)
    if not parts or parts[0].strip() != "*":
        raise SPLCompileError("SPL script must start with '*'")
    for raw in parts[1:]:
        stmt = " ".join(raw.split())
        low = stmt.lower()
        if low.startswith("where "):
            cond = rewrite_field_refs(stmt[6:])
            stages.append(lambda df, c=cond: df.filter(F.expr(c)))
        elif m := _EXTEND.match(stmt):
            key, expr = m.group(1), rewrite_field_refs(m.group(2))
            def _extend(df: DataFrame, k=key, e=expr) -> DataFrame:
                val = F.expr(e).cast("string")
                new = F.when(
                    val.isNotNull(),
                    F.map_concat(
                        F.col(FIELDS_COL), F.create_map(F.lit(k), val)
                    ),
                ).otherwise(F.col(FIELDS_COL))
                return df.withColumn(FIELDS_COL, new)
            stages.append(_extend)
        elif low.startswith("project-away "):
            keys = [k.strip() for k in stmt[13:].split(",") if k.strip()]
            stages.append(build({"Type": "processor_drop", "DropKeys": keys}).apply)
        elif m := _RENAME.match(stmt):
            new, old = m.group(1), m.group(2)
            stages.append(
                build(
                    {
                        "Type": "processor_rename",
                        "SourceKeys": [old],
                        "DestKeys": [new],
                    }
                ).apply
            )
        elif low.startswith("project "):
            keys = [k.strip() for k in stmt[8:].split(",") if k.strip()]
            stages.append(
                build({"Type": "processor_pick_key", "Include": keys}).apply
            )
        elif m := _PARSE_REGEXP.match(stmt):
            field, pat, names = m.group(1), _unquote(m.group(2)), m.group(3)
            keys = [k.strip() for k in names.split(",") if k.strip()]
            stages.append(
                build(
                    {
                        "Type": "processor_regex",
                        "SourceKey": field,
                        "Regex": pat,
                        "Keys": keys,
                        "KeepSource": True,
                    }
                ).apply
            )
        elif low.startswith("parse-json"):
            field = stmt[10:].strip().rstrip(",") or "content"
            stages.append(
                build(
                    {
                        "Type": "processor_json",
                        "SourceKey": field,
                        "KeepSource": True,
                        "IgnoreFirstConnector": True,
                    }
                ).apply
            )
        elif m := _PARSE_CSV.match(stmt):
            field, names = m.group(1), m.group(2)
            keys = [k.strip() for k in names.split(",") if k.strip()]
            stages.append(
                build(
                    {
                        "Type": "processor_csv",
                        "SourceKey": field,
                        "SplitKeys": keys,
                        "KeepSource": True,
                    }
                ).apply
            )
        elif low.startswith("parse-kv"):
            rest = stmt[8:].strip()
            bits = [b.strip() for b in _split_args(rest)]
            field = bits[0] if bits else "content"
            cfg = {
                "Type": "processor_split_key_value",
                "SourceKey": field,
                "KeepSource": True,
            }
            if len(bits) >= 2:
                cfg["Delimiter"] = _unquote(bits[1])
            if len(bits) >= 3:
                cfg["Separator"] = _unquote(bits[2])
            stages.append(build(cfg).apply)
        elif m := _PACK_FIELDS.match(stmt):
            body, dest = m.group(1).strip(), m.group(2)
            if im := _PACK_INCLUDE.match(body):
                inc = _unquote(im.group(1))

                def _pack_inc(df: DataFrame, rx_=inc, d=dest) -> DataFrame:
                    # dynamic key set: regex filter over the map keys;
                    # packed keys are REMOVED (SLS pack-fields ltrim
                    # contract), the JSON object replaces them
                    fields = F.col(FIELDS_COL)
                    packed = F.to_json(
                        F.map_filter(fields, lambda k, v: k.rlike(rx_))
                    )
                    kept = F.map_filter(fields, lambda k, v: ~k.rlike(rx_))
                    return df.withColumn(
                        FIELDS_COL,
                        F.map_concat(kept, F.create_map(F.lit(d), packed)),
                    )

                stages.append(_pack_inc)
            else:
                keys = [k.strip() for k in body.split(",") if k.strip()]
                if not keys:
                    raise SPLCompileError(
                        f"pack-fields needs a field list or -include=: {stmt!r}"
                    )
                stages.append(
                    build(
                        {
                            "Type": "processor_packjson",
                            "SourceKeys": keys,
                            "DestKey": dest,
                            "KeepSource": False,
                        }
                    ).apply
                )
        elif m := _STATS.match(stmt):
            specs: list[tuple[str, str, str]] = []
            for part in _split_args(m.group(1)):
                am = _AGG_SPEC.match(part.strip())
                if not am:
                    raise SPLCompileError(
                        f"unsupported stats aggregate: {part!r} "
                        "(supported: count/sum/avg/min/max '(field)' as name)"
                    )
                fn, fld = am.group(1).lower(), am.group(2)
                if fn != "count" and not fld:
                    # fail fast on the driver — an empty-parens numeric
                    # agg would otherwise aggregate an always-null
                    # fields[''] lookup silently
                    raise SPLCompileError(
                        f"stats {fn}() needs a field argument: {part!r}"
                    )
                specs.append((fn, fld, am.group(3)))
            by_keys = tuple(
                k.strip() for k in (m.group(2) or "").split(",") if k.strip()
            )

            def _stats(df: DataFrame, sp=tuple(specs), by=by_keys) -> DataFrame:
                fields = F.col(FIELDS_COL)
                gcols = [fields.getItem(k).alias(k) for k in by]
                aggcols = []
                for fn, fld, name in sp:
                    if fn == "count":
                        # count() = rows; count(field) = non-null values
                        # (SQL count(expr) semantics)
                        src = fields.getItem(fld) if fld else F.lit(1)
                        aggcols.append(F.count(src).alias(name))
                    else:
                        # try_cast: ANSI mode must not abort the job on
                        # one malformed numeric value — same convention
                        # as every other fields-map numeric read
                        aggcols.append(
                            getattr(F, fn)(
                                fields.getItem(fld).try_cast("double")
                            ).alias(name)
                        )
                out = df.groupBy(*gcols).agg(*aggcols)
                kv: list[Column] = []
                for k in by:
                    kv += [F.lit(k), F.col(k).cast("string")]
                for _, _, name in sp:
                    kv += [F.lit(name), F.col(name).cast("string")]
                # null entries become ABSENT keys — the fields-map
                # invariant to_events establishes (absent key, never a
                # null-valued entry)
                res = out.select(
                    F.map_filter(
                        F.create_map(*kv), lambda _, v: v.isNotNull()
                    ).alias(FIELDS_COL)
                )
                if TAGS_COL in df.columns:
                    # aggregation discards per-row identity incl. tags
                    res = res.withColumn(
                        TAGS_COL, F.create_map().cast("map<string,string>")
                    )
                return res

            stages.append(_stats)
        elif low.startswith("sort by "):
            keys = []
            for part in stmt[8:].split(","):
                toks = part.split()
                if not toks:
                    continue
                col = F.col(FIELDS_COL).getItem(toks[0])
                if len(toks) > 1 and toks[1].lower() == "desc":
                    col = col.desc()
                keys.append(col)
            stages.append(lambda df, ks=tuple(keys): df.orderBy(*ks))
        elif low.startswith("limit "):
            n = int(stmt[6:].strip())
            stages.append(lambda df, n=n: df.limit(n))
        else:
            raise SPLCompileError(f"unsupported SPL stage: {stmt!r}")
    return stages


@register
@dataclass
class ProcessorSPL(Processor):
    """processor_spl (ProcessorSPL.cpp:30-96): run an SPL Script over
    the event stream. TimeoutMilliSeconds/MaxMemoryBytes are engine
    resource knobs in the reference; in Spark, resource governance is
    the cluster manager's job, so they are accepted and ignored."""

    TYPE: ClassVar[str] = "processor_spl"
    CHANGES_CARDINALITY: ClassVar[bool] = True  # where/limit drop rows

    Script: str = "*"
    TimeoutMilliSeconds: int = 1000  # accepted; governed by the cluster
    MaxMemoryBytes: int = 50 * 1024 * 1024  # accepted; executor memory

    def __post_init__(self):
        self._stages = compile_spl(self.Script)  # fail fast on driver

    def apply(self, df: DataFrame) -> DataFrame:
        for stage in self._stages:
            df = stage(df)
        return df
