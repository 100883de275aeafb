"""Template / expression engine for pipeline documents.

Re-implements the interpolation language observed in the reference's
pipeline YAMLs (SURVEY.md §1.2). Every form is driven by invocation-site
evidence, cited per feature below (reference file:line):

- ``{varname}``            transitive var-to-var substitution
                           (pipelines/prism/download-ts-ppt-day.yml:9)
- ``{env.basedir}``        per-environment bindings
                           (pipelines/prism/download-ts-ppt-day.yml:11,13)
- ``{sys.now.yymmdd}`` etc run-timestamp formats (pipelines/sample.yml:4,
                           usda_nass/...yml:7, sentinel/...yml:11)
- ``{sys.run.short_id}``   unique run id (pipelines/sample.yml:4)
- ``{sys.step.NN}``        zero-padded step ordinal, bound per step
                           (pipelines/sample_mutlisteps.yml:10)
- ``{expr.range(a, b)}``   END-EXCLUSIVE int list (cdl/...2008-2025.yml:6-7)
- ``{expr.date(y, m, d)}`` date constructor (prism/county_daily_aggregate.yml:6-7)
- ``{expr.daterange(a,b)}``INCLUSIVE day list, composable with expr.date
                           (prism/county_daily_aggregate.yml:8)
- ``{item}``               current foreach element (prism/download-ts-ppt-day.yml:20-21)
- ``{output_var.field}``   field access on a prior step's result object
                           (pipelines/tiger/county.yml:47,59-62,68)
- templates inside JSON:   non-identifier brace groups are left intact
                           (sentinel/...michigan.yml:50)

Rendering rule: a string that is EXACTLY one ``{token}`` whose value is a
non-string (list, int, date, DataFrame) returns the object itself; any
other occurrence stringifies. This is what lets ``foreach: "{years}"``
receive a real list while ``"{year}/file.csv"`` builds a path.
"""

from __future__ import annotations

import datetime as _dt
import re
import uuid
from typing import Any, Mapping

# identifier(.identifier)* optionally with a call-argument tail; JSON brace
# groups like {"lt": 20} never match, so templates-inside-JSON survive.
_TOKEN = re.compile(r"\{([A-Za-z_][A-Za-z0-9_.]*(?:\([^{}]*\))?)\}")


class TemplateError(KeyError):
    pass


def _split_args(argstr: str) -> list[str]:
    """Split a call-argument string at top-level commas (nested calls keep
    their own commas: daterange(expr.date(y,1,1), expr.date(y,12,31)))."""
    parts, depth, cur = [], 0, []
    for ch in argstr:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


class Scope:
    """Lexical scope for template resolution.

    Layered: bindings (vars/dirs/item/output_vars) over ``env.*`` over
    ``sys.*``. Var values are themselves templates and resolve
    transitively with cycle detection (prism_base_url chains through
    prism_type/prism_measure/prism_period, download-ts-ppt-day.yml:5-9).
    """

    def __init__(
        self,
        bindings: dict[str, Any] | None = None,
        env: Mapping[str, Any] | None = None,
        now: _dt.datetime | None = None,
        run_id: str | None = None,
        parent: "Scope | None" = None,
    ):
        self.bindings: dict[str, Any] = dict(bindings or {})
        self.env = dict(env) if env is not None else (parent.env if parent else {})
        self.now = now or (parent.now if parent else _dt.datetime.now())
        self.run_id = run_id or (parent.run_id if parent else uuid.uuid4().hex[:8])
        self.parent = parent
        self._resolving: set[str] = set()

    def child(self, bindings: dict[str, Any]) -> "Scope":
        return Scope(bindings=bindings, parent=self)

    def bind(self, name: str, value: Any) -> None:
        self.bindings[name] = value

    def _lookup(self, name: str) -> Any:
        s: Scope | None = self
        while s is not None:
            if name in s.bindings:
                return s.bindings[name]
            s = s.parent
        raise TemplateError(f"unknown template name: {name!r}")

    # -- token evaluation ---------------------------------------------------

    def _sys(self, path: list[str]) -> Any:
        if path[0] == "now":
            fmt = path[1]
            table = {
                "yymmdd": "%y%m%d",
                "yyyymmdd": "%Y%m%d",
                "hhmmss": "%H%M%S",
                "yyyy": "%Y",
                "mm": "%m",
                "dd": "%d",
            }
            if fmt not in table:
                raise TemplateError(f"unknown sys.now format: {fmt}")
            return self.now.strftime(table[fmt])
        if path[0] == "run" and path[1] == "short_id":
            return self.run_id
        if path[0] == "step":
            # bound by the runner per step (sys.step.NN -> "01", "02", ...)
            return self._lookup(f"sys.step.{path[1]}")
        raise TemplateError(f"unknown sys reference: {'.'.join(path)}")

    def _expr(self, fn: str, argstr: str) -> Any:
        args = [self.eval(a) for a in _split_args(argstr)]
        if fn == "range":
            a, b = (int(x) for x in args)
            return list(range(a, b))  # end-exclusive: range(2008,2026) <-> "2008-2025"
        if fn == "date":
            y, m, d = (int(x) for x in args)
            return _dt.date(y, m, d)
        if fn == "daterange":
            a, b = args
            a = a if isinstance(a, _dt.date) else _dt.date.fromisoformat(str(a))
            b = b if isinstance(b, _dt.date) else _dt.date.fromisoformat(str(b))
            days = (b - a).days
            return [a + _dt.timedelta(days=i) for i in range(days + 1)]  # inclusive
        raise TemplateError(f"unknown expr function: {fn}")

    def eval(self, token: str) -> Any:
        """Evaluate one token: literal, call, or dotted reference."""
        token = token.strip()
        if re.fullmatch(r"-?\d+", token):
            return int(token)
        call = re.fullmatch(r"([A-Za-z_][A-Za-z0-9_.]*)\((.*)\)", token, re.S)
        if call:
            head, argstr = call.groups()
            if head.startswith("expr."):
                return self._expr(head[5:], argstr)
            raise TemplateError(f"unknown callable: {head}")
        parts = token.split(".")
        if parts[0] == "env":
            try:
                v: Any = self.env
                for p in parts[1:]:
                    v = v[p]
                return v
            except (KeyError, TypeError):
                raise TemplateError(f"unknown env reference: {token}")
        if parts[0] == "sys":
            return self._sys(parts[1:])
        # name(.field)* — var, item, or output_var field access
        if token in self._resolving:
            raise TemplateError(f"template cycle at {token!r}")
        self._resolving.add(token)
        try:
            v = self.render(self._lookup(parts[0]))
            for p in parts[1:]:
                if isinstance(v, Mapping):
                    v = v[p]
                else:
                    v = getattr(v, p)
            return v
        finally:
            self._resolving.discard(token)

    # -- rendering ----------------------------------------------------------

    def render(self, value: Any) -> Any:
        """Recursively interpolate a YAML value against this scope."""
        if isinstance(value, str):
            full = _TOKEN.fullmatch(value)
            if full:
                return self.eval(full.group(1))

            def sub(m: re.Match) -> str:
                v = self.eval(m.group(1))
                return str(self.render(v)) if isinstance(v, str) else _to_str(v)

            out = value
            for _ in range(10):  # fixpoint for values that expand to templates
                new = _TOKEN.sub(sub, out)
                if new == out:
                    return new
                out = new
            return out
        if isinstance(value, list):
            return [self.render(v) for v in value]
        if isinstance(value, Mapping):
            return {k: self.render(v) for k, v in value.items()}
        return value


def _to_str(v: Any) -> str:
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)
