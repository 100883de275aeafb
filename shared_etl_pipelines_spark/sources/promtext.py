"""Prometheus text exposition format parsing — observability scrapes
as pipeline input.

Metrics lakes (long-term Prometheus/Mimir/Thanos offloads) land in
object storage as text-format scrapes; an ETL engine ingesting them
needs the format's real semantics, not a line splitter:

- ``# HELP`` / ``# TYPE`` metadata with the counter/gauge/histogram/
  summary/untyped type vocabulary;
- samples ``name{label="value",...} value [timestamp_ms]`` with the
  label-value escape rules (``\\\\``, ``\\"``, ``\\n``);
- HISTOGRAM VALIDATION: a histogram's ``_bucket`` series must have
  monotonically non-decreasing cumulative counts as ``le`` increases
  and MUST include the ``le="+Inf"`` bucket equal to ``_count`` —
  scrapes violating this produce silently-wrong quantiles downstream,
  so they surface per metric as ``buckets_ok=false``;
- refusals: malformed sample lines, unterminated label quotes, a TYPE
  for one metric followed by samples of an undeclared family when
  strict — here undeclared families are ALLOWED (the spec's untyped
  default) but counted.
"""
from __future__ import annotations

import math
import re

__all__ = ["parse_prom_text"]

_SAMPLE_RX = re.compile(
    r"^([a-zA-Z_:][a-zA-Z0-9_:]*)(\{.*\})?\s+(\S+)(?:\s+(-?\d+))?$"
)
_LABEL_RX = re.compile(r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"')


def _unescape(v: str) -> str:
    return (
        v.replace("\\\\", "\x00")
        .replace('\\"', '"')
        .replace("\\n", "\n")
        .replace("\x00", "\\")
    )


def _parse_value(s: str) -> float:
    if s == "+Inf":
        return math.inf
    if s == "-Inf":
        return -math.inf
    if s == "NaN":
        return math.nan
    try:
        return float(s)
    except ValueError as e:
        raise ValueError(f"prom: bad sample value {s!r} — quarantine") from e


def parse_prom_text(text: str) -> dict:
    """-> {metrics: {family: {type, help, n_samples, buckets_ok}},
    n_samples, n_untyped_samples}. Histogram families get their
    le-bucket monotonicity + +Inf==_count contract checked."""
    types: dict[str, str] = {}
    helps: dict[str, str] = {}
    samples: list[tuple[str, dict, float]] = []
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        if line.startswith("#"):
            parts = line.split(None, 3)
            if len(parts) >= 3 and parts[1] == "TYPE":
                if parts[3 - 1] in types:
                    raise ValueError(
                        f"prom: duplicate TYPE for {parts[2]} — quarantine"
                    )
                t = parts[3] if len(parts) > 3 else ""
                if t not in (
                    "counter", "gauge", "histogram", "summary", "untyped",
                ):
                    raise ValueError(f"prom: unknown type {t!r} — quarantine")
                types[parts[2]] = t
            elif len(parts) >= 3 and parts[1] == "HELP":
                helps[parts[2]] = parts[3] if len(parts) > 3 else ""
            continue  # other comments ignored per spec
        m = _SAMPLE_RX.match(line)
        if not m:
            raise ValueError(f"prom: malformed sample line {line!r}")
        name, labelblob, val = m.group(1), m.group(2), m.group(3)
        labels: dict[str, str] = {}
        if labelblob:
            body = labelblob[1:-1].strip()
            if body:
                consumed = 0
                for lm in _LABEL_RX.finditer(body):
                    labels[lm.group(1)] = _unescape(lm.group(2))
                    consumed = lm.end()
                rest = body[consumed:].strip().strip(",")
                if rest:
                    raise ValueError(
                        f"prom: malformed labels {labelblob!r} — quarantine"
                    )
        samples.append((name, labels, _parse_value(val)))

    def family(name: str) -> str:
        for suf in ("_bucket", "_count", "_sum"):
            if name.endswith(suf) and name[: -len(suf)] in types:
                return name[: -len(suf)]
        return name

    metrics: dict[str, dict] = {}
    n_untyped = 0
    for name, labels, val in samples:
        fam = family(name)
        t = types.get(fam)
        if t is None:
            n_untyped += 1
            t = "untyped"
        m = metrics.setdefault(
            fam,
            {"type": t, "help": helps.get(fam, ""), "n_samples": 0,
             "buckets_ok": True},
        )
        m["n_samples"] += 1
    # histogram contract per family
    for fam, meta in metrics.items():
        if meta["type"] != "histogram":
            continue
        buckets = sorted(
            (
                (math.inf if la["le"] == "+Inf" else float(la["le"]), v)
                for nm, la, v in samples
                if nm == fam + "_bucket" and "le" in la
            ),
            key=lambda t: t[0],
        )
        counts = [
            v for nm, la, v in samples if nm == fam + "_count"
        ]
        ok = bool(buckets) and buckets[-1][0] == math.inf
        last = -math.inf
        prev_v = -math.inf
        for le, v in buckets:
            if le <= last or v < prev_v:
                ok = False
            last, prev_v = le, v
        if counts and buckets and buckets[-1][1] != counts[0]:
            ok = False
        meta["buckets_ok"] = ok
    return {
        "metrics": metrics,
        "n_samples": len(samples),
        "n_untyped_samples": n_untyped,
    }
