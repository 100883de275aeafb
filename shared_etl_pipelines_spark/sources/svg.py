"""SVG image audit — dimensions, element census, ACTIVE-CONTENT flags.

SVG is the web's vector image format and, unlike every raster format
this repo decodes, it is a PROGRAM surface: ``<script>`` elements and
event-handler attributes execute in the consumer, and external
references exfiltrate. A crawl-image curation pass must therefore see
(a) the rendered dimensions (width/height attributes or the viewBox),
(b) a shape/text census, and (c) the active-content and
external-reference flags that decide sanitize-vs-quarantine.

Parsing is strict XML (ElementTree, namespace-liberal local-name
matching); malformed documents raise ValueError — callers quarantine.
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["parse_svg"]

_LEN_RX = re.compile(r"^\s*([0-9]+(?:\.[0-9]+)?)\s*(px)?\s*$")
_SHAPES = ("path", "rect", "circle", "ellipse", "line", "polyline", "polygon")


def _local(tag) -> str:
    return tag.rpartition("}")[2] if isinstance(tag, str) else ""


def _length(v: str | None) -> float:
    """Unitless or px lengths only — %, em, pt etc. depend on context
    we refuse to guess (the value stays 0 and the viewBox decides)."""
    if v is None:
        return 0.0
    m = _LEN_RX.match(v)
    return float(m.group(1)) if m else 0.0


def parse_svg(text: str) -> dict:
    if "<!DOCTYPE" in text or "<!ENTITY" in text:
        # SVG is untrusted by definition here: DTD entity expansion
        # (billion laughs) is refused, never expanded
        raise ValueError("svg: DTD/entities not allowed — quarantine")
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ValueError(f"svg: malformed XML — quarantine ({e})") from e
    if _local(root.tag) != "svg":
        raise ValueError(f"svg: root is <{_local(root.tag)}>, not <svg>")
    width = _length(root.get("width"))
    height = _length(root.get("height"))
    vb = root.get("viewBox")
    if (not width or not height) and vb:
        parts = vb.replace(",", " ").split()
        if len(parts) != 4:
            raise ValueError("svg: malformed viewBox — quarantine")
        width = width or float(parts[2])
        height = height or float(parts[3])
    n_shapes = 0
    n_text = 0
    text_chars = 0
    has_script = False
    has_event_handlers = False
    has_external_ref = False
    has_embedded_image = False
    for el in root.iter():
        name = _local(el.tag)
        if name in _SHAPES:
            n_shapes += 1
        elif name == "text":
            n_text += 1
            text_chars += sum(len(s) for s in el.itertext())
        elif name == "script":
            has_script = True
        elif name == "image":
            href = el.get("href") or el.get(
                "{http://www.w3.org/1999/xlink}href"
            )
            if href and href.startswith("data:"):
                has_embedded_image = True
            elif href:
                has_external_ref = True
        for attr in el.keys():
            if _local(attr).startswith("on"):  # onload, onclick, ...
                has_event_handlers = True
    return {
        "width": width,
        "height": height,
        "n_shapes": n_shapes,
        "n_text": n_text,
        "text_chars": text_chars,
        "has_script": has_script,
        "has_event_handlers": has_event_handlers,
        "has_external_ref": has_external_ref,
        "has_embedded_image": has_embedded_image,
    }
