"""GeoJSON (RFC 7946) feature parsing — the web's vector-geometry
interchange format, next to the Shapefile reader (sources/vector.py).

Beyond JSON well-formedness, the audit checks what RFC 7946 actually
mandates and sloppy producers actually violate:

- geometry type census (Point/LineString/Polygon + Multi* and
  GeometryCollection);
- ring closure: a polygon ring's first and last positions MUST be
  identical — unclosed rings quarantine;
- WINDING ORDER (§3.1.6): exterior rings counterclockwise, holes
  clockwise — violations are surfaced per feature (``winding_ok``),
  not silently "fixed", because flipped winding usually means the
  producer also got holes wrong;
- ring size: a closed ring needs at least 4 positions;
- bbox computed from coordinates via the shoelace pass already in
  hand (never trusted from the optional member).

The shoelace signed area doubles as the winding test and an exact
integer when coordinates are integers — which the fixtures are, so
the oracle replays areas bit-for-bit.
"""
from __future__ import annotations

import json

__all__ = ["parse_geojson"]


def _ring_signed_area2(ring: list) -> float:
    """Twice the signed shoelace area (positive = counterclockwise)."""
    s = 0
    for i in range(len(ring) - 1):
        x1, y1 = ring[i][0], ring[i][1]
        x2, y2 = ring[i + 1][0], ring[i + 1][1]
        s += x1 * y2 - x2 * y1
    return s


def _walk_coords(geom: dict, out: list) -> None:
    t = geom.get("type")
    if t == "GeometryCollection":
        for g in geom.get("geometries", []):
            _walk_coords(g, out)
        return
    c = geom.get("coordinates")
    if c is None:
        raise ValueError(f"geojson: {t} without coordinates — quarantine")

    def rec(v):
        if (
            isinstance(v, list) and v
            and isinstance(v[0], (int, float))
        ):
            if len(v) < 2:
                raise ValueError("geojson: position with < 2 numbers")
            out.append((v[0], v[1]))
        elif isinstance(v, list):
            for x in v:
                rec(x)
        else:
            raise ValueError("geojson: malformed coordinates — quarantine")

    rec(c)


def _polygon_stats(rings: list) -> tuple[int, bool, float]:
    """(n_rings, winding_ok, exterior_area2) for one polygon."""
    if not rings:
        raise ValueError("geojson: polygon without rings — quarantine")
    winding_ok = True
    ext_area2 = 0.0
    for i, ring in enumerate(rings):
        if len(ring) < 4:
            raise ValueError("geojson: ring with < 4 positions — quarantine")
        if ring[0] != ring[-1]:
            raise ValueError("geojson: unclosed ring — quarantine")
        a2 = _ring_signed_area2(ring)
        if i == 0:
            ext_area2 = a2
            if a2 <= 0:
                winding_ok = False  # exterior must be CCW per §3.1.6
        elif a2 >= 0:
            winding_ok = False  # holes must be CW
    return len(rings), winding_ok, ext_area2


def parse_geojson(text: str) -> list[dict]:
    """FeatureCollection/Feature/bare geometry -> one dict per feature:
    {geom_type, n_points, n_rings, winding_ok, area2 (exterior
    shoelace x2, 0 for non-areal), bbox (minx, miny, maxx, maxy),
    n_props}."""
    try:
        obj = json.loads(text)
    except json.JSONDecodeError as e:
        raise ValueError(f"geojson: malformed JSON — quarantine ({e})") from e
    if not isinstance(obj, dict):
        raise ValueError("geojson: root is not an object — quarantine")
    t = obj.get("type")
    if t == "FeatureCollection":
        features = obj.get("features")
        if not isinstance(features, list):
            raise ValueError("geojson: features is not a list — quarantine")
    elif t == "Feature":
        features = [obj]
    elif t in (
        "Point", "LineString", "Polygon", "MultiPoint",
        "MultiLineString", "MultiPolygon", "GeometryCollection",
    ):
        features = [{"type": "Feature", "geometry": obj, "properties": {}}]
    else:
        raise ValueError(f"geojson: unknown type {t!r} — quarantine")
    out = []
    for f in features:
        if not isinstance(f, dict) or f.get("type") != "Feature":
            raise ValueError("geojson: non-Feature in collection — quarantine")
        geom = f.get("geometry")
        if geom is None:
            out.append(
                {
                    "geom_type": "null", "n_points": 0, "n_rings": 0,
                    "winding_ok": True, "area2": 0.0,
                    "bbox": (0.0, 0.0, 0.0, 0.0),
                    "n_props": len(f.get("properties") or {}),
                }
            )
            continue
        gt = geom.get("type", "")
        coords: list = []
        _walk_coords(geom, coords)
        if not coords:
            raise ValueError("geojson: empty coordinates — quarantine")
        n_rings = 0
        winding_ok = True
        area2 = 0.0
        if gt == "Polygon":
            n_rings, winding_ok, area2 = _polygon_stats(
                geom["coordinates"]
            )
        elif gt == "MultiPolygon":
            for poly in geom["coordinates"]:
                r, ok, a2 = _polygon_stats(poly)
                n_rings += r
                winding_ok = winding_ok and ok
                area2 += a2
        xs = [p[0] for p in coords]
        ys = [p[1] for p in coords]
        out.append(
            {
                "geom_type": gt,
                "n_points": len(coords),
                "n_rings": n_rings,
                "winding_ok": winding_ok,
                "area2": float(area2),
                "bbox": (min(xs), min(ys), max(xs), max(ys)),
                "n_props": len(f.get("properties") or {}),
            }
        )
    return out
