"""Snapshot per-query fingerprints for the judged-green staleness guard.

Writes tools/query_fingerprints.json: for every registry entry in
_JUDGED_GREEN, sha256 over (oracle SQL, builder source). Regenerate ONLY
when a query's driver verdict is fresh — i.e. right after updating
_JUDGED_GREEN from a new CORRECTNESS_r{N}.json. The paired test
(tests/test_registry_meta.py::test_judged_green_entries_unchanged) fails
if a fingerprinted query is edited without being removed from
_JUDGED_GREEN, which is exactly the b7648b7 staleness class: a query
changed after its verdict but still sorted behind the gate window.

Usage: python tools/gen_fingerprints.py
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shared_etl_pipelines_spark.queries import _JUDGED_GREEN, REGISTRY  # noqa: E402


def fingerprint(name: str) -> str:
    qd = REGISTRY[name]
    src = inspect.getsource(qd.fn)
    blob = (qd.sql or "") + "\x00" + src
    return hashlib.sha256(blob.encode()).hexdigest()


def main() -> None:
    out = {name: fingerprint(name) for name in sorted(_JUDGED_GREEN) if name in REGISTRY}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "query_fingerprints.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} fingerprints to {path}")


if __name__ == "__main__":
    main()
