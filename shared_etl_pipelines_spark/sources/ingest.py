"""Ingestion operators: downloads, archive extraction, STAC search.

Re-expresses the reference's ingestion plugin contracts (SURVEY.md §2.1)
as driver-side tasks with manifest-based idempotence:

- S1 ftp_download_tree  (pipelines/prism/download-ts-ppt-day.yml:17-27)
- S2 web_download_list  (pipelines/cdl/download-national-30m-2008-2025.yml:17-26,
                         urls_file form: pipelines/tiger/county.yml:21-28)
- S3 archive_extract    (archive_glob: pipelines/prism/download-ts-ppt-day.yml:28-35;
                         single: pipelines/cdl/...yml:27-34)
- S4 gzip_extract       (pipelines/usda_nass/...yml:39-45,56-63)
- S5 stac_asset_download(pipelines/sentinel/download-sentinel2-l2a-michigan.yml:43-59)

Design decisions:
- ``overwrite: false`` (L7/P1) -> skip any file whose target exists;
  raw layers stay cheap to re-run.
- ``conditional_get`` (P2) -> an ETag/Last-Modified manifest JSON per
  output directory; a matched validator skips the transfer.
- Every operator accepts ``file://`` URLs and plain paths so CI runs
  fully offline (SURVEY.md §7.7); network schemes use urllib/ftplib.
- Downloads fan out on a thread pool (IO-bound, reference parallelism is
  per-file) — executors are never involved; Spark reads the landed files.
"""

from __future__ import annotations

import fnmatch
import glob as _glob
import gzip
import json
import os
import shutil
import tarfile
import urllib.error
import urllib.request
import zipfile
from concurrent.futures import ThreadPoolExecutor
from typing import Any
from urllib.parse import urlparse

MANIFEST_NAME = ".ingest_manifest.json"


def _load_manifest(out_dir: str) -> dict[str, Any]:
    p = os.path.join(out_dir, MANIFEST_NAME)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _save_manifest(out_dir: str, manifest: dict[str, Any]) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))


def _src_path(url: str) -> str | None:
    """Local filesystem path for file:// URLs / bare paths, else None."""
    u = urlparse(url)
    if u.scheme in ("", "file"):
        return u.path if u.scheme == "file" else url
    return None


def _validators(url: str, timeout: float) -> dict[str, str]:
    """Cheap change-detection validators for conditional_get."""
    p = _src_path(url)
    if p is not None:
        st = os.stat(p)
        return {"last_modified": str(st.st_mtime_ns), "size": str(st.st_size)}
    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
        h = resp.headers
        return {
            "etag": h.get("ETag", ""),
            "last_modified": h.get("Last-Modified", ""),
            "size": h.get("Content-Length", ""),
        }


def _fetch(url: str, dest: str, timeout: float) -> None:
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    p = _src_path(url)
    tmp = dest + ".part"
    if p is not None:
        shutil.copyfile(p, tmp)
    else:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as f:  # noqa: S310
            shutil.copyfileobj(resp, f)
    os.replace(tmp, dest)  # atomic publish: partial downloads never visible


def _http_conditional_get(
    url: str, dest: str, timeout: float, prior: dict[str, str] | None
) -> dict[str, str] | None:
    """True HTTP conditional GET (the reference's conditional_get in its
    wire form): send ``If-None-Match`` / ``If-Modified-Since`` from the
    prior validators; a 304 returns None (dest untouched), a 200 writes
    atomically and returns the fresh validators from the response
    headers — one round trip, no separate HEAD."""
    headers: dict[str, str] = {}
    if prior:
        if prior.get("etag"):
            headers["If-None-Match"] = prior["etag"]
        if prior.get("last_modified"):
            headers["If-Modified-Since"] = prior["last_modified"]
    req = urllib.request.Request(url, headers=headers)
    try:
        resp = urllib.request.urlopen(req, timeout=timeout)  # noqa: S310
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return None
        raise
    with resp:
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        tmp = dest + ".part"
        with open(tmp, "wb") as f:
            shutil.copyfileobj(resp, f)
        os.replace(tmp, dest)
        h = resp.headers
        return {
            "etag": h.get("ETag", ""),
            "last_modified": h.get("Last-Modified", ""),
            "size": h.get("Content-Length", ""),
        }


def web_download_list(
    urls: list[str] | str | None = None,
    urls_file: str | None = None,
    out: str = ".",
    overwrite: bool = False,
    conditional_get: bool = False,
    timeout_seconds: float = 120,
    max_workers: int = 8,
) -> dict[str, Any]:
    """S2: download a URL list (inline or from a file) into ``out``."""
    if urls_file is not None:
        with open(urls_file) as f:
            url_list = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
    elif isinstance(urls, str):
        url_list = [urls]
    else:
        url_list = list(urls or [])
    os.makedirs(out, exist_ok=True)
    manifest = _load_manifest(out)
    downloaded: list[str] = []
    skipped: list[str] = []

    def one(url: str) -> None:
        dest = os.path.join(out, os.path.basename(urlparse(url).path))
        exists = os.path.exists(dest)
        if exists and not overwrite and not conditional_get:
            skipped.append(dest)
            return
        remote = _src_path(url) is None
        if conditional_get and remote:
            # wire-form conditional GET: one round trip, 304 = skip.
            # Validators only accompany the request when the local copy
            # exists — a deleted dest must refetch unconditionally.
            prior = manifest.get(url) if (exists and not overwrite) else None
            vals = _http_conditional_get(url, dest, timeout_seconds, prior)
            if vals is None:
                skipped.append(dest)
            else:
                manifest[url] = vals
                downloaded.append(dest)
            return
        if exists and not overwrite:  # local fixture conditional mode
            vals = _validators(url, timeout_seconds)
            if manifest.get(url) == vals:
                skipped.append(dest)
                return
        _fetch(url, dest, timeout_seconds)
        if conditional_get:
            manifest[url] = _validators(url, timeout_seconds)
        downloaded.append(dest)

    try:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(one, url_list))
    finally:
        # one failing URL propagates out of ex.map and aborts the batch;
        # validators already earned by completed downloads must survive
        # or the next run refetches everything it had finished
        if conditional_get:
            _save_manifest(out, manifest)
    return {"downloaded": sorted(downloaded), "skipped": sorted(skipped), "out": out}


def ftp_download_tree(
    url: str,
    out: str,
    recursive: bool = True,
    filename_glob: str = "*",
    overwrite: bool = False,
    timeout_seconds: float = 120,
    max_workers: int = 8,
) -> dict[str, Any]:
    """S1: recursively mirror a subtree with a per-file glob filter.

    ``file://`` trees (the offline fixture mode) walk the local directory;
    ``ftp://`` uses ftplib with the same skip-if-exists discipline.
    """
    src = _src_path(url)
    files: list[tuple[str, str]] = []  # (source, relpath)
    if src is not None:
        if recursive:
            for root, _dirs, names in os.walk(src):
                for nm in names:
                    if fnmatch.fnmatch(nm, filename_glob):
                        full = os.path.join(root, nm)
                        files.append((full, os.path.relpath(full, src)))
        else:
            for nm in os.listdir(src):
                full = os.path.join(src, nm)
                if os.path.isfile(full) and fnmatch.fnmatch(nm, filename_glob):
                    files.append((full, nm))
        fetch = lambda s, d: shutil.copyfile(s, d)  # noqa: E731
    else:
        from ftplib import FTP  # lazy: only for real ftp:// URLs

        u = urlparse(url)
        ftp = FTP(u.hostname, timeout=timeout_seconds)  # noqa: S321
        ftp.login(u.username or "anonymous", u.password or "")
        base = u.path or "/"

        def walk(d: str) -> None:
            entries = ftp.nlst(d)
            for e in entries:
                if e in (d, ".", ".."):
                    continue
                try:
                    ftp.cwd(e)  # directory?
                    ftp.cwd(base)
                    if recursive:
                        walk(e)
                except Exception:
                    nm = os.path.basename(e)
                    if fnmatch.fnmatch(nm, filename_glob):
                        files.append((e, os.path.relpath(e, base)))

        walk(base)

        def fetch(s: str, d: str) -> None:
            with open(d, "wb") as f:
                ftp.retrbinary(f"RETR {s}", f.write)

    mirrored: list[str] = []
    skipped: list[str] = []

    def one(pair: tuple[str, str]) -> None:
        s, rel = pair
        dest = os.path.join(out, rel)
        if os.path.exists(dest) and not overwrite:
            skipped.append(dest)
            return
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        fetch(s, dest)
        mirrored.append(dest)

    if src is not None:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(one, files))
    else:  # single FTP control connection => sequential
        for pair in files:
            one(pair)
    return {"downloaded": sorted(mirrored), "skipped": sorted(skipped), "out": out}


def archive_extract(
    archive: str | None = None,
    archive_glob: str | None = None,
    out: str = ".",
    overwrite: bool = False,
    max_workers: int = 4,
) -> dict[str, Any]:
    """S3: extract one archive or every archive matching a (recursive)
    glob. zip and tar(.gz) both supported; zip is what the reference
    mirrors (FTP/HTTP .zip trees)."""
    archives = (
        sorted(_glob.glob(archive_glob, recursive=True)) if archive_glob else [archive]
    )
    extracted: list[str] = []
    skipped: list[str] = []

    def one(path: str) -> None:
        if zipfile.is_zipfile(path):
            with zipfile.ZipFile(path) as z:
                for info in z.infolist():
                    if info.is_dir():
                        continue
                    dest = os.path.join(out, info.filename)
                    if os.path.exists(dest) and not overwrite:
                        skipped.append(dest)
                        continue
                    # not z.extract(): its internal makedirs lacks
                    # exist_ok and races when archives share directories
                    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
                    with z.open(info) as src, open(dest, "wb") as f:
                        shutil.copyfileobj(src, f)
                    extracted.append(dest)
        elif tarfile.is_tarfile(path):
            with tarfile.open(path) as t:
                for m in t.getmembers():
                    if not m.isfile():
                        continue
                    dest = os.path.join(out, m.name)
                    if os.path.exists(dest) and not overwrite:
                        skipped.append(dest)
                        continue
                    t.extract(m, out, filter="data")
                    extracted.append(dest)
        else:
            raise ValueError(f"not an archive: {path}")

    os.makedirs(out, exist_ok=True)
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        list(ex.map(one, [a for a in archives if a]))
    return {"extracted": sorted(extracted), "skipped": sorted(skipped), "out": out}


def gzip_extract(archive: str, out: str, overwrite: bool = False) -> dict[str, Any]:
    """S4: gunzip one file. (Spark reads .gz text natively — this exists
    for pipeline parity when a later non-Spark step needs the plain file.)"""
    dest = os.path.join(out, os.path.basename(archive))
    for suf in (".gz", ".gzip"):
        if dest.endswith(suf):
            dest = dest[: -len(suf)]
            break
    if os.path.exists(dest) and not overwrite:
        return {"extracted": [], "skipped": [dest], "out": out}
    os.makedirs(out, exist_ok=True)
    tmp = dest + ".part"
    with gzip.open(archive, "rb") as src, open(tmp, "wb") as f:
        shutil.copyfileobj(src, f)
    os.replace(tmp, dest)
    return {"extracted": [dest], "skipped": [], "out": out}


# -- S5: STAC ---------------------------------------------------------------

def _match_query(props: dict[str, Any], query: dict[str, Any]) -> bool:
    """STAC item property query: {"eo:cloud_cover": {"lt": 20}} etc."""
    ops = {
        "lt": lambda a, b: a < b,
        "lte": lambda a, b: a <= b,
        "gt": lambda a, b: a > b,
        "gte": lambda a, b: a >= b,
        "eq": lambda a, b: a == b,
        "neq": lambda a, b: a != b,
    }
    for prop, conds in query.items():
        v = props.get(prop)
        if v is None:
            return False
        for op, rhs in conds.items():
            if op not in ops or not ops[op](v, rhs):
                return False
    return True


def _bbox_intersects(a: list[float], b: list[float]) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _stac_pages(api_url: str, body: dict[str, Any], timeout: float):
    """Walk a STAC ItemSearch across pages: POST /search, then follow
    ``links`` entries with rel=next per the STAC API spec — a next link
    may switch method, replace the body, or (``merge: true``) merge its
    body into the previous one. Yields each page's features list."""
    url = api_url.rstrip("/") + "/search"
    method = "POST"
    n_pages = 0
    while True:
        data = json.dumps(body).encode() if method == "POST" else None
        req = urllib.request.Request(
            url, data=data,
            headers={"Content-Type": "application/json"} if data else {},
            method=method,
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:  # noqa: S310
            page = json.load(resp)
        yield page.get("features", [])
        n_pages += 1
        if n_pages >= 1000:  # defensive: a catalog must not loop us forever
            raise ValueError("stac: pagination exceeded 1000 pages — refusing")
        nxt = next(
            (l for l in page.get("links", []) if l.get("rel") == "next"), None
        )
        if not nxt or not nxt.get("href"):
            return
        url = nxt["href"]
        method = (nxt.get("method") or "GET").upper()
        if method == "POST":
            nb = nxt.get("body") or {}
            body = {**body, **nb} if nxt.get("merge") else (nb or body)


def stac_asset_download(
    api_url: str,
    collection: str,
    out: str,
    datetime: str | None = None,
    bbox: list[float] | None = None,
    query_json: str | dict[str, Any] | None = None,
    asset_keys: list[str] | None = None,
    page_size: int = 100,
    max_items: int = 0,
    sign_api_url: str | None = None,
    overwrite: bool = False,
    timeout_seconds: float = 120,
    save_item_json: bool = True,
) -> dict[str, Any]:
    """S5: STAC search + selected-asset download.

    ``api_url`` may be a local catalog JSON (FeatureCollection) — the
    offline fixture mode — or a STAC search endpoint. The property
    ``query_json`` predicate, bbox intersection, datetime range and
    page/max_items limits are applied the same way for both.
    """
    query = (
        json.loads(query_json) if isinstance(query_json, str) else (query_json or {})
    )
    src = _src_path(api_url)
    items: list[dict[str, Any]] = []
    if src is not None:
        with open(src) as f:
            doc = json.load(f)
        pages = [doc.get("features", doc if isinstance(doc, list) else [])]
    else:
        body = {
            "collections": [collection],
            "limit": page_size,
            **({"datetime": datetime} if datetime else {}),
            **({"bbox": bbox} if bbox else {}),
            **({"query": query} if query else {}),
        }
        # rel=next pagination (r10): the single-page fetch undercounted
        # any search wider than page_size on a live catalog
        pages = _stac_pages(api_url, body, timeout_seconds)

    done = False
    for features in pages:
        for feat in features:
            props = feat.get("properties", {})
            if collection and feat.get("collection") not in (None, collection):
                continue
            if query and not _match_query(props, query):
                continue
            if bbox and feat.get("bbox") and not _bbox_intersects(feat["bbox"], bbox):
                continue
            if datetime and props.get("datetime"):
                lo, _, hi = datetime.partition("/")
                d = props["datetime"]
                if (lo and d < lo) or (hi and hi != ".." and d > hi):
                    continue
            items.append(feat)
            if max_items and len(items) >= max_items:
                done = True
                break
        if done:
            break

    os.makedirs(out, exist_ok=True)
    downloaded: list[str] = []
    skipped: list[str] = []
    for feat in items:
        item_dir = os.path.join(out, feat["id"])
        os.makedirs(item_dir, exist_ok=True)
        if save_item_json:
            jp = os.path.join(item_dir, "item.json")
            if overwrite or not os.path.exists(jp):
                with open(jp, "w") as f:
                    json.dump(feat, f, indent=1, sort_keys=True)
        for key, asset in feat.get("assets", {}).items():
            if asset_keys and key not in asset_keys:
                continue
            href = asset.get("href", "")
            dest = os.path.join(item_dir, os.path.basename(urlparse(href).path))
            if os.path.exists(dest) and not overwrite:
                skipped.append(dest)
                continue
            _fetch(href, dest, timeout_seconds)
            downloaded.append(dest)
    return {
        "items": [f["id"] for f in items],
        "downloaded": sorted(downloaded),
        "skipped": sorted(skipped),
        "out": out,
    }
