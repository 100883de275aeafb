"""Ingestion + catalog operator tests — fully offline via file:// fixtures
(SURVEY.md §7.7: every ingestion operator needs a fixture mode)."""

import gzip
import json
import os
import zipfile

import pytest

from shared_etl_pipelines_spark.sources import catalog as C
from shared_etl_pipelines_spark.sources import ingest as I


@pytest.fixture
def tree(tmp_path):
    """A fake remote tree: years of .tif-ish files + a readme."""
    src = tmp_path / "remote"
    for year in (2020, 2021):
        d = src / str(year)
        d.mkdir(parents=True)
        for day in ("0101", "0102"):
            (d / f"prism_ppt_us_30s_{year}{day}.tif").write_bytes(b"raster" + str(year).encode())
        (d / "readme.txt").write_text("not a raster")
    return src


def test_ftp_download_tree_glob_and_skip(tree, tmp_path):
    out = tmp_path / "mirror"
    r1 = I.ftp_download_tree(f"file://{tree}", str(out), filename_glob="*.tif")
    assert len(r1["downloaded"]) == 4 and not r1["skipped"]
    assert not any("readme" in p for p in r1["downloaded"])
    assert (out / "2020" / "prism_ppt_us_30s_20200101.tif").exists()
    r2 = I.ftp_download_tree(f"file://{tree}", str(out), filename_glob="*.tif")
    assert len(r2["skipped"]) == 4 and not r2["downloaded"]  # L7 idempotence


def test_web_download_list_urls_file_and_conditional_get(tree, tmp_path):
    src = tree / "2020" / "prism_ppt_us_30s_20200101.tif"
    listing = tmp_path / "urls.txt"
    listing.write_text(f"file://{src}\n# comment\n")
    out = tmp_path / "dl"
    r1 = I.web_download_list(urls_file=str(listing), out=str(out), conditional_get=True)
    assert len(r1["downloaded"]) == 1
    r2 = I.web_download_list(urls_file=str(listing), out=str(out), conditional_get=True)
    assert r2["skipped"] and not r2["downloaded"]  # validators matched (P2)
    src.write_bytes(b"changed!")
    r3 = I.web_download_list(urls_file=str(listing), out=str(out), conditional_get=True)
    assert r3["downloaded"] and not r3["skipped"]  # change detected


def test_archive_extract_glob(tmp_path):
    for i in range(2):
        with zipfile.ZipFile(tmp_path / f"a{i}.zip", "w") as z:
            z.writestr(f"sub/file{i}.csv", "x,y\n1,2\n")
    out = tmp_path / "ex"
    r = I.archive_extract(archive_glob=str(tmp_path / "*.zip"), out=str(out))
    assert len(r["extracted"]) == 2
    assert (out / "sub" / "file0.csv").exists()
    r2 = I.archive_extract(archive_glob=str(tmp_path / "*.zip"), out=str(out))
    assert len(r2["skipped"]) == 2


def test_gzip_extract(tmp_path):
    gz = tmp_path / "qs.crops.txt.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"A|B\n1|2\n")
    r = I.gzip_extract(str(gz), str(tmp_path / "out"))
    assert r["extracted"] == [str(tmp_path / "out" / "qs.crops.txt")]
    assert open(r["extracted"][0]).read() == "A|B\n1|2\n"
    assert I.gzip_extract(str(gz), str(tmp_path / "out"))["skipped"]


@pytest.fixture
def stac_catalog(tmp_path):
    assets_dir = tmp_path / "assets"
    assets_dir.mkdir()
    feats = []
    for i, cc in enumerate([5, 15, 45]):
        band = assets_dir / f"item{i}_B02.bin"
        band.write_bytes(b"cog" + bytes([i]))
        scl = assets_dir / f"item{i}_SCL.bin"
        scl.write_bytes(b"scl" + bytes([i]))
        feats.append(
            {
                "id": f"item{i}",
                "collection": "sentinel-2-l2a",
                "bbox": [-86.0 - i, 42.0, -85.0 - i, 43.0],
                "properties": {"eo:cloud_cover": cc, "datetime": f"2025-06-0{i+1}T00:00:00Z"},
                "assets": {
                    "B02": {"href": f"file://{band}"},
                    "SCL": {"href": f"file://{scl}"},
                    "B08": {"href": f"file://{band}"},
                },
            }
        )
    cat = tmp_path / "catalog.json"
    cat.write_text(json.dumps({"type": "FeatureCollection", "features": feats}))
    return cat


def test_stac_fixture_search_and_download(stac_catalog, tmp_path):
    out = tmp_path / "stac_out"
    r = I.stac_asset_download(
        api_url=str(stac_catalog),
        collection="sentinel-2-l2a",
        out=str(out),
        query_json='{"eo:cloud_cover":{"lt":20}}',
        asset_keys=["B02", "SCL"],
    )
    assert r["items"] == ["item0", "item1"]  # cc=45 filtered out
    assert len(r["downloaded"]) == 4  # 2 items x 2 selected assets
    assert (out / "item0" / "item.json").exists()
    r2 = I.stac_asset_download(
        api_url=str(stac_catalog), collection="sentinel-2-l2a", out=str(out),
        query_json='{"eo:cloud_cover":{"lt":20}}', asset_keys=["B02", "SCL"],
    )
    assert len(r2["skipped"]) == 4
    r3 = I.stac_asset_download(
        api_url=str(stac_catalog), collection="sentinel-2-l2a",
        out=str(tmp_path / "o3"), max_items=1,
    )
    assert r3["items"] == ["item0"]


def test_stac_datetime_range_filter(stac_catalog, tmp_path):
    r = I.stac_asset_download(
        api_url=str(stac_catalog), collection="sentinel-2-l2a",
        out=str(tmp_path / "o4"), datetime="2025-06-02T00:00:00Z/..",
        save_item_json=False, asset_keys=[],
    )
    assert r["items"] == ["item1", "item2"]


# -- catalog / metadata -----------------------------------------------------

def test_vector_facts_profile(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], ["id", "name"]
    )
    r = C.vector_facts(df, str(tmp_path), name="t")
    facts = json.load(open(r["vector_facts_json"]))
    assert facts["row_count"] == 3
    by_name = {c["name"]: c for c in facts["columns"]}
    assert by_name["name"]["null_count"] == 1
    assert by_name["id"]["type"] == "bigint"


def test_evidence_research_upsert_yaml_sync_chain(spark, tmp_path):
    """O2 -> O3 -> O4 -> O5 -> O6 end to end: profile, bundle evidence,
    synthesize the research doc deterministically, upsert, yaml-sync."""
    df = spark.createDataFrame([(1, "x")], ["id", "v"])
    vf = C.vector_facts(df, str(tmp_path / "facts"), name="stage.t_v1")
    ev = C.evidence_bundle(
        df, "stage.t_v1", str(tmp_path / "ev"), notes="hello",
        vector_facts_json=vf["vector_facts_json"],
    )
    assert json.load(open(ev["sample_file"]))[0]["id"] == 1
    res = C.dataset_research(
        "stage.t_v1", str(tmp_path / "research"), title="T", data_class="STAGE",
        sample_file=ev["sample_file"], schema_file=ev["schema_file"],
        notes_file=ev["notes_file"], vector_facts_json=vf["vector_facts_json"],
    )
    # the research doc is SYNTHESIZED from the evidence, not a stub marker
    rec = res["record"]
    assert rec["generator"] == "evidence-synthesis-v1"
    assert rec["row_count"] == 1
    assert "id" in rec["description"] and "v" in rec["description"]
    assert {c["name"] for c in rec["columns"]} == {"id", "v"}
    assert rec["columns"][0]["approx_distinct"] == 1
    assert "hello" in rec["description"]
    # deterministic: same evidence -> identical document
    res2 = C.dataset_research(
        "stage.t_v1", str(tmp_path / "research2"), title="T", data_class="STAGE",
        sample_file=ev["sample_file"], schema_file=ev["schema_file"],
        notes_file=ev["notes_file"], vector_facts_json=vf["vector_facts_json"],
    )
    assert res2["record"] == rec
    cat = str(tmp_path / "catalog.json")
    up1 = C.catalog_json_upsert(res["output_file"], cat, source_step="05_ai_research")
    assert up1["inserted"]
    doc = json.load(open(cat))
    assert doc["stage.t_v1"]["source_step"] == "05_ai_research"
    # second upsert with changed title updates, not duplicates
    res["record"]["title"] = "T2"
    up2 = C.catalog_json_upsert(res["record"], cat)
    assert not up2["inserted"]
    assert json.load(open(cat))["stage.t_v1"]["title"] == "T2"

    repo = str(tmp_path / "repo")
    C.catalog_yaml_sync("stage.t_v1", cat, repo)
    import yaml

    y = yaml.safe_load(open(os.path.join(repo, "stage.t_v1.yml")))
    assert y["title"] == "T2"
    # human edit preserved when overwrite_managed_fields=False
    y["title"] = "Human title"
    yaml.safe_dump(y, open(os.path.join(repo, "stage.t_v1.yml"), "w"))
    C.catalog_yaml_sync("stage.t_v1", cat, repo, overwrite_managed_fields=False)
    assert yaml.safe_load(open(os.path.join(repo, "stage.t_v1.yml")))["title"] == "Human title"
    C.catalog_yaml_sync("stage.t_v1", cat, repo, overwrite_managed_fields=True)
    assert yaml.safe_load(open(os.path.join(repo, "stage.t_v1.yml")))["title"] == "T2"


# -- plugins wired through a YAML pipeline ----------------------------------

def test_ingest_pipeline_end_to_end(spark, tmp_path, tree):
    """Mirror tree -> extract nothing -> profile with Spark -> catalog."""
    from shared_etl_pipelines_spark.plans import PipelineRunner, PipelineSpec

    yml = f"""
vars:
  src: "file://{tree}"
  out: "{tmp_path}/land"
steps:
  - name: "{{sys.step.NN}}_mirror"
    plugin: ftp_download_tree
    args: {{url: "{{src}}", out: "{{out}}/raw", filename_glob: "*.tif", overwrite: false}}
    output_var: mirror
  - name: "{{sys.step.NN}}_facts"
    plugin: vector_facts
    args: {{input_path: "{tmp_path}/t.parquet", output_dir: "{{out}}/facts", name: t}}
    output_var: facts
  - name: "{{sys.step.NN}}_research"
    plugin: ai_dataset_research
    args:
      dataset_id: raw.tree_v1
      output_dir: "{{out}}/research"
      title: "Mirrored tree"
  - name: "{{sys.step.NN}}_upsert"
    plugin: catalog_json_upsert
    args:
      research_file: "{{out}}/research/raw.tree_v1.research.json"
      catalog_json: "{{out}}/catalog.json"
      source_step: "{{sys.step.NN}}_upsert"
"""
    spark.range(3).write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    runner = PipelineRunner(spark)
    res = runner.run(PipelineSpec.from_yaml(yml))
    assert len(res.outputs["mirror"]["downloaded"]) == 4
    assert json.load(open(res.outputs["facts"]["vector_facts_json"]))["row_count"] == 3
    cat = json.load(open(f"{tmp_path}/land/catalog.json"))
    assert cat["raw.tree_v1"]["source_step"] == "04_upsert"


def test_pipe_delimited_gz_read(spark, tmp_path):
    """NASS Quick Stats shape: gzipped pipe-delimited text (S4 — Spark
    reads .gz natively, so the reference's gunzip step disappears;
    SURVEY.md §2.1, usda_nass download-quickstats yml:10-17,33)."""
    import gzip

    p = tmp_path / "qs.crops.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write("SOURCE_DESC|YEAR|VALUE\n")
        f.write("SURVEY|2023|1,234\n")
        f.write("CENSUS|2022|567\n")
    from shared_etl_pipelines_spark.plans.builtins import read_csv

    class _Ctx:
        pass

    ctx = _Ctx()
    ctx.spark = spark
    out = read_csv(ctx, str(p), header=True, sep="|")["df"]
    rows = {(r["SOURCE_DESC"], r["YEAR"], r["VALUE"]) for r in out.collect()}
    assert rows == {("SURVEY", 2023, "1,234"), ("CENSUS", 2022, "567")}


def test_stac_python_datasource(spark, stac_catalog):
    """S5 as a native Spark read: predicates applied at the source,
    one row per (item, asset), partition-parallel."""
    from shared_etl_pipelines_spark.sources.stac_datasource import StacItemsDataSource

    spark.dataSource.register(StacItemsDataSource)
    df = (
        spark.read.format("stac_items")
        .option("path", str(stac_catalog))
        .option("collection", "sentinel-2-l2a")
        .option("query_json", '{"eo:cloud_cover": {"lt": 20}}')
        .option("asset_keys", "B02,SCL")
        .load()
    )
    rows = df.collect()
    # cloud_cover 5 and 15 pass, 45 filtered; 2 asset keys each
    assert len(rows) == 4
    assert {r["item_id"] for r in rows} == {"item0", "item1"}
    assert {r["asset_key"] for r in rows} == {"B02", "SCL"}
    assert all(r["asset_href"].startswith("file://") for r in rows)
    props = json.loads(rows[0]["properties_json"])
    assert "eo:cloud_cover" in props

    # datetime range + bbox filters, same semantics as the ingest task
    df2 = (
        spark.read.format("stac_items")
        .option("path", str(stac_catalog))
        .option("datetime", "2025-06-02T00:00:00Z/..")
        .load()
    )
    assert {r["item_id"] for r in df2.collect()} == {"item1", "item2"}
    df3 = (
        spark.read.format("stac_items")
        .option("path", str(stac_catalog))
        .option("bbox", "-86.5,41.0,-86.0,44.0")
        .load()
    )
    # items whose bbox intersects [-86.5, -86.0]: item0 (-86,-85) touches,
    # item1 (-87,-86) touches, item2 (-88,-87) does not
    assert {r["item_id"] for r in df3.collect()} == {"item0", "item1"}


def test_csv_quarantine_split(spark, sf_dir):
    """PERMISSIVE CSV: malformed rows (untypeable doc_id) carry the
    whole raw line in _corrupt_record with doc_id NULL while their
    parseable cells survive; good rows parse fully typed."""
    from shared_etl_pipelines_spark.sources.csvq import (
        ensure_demo_csv,
        read_csv_quarantine,
    )

    df = read_csv_quarantine(spark, ensure_demo_csv(sf_dir)).cache()
    bad = df.filter("_corrupt_record IS NOT NULL")
    good = df.filter("_corrupt_record IS NULL")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    n_bad = bad.count()
    assert n_bad >= 1 and n_bad + good.count() == n_docs
    r = bad.first()
    assert r["doc_id"] is None and r["_corrupt_record"].startswith("id-")
    assert r["source"].startswith("crawl-")  # partial parse survives
    assert good.filter("doc_id IS NULL").count() == 0
    df.unpersist()


def test_manifest_survives_partial_batch_failure(tree, tmp_path):
    """A URL that 404s mid-batch aborts web_download_list, but the
    validators already earned by completed conditional downloads must
    land on disk (finally-save, ADVICE r10) so the rerun 304-skips."""
    import json
    import os

    import pytest

    out = tmp_path / "dl"
    good = [
        f"file://{tree}/2020/prism_ppt_us_30s_20200101.tif",
        f"file://{tree}/2020/prism_ppt_us_30s_20200102.tif",
    ]
    bad = f"file://{tree}/2020/definitely-missing-404.tif"
    with pytest.raises(Exception):
        I.web_download_list(
            urls=good + [bad], out=str(out), conditional_get=True,
            max_workers=1,
        )
    mf = os.path.join(str(out), ".ingest_manifest.json")
    assert os.path.exists(mf)
    saved = json.load(open(mf))
    assert any(u in saved for u in good)
