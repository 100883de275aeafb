"""The packaged example pipelines: the requires_pipelines DAG runs the
stage layer first, the derived rollsum matches a directly-built window
plan, and stage memoization (skip-if-exists) holds on re-run."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from shared_etl_pipelines_spark.plans import PipelineRunner

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "shared_etl_pipelines_spark", "plans", "examples",
)


def test_rollsum_pipeline_chain(spark, sf_dir, tmp_path):
    runner = PipelineRunner(spark, env={"sf_dir": sf_dir, "basedir": str(tmp_path)})
    res = runner.run(os.path.join(EXAMPLES, "rollsum_daily.yml"))
    assert not res.outputs["landed"]["skipped"]
    # upstream stage layer was run first by requires_pipelines
    assert os.path.isdir(str(tmp_path / "stage_daily_cells"))

    got = spark.read.parquet(str(tmp_path / "stage_daily_cells_rollsum"))
    # direct equivalent: stage aggregate + trailing windows
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    daily = (
        li.groupBy(
            (F.col("l_suppkey") % 8).alias("cell"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(F.sum("l_quantity").alias("value"))
    )
    out = daily
    for w in (3, 7):
        win = Window.partitionBy("cell").orderBy("day").rowsBetween(-(w - 1), 0)
        out = out.withColumn(f"sum_{w}", F.sum("value").over(win))
    want = {
        (r["cell"], r["day"]): (round(r["sum_3"], 6), round(r["sum_7"], 6))
        for r in out.collect()
    }
    got_map = {
        (r["cell"], r["day"]): (round(r["sum_3"], 6), round(r["sum_7"], 6))
        for r in got.collect()
    }
    assert got_map == want and len(got_map) > 100

    # stage layer is skip-if-exists (overwrite: false): a fresh runner
    # re-executes the pipeline but skips the landed write
    runner2 = PipelineRunner(spark, env={"sf_dir": sf_dir, "basedir": str(tmp_path)})
    res2 = runner2.run(os.path.join(EXAMPLES, "stage_daily_cells.yml"))
    assert res2.outputs["landed"]["skipped"]


def test_dedup_curation_pipeline(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from shared_etl_pipelines_spark.operators.sampling import stratified_sample
    from shared_etl_pipelines_spark.plans import PipelineRunner, PipelineSpec

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shared_etl_pipelines_spark", "plans", "examples", "dedup_curation.yml",
    )
    runner = PipelineRunner(spark)
    result = runner.run(path, var_overrides={"sf_dir": sf_dir})
    got = result.outputs["result"]["df"]

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    keepers = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).filter(
        F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
    ).select(docs.columns)
    want = stratified_sample(keepers, "doc_id", "lang", {"en": 0.5, "es": 0.25}, 0.1)
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert got_ids == want_ids and len(got_ids) > 0


def test_quality_gate_pipeline_publishes(spark, sf_dir, tmp_path):
    """Profile -> expectations gate -> z-ordered publish, as one pipeline."""
    from shared_etl_pipelines_spark.plans import PipelineRunner

    runner = PipelineRunner(spark, env={"sf_dir": sf_dir, "basedir": str(tmp_path)})
    res = runner.run(os.path.join(EXAMPLES, "quality_gate.yml"))
    prof = {r["col"]: r for r in res.outputs["profile"]["df"].collect()}
    assert prof["l_quantity"]["n_null"] == 0
    gate = {r["check_name"]: r for r in res.outputs["gate"]["df"].collect()}
    assert all(r["pass"] for r in gate.values())
    out = spark.read.parquet(str(tmp_path / "published_lineitem"))
    n = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    assert out.count() == n


def test_county_daily_from_artifacts_pipeline(spark, tmp_path):
    """The reference's county_daily_aggregate dataflow on its real artifact
    formats: GeoTIFF rasters -> long table -> shapefile zones -> per-
    (county, day) multi-agg stats -> combined CSV."""
    import csv as _csv
    import glob

    import numpy as np

    from shared_etl_pipelines_spark.operators.geo import Polygon
    from shared_etl_pipelines_spark.plans import PipelineRunner
    from shared_etl_pipelines_spark.sources.raster import (
        DEMO_DAYS,
        demo_raster_values,
        ensure_demo_rasters,
    )
    from shared_etl_pipelines_spark.sources.vector import write_shapefile

    raster_dir = ensure_demo_rasters(str(tmp_path / "tifs"))
    # two square "counties" over the 16x16 pixel grid; cell centers are at
    # integer (x, y), so edges at half-integers avoid on-edge ambiguity
    west = [[-0.5, -0.5], [7.5, -0.5], [7.5, 15.5], [-0.5, 15.5]]
    east = [[7.5, -0.5], [15.5, -0.5], [15.5, 15.5], [7.5, 15.5]]
    shp_base = str(tmp_path / "counties")
    write_shapefile(
        shp_base,
        [
            Polygon("26001", west, {"GEOID": "26001", "NAME": "West"}),
            Polygon("26003", east, {"GEOID": "26003", "NAME": "East"}),
        ],
        fields=[("GEOID", "C", 5, 0), ("NAME", "C", 16, 0)],
    )
    runner = PipelineRunner(
        spark,
        env={
            "basedir": str(tmp_path / "out"),
            "raster_dir": raster_dir,
            "county_shp": shp_base + ".shp",
        },
    )
    res = runner.run(os.path.join(EXAMPLES, "county_daily_from_artifacts.yml"))
    assert res.outputs["county_stats"]["n_polygons"] == 2
    (csv_path,) = glob.glob(str(tmp_path / "out" / "county_daily" / "*.csv"))
    with open(csv_path) as f:
        rows = list(_csv.DictReader(f))
    # 2 counties x 10 days
    assert len(rows) == 2 * DEMO_DAYS
    # spot-check day 0 / west county against the formula (nodata 999 dropped)
    v = demo_raster_values(0)[:, :8].astype(float)
    v = v[v != 999.0]
    r = next(
        x for x in rows if x["zone_id"] == "26001" and x["day"] == "2024-03-01"
    )
    assert float(r["ppt_min"]) == v.min() and float(r["ppt_max"]) == v.max()
    assert abs(float(r["ppt_avg"]) - v.mean()) < 1e-9
    assert float(r["ppt_med"]) == float(np.median(v))


def test_quality_gate_aborts_on_violation(spark, sf_dir, tmp_path):
    """A failing expectation must stop the pipeline BEFORE the publish step."""
    import pytest as _pytest
    import yaml

    from shared_etl_pipelines_spark.plans import PipelineRunner

    with open(os.path.join(EXAMPLES, "quality_gate.yml")) as f:
        doc = yaml.safe_load(f)
    # inject an impossible invariant
    for step in doc["steps"]:
        if step["plugin"] == "expect":
            step["args"]["checks"]["impossible"] = "l_quantity > 1000000"
    bad = tmp_path / "bad_gate.yml"
    bad.write_text(yaml.dump(doc))

    runner = PipelineRunner(spark, env={"sf_dir": sf_dir, "basedir": str(tmp_path / "bad")})
    with _pytest.raises(Exception, match="expectations failed.*impossible"):
        runner.run(str(bad))
    assert not (tmp_path / "bad" / "published_lineitem").exists()


def test_llm_curation_pipeline(spark, sf_dir):
    """llm_curation.yml == the direct operator composition: PII scrub ->
    dup-span threshold -> per-source cap."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.functions.text import pii_redact_all
    from shared_etl_pipelines_spark.operators.dedup import duplicated_spans
    from shared_etl_pipelines_spark.plans import PipelineRunner

    path = os.path.join(EXAMPLES, "llm_curation.yml")
    runner = PipelineRunner(spark)
    result = runner.run(path, var_overrides={"sf_dir": sf_dir})
    got = result.outputs["result"]["df"]
    assert "n_pii" in got.columns  # scrub stage ran and annotated

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    clean = docs.withColumn("text", pii_redact_all(F.col("text")))
    prof = duplicated_spans(clean, "doc_id", "text", n=8).groupBy("doc_id").agg(
        F.sum("span_tokens").alias("dup_tokens")
    )
    kept = clean.join(prof, "doc_id", "left").filter(
        F.col("dup_tokens").isNull()
        | (F.col("dup_tokens") <= 0.5 * F.col("n_chars"))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    want = kept.withColumn("_p", F.row_number().over(w)).filter(F.col("_p") <= 15)
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in want.select("doc_id").collect()}
    assert got_ids == want_ids and len(got_ids) > 0


def test_quota_draw_pipeline(spark, sf_dir):
    """quota_draw.yml == direct composition: bloom semi-join on the
    segment dim, then the A-ES weighted per-source sample."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.operators.bloom import bloom_semi_join
    from shared_etl_pipelines_spark.operators.sampling import weighted_sample_topk
    from shared_etl_pipelines_spark.plans import PipelineRunner

    path = os.path.join(EXAMPLES, "quota_draw.yml")
    runner = PipelineRunner(spark)
    result = runner.run(path, var_overrides={"sf_dir": sf_dir})

    seg = result.outputs["seg_orders"]["df"]
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    dim = (
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    want_seg = bloom_semi_join(orders, dim, "o_custkey", "c_custkey")
    assert seg.count() == want_seg.count() > 0

    got = result.outputs["result"]["df"]
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want = weighted_sample_topk(
        docs, "doc_id", "n_chars", k=10, strata_cols=["source"]
    )
    got_ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    want_ids = sorted(r["doc_id"] for r in want.select("doc_id").collect())
    assert got_ids == want_ids and len(got_ids) > 0


def test_graph_communities_pipeline(spark, sf_dir):
    """The YAML graph pipeline must reproduce the direct operator
    composition: same community label histogram, same k-core nodes."""
    import os

    from shared_etl_pipelines_spark.operators.graph import k_core, label_propagation
    from shared_etl_pipelines_spark.plans import PipelineRunner
    from shared_etl_pipelines_spark.queries_analytics import _pr_edges

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "shared_etl_pipelines_spark", "plans", "examples", "graph_communities.yml",
    )
    runner = PipelineRunner(spark)
    result = runner.run(path, var_overrides={"sf_dir": sf_dir})
    got_top = {
        (r["label"], r["size"])
        for r in result.outputs["result"]["df"].collect()
    }
    got_core = {
        r["node"] for r in result.outputs["core"]["df"].collect()
    }

    from pyspark.sql import functions as F

    edges = _pr_edges(spark, sf_dir)
    labels = label_propagation(edges, iterations=3)
    want = (
        labels.groupBy("label").count()
        .orderBy(F.desc("count"), "label")
        .limit(10)
    )
    want_top = {(r["label"], r["count"]) for r in want.collect()}
    want_core = {r["node"] for r in k_core(edges, k=5, rounds=3).collect()}
    assert got_top == want_top
    assert got_core == want_core and len(got_core) > 0


def test_storage_maintenance_pipeline(spark, sf_dir, tmp_path):
    """The YAML storage-maintenance lifecycle (MoR base -> change batch
    -> read -> compact; ANN write -> upsert -> probe -> compact) equals
    the direct operator composition — the plugin-parity pattern of the
    catalog_upsert / write_zordered plugins (VERDICT r5 #8)."""
    import os

    from pyspark.sql import functions as F

    from shared_etl_pipelines_spark.operators.similarity import (
        lsh_topk_from_index,
        write_ann_index,
    )
    from shared_etl_pipelines_spark.sources.warehouse import (
        mor_apply_changes,
        mor_read,
        mor_write_base,
    )

    runner = PipelineRunner(spark, env={"basedir": str(tmp_path / "p")})
    res = runner.run(
        os.path.join(EXAMPLES, "storage_maintenance.yml"),
        var_overrides={"sf_dir": sf_dir},
    )
    assert res.outputs["applied"]["seq"] == 1
    assert res.outputs["applied"]["rows_appended"] > 0
    assert res.outputs["compacted"]["live_rows"] > 0
    assert res.outputs["upserted"]["ids_tombstoned"] > 0
    assert res.outputs["ann_compacted"]["live_rows"] > 0

    # --- MoR parity: pipeline state == direct composition ---
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    dpath = str(tmp_path / "direct_mor")
    mor_write_base(orders, dpath)
    k = F.col("o_orderkey")
    mor_apply_changes(
        spark, dpath, ["o_orderkey"],
        upserts=orders.filter(k % 17 == 0).select(
            "o_orderkey",
            F.lit("1-URGENT").alias("o_orderpriority"),
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        ),
        delete_keys=orders.filter(k % 13 == 0).select("o_orderkey"),
    )
    want = {
        r["o_orderkey"]: (r["o_orderpriority"], round(r["o_totalprice"], 2))
        for r in mor_read(spark, dpath, ["o_orderkey"]).collect()
    }
    got = {
        r["o_orderkey"]: (r["o_orderpriority"], round(r["o_totalprice"], 2))
        for r in spark.read.parquet(str(tmp_path / "p" / "mor_state_out")).collect()
    }
    assert got == want and len(got) > 1000
    # compaction preserved the state in place
    after = {
        r["o_orderkey"]: (r["o_orderpriority"], round(r["o_totalprice"], 2))
        for r in mor_read(
            spark, str(tmp_path / "p" / "mor_orders"), ["o_orderkey"]
        ).collect()
    }
    assert after == want

    # --- snapshot / CDC / audit parity (ran pre-compaction) ---
    base_rows = {
        r["o_orderkey"]
        for r in spark.read.parquet(str(tmp_path / "p" / "mor_asof0_out"))
        .select("o_orderkey")
        .collect()
    }
    assert base_rows == {r["o_orderkey"] for r in orders.select("o_orderkey").collect()}
    ops = {
        r["o_orderkey"]: r["_op"]
        for r in spark.read.parquet(
            str(tmp_path / "p" / "mor_changelog_out")
        ).collect()
    }
    n_upd = sum(1 for v in ops.values() if v == "update")
    n_del = sum(1 for v in ops.values() if v == "delete")
    assert n_upd == orders.filter(F.col("o_orderkey") % 17 == 0).count()
    assert n_del == orders.filter(
        (F.col("o_orderkey") % 13 == 0) & (F.col("o_orderkey") % 17 != 0)
    ).count()
    hist = {
        r["_seq"]: (r["rows_appended"], r["keys_tombstoned"])
        for r in spark.read.parquet(
            str(tmp_path / "p" / "mor_history_out")
        ).collect()
    }
    assert hist[0] == (orders.count(), 0) and hist[1][0] == n_upd

    # --- ANN parity: pipeline probe == probe of a from-scratch index
    # over the post-change corpus state ---
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    final = emb.filter(F.col("vec_id") % 10 != 7).select(
        "vec_id",
        F.when(F.col("vec_id") % 10 == 3, F.reverse("embedding"))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    rpath = str(tmp_path / "direct_ann")
    write_ann_index(final, rpath)
    # probes use the ORIGINAL vectors (the pipeline's probe step reads
    # the raw embeddings table), not the post-upsert corpus state
    qs = emb.filter(F.col("vec_id") < 5).select("vec_id", "embedding")
    want_ann = {
        (r["query_id"], r["rn"]): (r["vec_id"], round(r["cosine"], 6))
        for r in lsh_topk_from_index(spark, rpath, qs, k=10).collect()
    }
    got_ann = {
        (r["query_id"], r["rn"]): (r["vec_id"], round(r["cosine"], 6))
        for r in spark.read.parquet(str(tmp_path / "p" / "ann_topk_out")).collect()
    }
    assert got_ann == want_ann and len(got_ann) == 50
    # post-compaction probe still answers identically
    got_after = {
        (r["query_id"], r["rn"]): (r["vec_id"], round(r["cosine"], 6))
        for r in res.outputs["topk_after"]["df"].collect()
    }
    assert got_after == want_ann


def test_evolved_analytics_pipeline(spark, sf_dir, tmp_path):
    """The round-7 plugins (write_partition_era / read_evolved /
    holt_smooth / read_xml / containment_pairs) driven through the
    pipeline language equal the direct operator compositions."""
    import os

    from shared_etl_pipelines_spark.operators.dedup import containment_pairs
    from shared_etl_pipelines_spark.operators.hypertable import (
        holt_linear_smooth,
    )
    from shared_etl_pipelines_spark.sources.xmlq import ensure_demo_xml

    runner = PipelineRunner(spark, env={"basedir": str(tmp_path)})
    res = runner.run(
        os.path.join(EXAMPLES, "evolved_analytics.yml"),
        var_overrides={"sf_dir": sf_dir, "xml_dir": ensure_demo_xml(sf_dir)},
    )
    assert res.outputs["era0"]["era"] == 0 and res.outputs["era1"]["era"] == 1

    # evolved read parity: direct SQL over the source table
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    want_agg = {
        (r["o_year"], r["n_orders"])
        for r in orders.filter(
            (F.year("o_orderdate").isin(1995, 1997))
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .collect()
    }
    got_agg = {
        (r["o_year"], r["n_orders"])
        for r in spark.read.parquet(str(tmp_path / "urgent_by_year")).collect()
    }
    assert got_agg == want_agg and len(got_agg) == 2

    # holt parity: pipeline output == direct operator
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    daily = events.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long"))
        .cast("double")
        .alias("v")
    )
    want_h = {
        (r["event_type"], r["day"]): (r["fitted"], r["level"], r["trend"])
        for r in holt_linear_smooth(daily, ["event_type"], "day", "v").collect()
    }
    got_h = {
        (r["event_type"], r["day"]): (r["fitted"], r["level"], r["trend"])
        for r in spark.read.parquet(str(tmp_path / "holt_daily")).collect()
    }
    assert got_h == want_h and len(got_h) > 50

    # xml quarantine split parity with the fixture plant
    import pyarrow.parquet as pq

    n_docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).num_rows
    got_split = {
        r["ok"]: r["n"]
        for r in spark.read.parquet(str(tmp_path / "xml_split")).collect()
    }
    assert got_split[True] + got_split[False] == n_docs
    assert got_split[False] > 0

    # containment parity
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    want_c = {
        (r["doc_a"], r["doc_b"])
        for r in containment_pairs(docs, "doc_id", "text", threshold=0.6).collect()
    }
    got_c = {
        (r["doc_a"], r["doc_b"])
        for r in spark.read.parquet(str(tmp_path / "containment_pairs")).collect()
    }
    assert got_c == want_c


def test_media_curation_pipeline(spark, sf_dir, tmp_path):
    """The round-8 plugins (synthetic_media_assets / pdf_text_extract /
    mp4_track_scan / mp4_keyframe_stats / flac_decode /
    curation_drop_audit) driven through the pipeline language equal the
    direct operator compositions."""
    import os

    from shared_etl_pipelines_spark.queries import REGISTRY
    from shared_etl_pipelines_spark.sources.multimodal import (
        flac_audio_stats,
        pdf_text_rows,
        synthetic_flac_assets,
        synthetic_pdf_assets,
    )

    runner = PipelineRunner(spark, env={"basedir": str(tmp_path)})
    runner.run(
        os.path.join(EXAMPLES, "media_curation.yml"),
        var_overrides={"sf_dir": sf_dir},
    )
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    # pdf parity: pipeline output == direct operator
    want_pdf = {
        (r["doc_id"], r["page_idx"]): (r["is_extracted"], r["text"])
        for r in pdf_text_rows(synthetic_pdf_assets(docs)).collect()
    }
    got_pdf = {
        (r["doc_id"], r["page_idx"]): (r["is_extracted"], r["text"])
        for r in spark.read.parquet(str(tmp_path / "pdf_text")).collect()
    }
    assert got_pdf == want_pdf and len(got_pdf) > 0

    # mp4 scan: every doc has a video track; odd docs add audio
    tracks = spark.read.parquet(str(tmp_path / "mp4_tracks")).collect()
    vide = [r for r in tracks if r["handler"] == "vide"]
    soun = [r for r in tracks if r["handler"] == "soun"]
    assert len(vide) == docs.count()
    assert len(soun) == docs.filter("doc_id % 2 = 1").count()
    kf = spark.read.parquet(str(tmp_path / "mp4_keyframes")).collect()
    assert {r["doc_id"] for r in kf if r["reason"] == "codec:avc1"} == {
        r["doc_id"] for r in vide if r["codec"] == "avc1"
    }

    # flac parity
    want_flac = {
        r["doc_id"]: (r["is_real_decode"], r["sum_samples"])
        for r in flac_audio_stats(synthetic_flac_assets(docs)).collect()
    }
    got_flac = {
        r["doc_id"]: (r["is_real_decode"], r["sum_samples"])
        for r in spark.read.parquet(str(tmp_path / "flac_stats")).collect()
    }
    assert got_flac == want_flac

    # drop audit parity with the registry query
    want_audit = {
        r["stage"]: (r["n_units"], r["n_dropped"])
        for r in REGISTRY["curation_drop_audit"].fn(spark, sf_dir).collect()
    }
    got_audit = {
        r["stage"]: (r["n_units"], r["n_dropped"])
        for r in spark.read.parquet(str(tmp_path / "drop_audit")).collect()
    }
    assert got_audit == want_audit and len(got_audit) == 9
