"""Content gate on the shared own-writer parquet fixture (VERDICT r13
task #1): every acquisition must verify fixture rows == source rows,
self-heal a corrupt or polluted cache by rebuilding once, and key the
cache on the full build recipe (not just tag+kwargs)."""

import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from shared_etl_pipelines_spark.queries_llm import _own_writer_fixture

COLS = (("l_orderkey", "int64"), ("l_quantity", "double"))
KW = dict(
    compression="SNAPPY", row_group_size=16384, use_dictionary=True,
    page_rows=512, write_page_index=True,
)


def _get(spark, sf, tag="pageindex-v2", n_shards=8):
    return _own_writer_fixture(
        spark, sf, "lineitem", tag, COLS, n_shards, **KW
    )


def _content(paths):
    t = pa.concat_tables([pq.read_table(p) for p in paths])
    return t.sort_by([("l_orderkey", "ascending"), ("l_quantity", "ascending")])


def test_fresh_fixture_matches_source(spark, sf_dir):
    paths = _get(spark, sf_dir)
    src = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).sort_by([("l_orderkey", "ascending"), ("l_quantity", "ascending")])
    assert _content(paths).equals(src)


def test_stray_shard_file_is_healed(spark, sf_dir):
    """A shard file on disk that the marker does not list would leak
    into glob readers (ownparquet_datasource_scan); the gate must
    detect it and rebuild a clean shard set."""
    paths = _get(spark, sf_dir)
    d = os.path.dirname(paths[0])
    stray = os.path.join(d, "shard_00099.parquet")
    shutil.copy(paths[0], stray)
    paths2 = _get(spark, sf_dir)
    assert not os.path.exists(os.path.join(d, "shard_00099.parquet"))
    assert sorted(os.path.basename(p) for p in paths2) == sorted(
        json.load(open(os.path.join(os.path.dirname(paths2[0]), "_SUCCESS")))
    )


def test_corrupt_cached_content_is_healed(spark, sf_dir):
    """A cached fixture whose VALUES diverge from the source (the r13
    driver-red signature) must fail the multiset-signature gate and be
    rebuilt, not returned."""
    paths = _get(spark, sf_dir)
    # overwrite shard 0 with shard 1's bytes: still valid parquet, both
    # readers would agree on it, but content != source
    shutil.copy(paths[1], paths[0])
    paths2 = _get(spark, sf_dir)
    src = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    ).sort_by([("l_orderkey", "ascending"), ("l_quantity", "ascending")])
    assert _content(paths2).equals(src)


def test_cache_key_covers_build_recipe(spark, sf_dir):
    """n_shards (and cols / writer-code identity, hashed the same way)
    must be part of the cache key: two recipes must never share bytes."""
    a = _get(spark, sf_dir, tag="gate-key-test", n_shards=4)
    b = _get(spark, sf_dir, tag="gate-key-test", n_shards=6)
    assert os.path.dirname(a[0]) != os.path.dirname(b[0])
    assert len(a) == 4 and len(b) == 6
