"""WebDataset tar-shard ingestion (sources/webdataset.py): shard
writer determinism, distributed member explode, per-sample regroup,
incomplete samples, corrupt-shard quarantine."""

import os

from pyspark.sql import functions as F

from shared_etl_pipelines_spark.sources.webdataset import (
    read_webdataset,
    write_webdataset_shards,
)


def _samples(n):
    return [
        (
            f"{i:09d}",
            {"txt": b"text-" * (i + 1), "json": b'{"i":%d}' % i},
        )
        for i in range(n)
    ]


def test_shard_writer_is_deterministic(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    assert write_webdataset_shards(_samples(10), a, shard_size=4) == 3
    write_webdataset_shards(_samples(10), b, shard_size=4)
    for f in sorted(os.listdir(a)):
        with open(os.path.join(a, f), "rb") as fa, open(
            os.path.join(b, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f


def test_read_explodes_members_and_assigns_shards(spark, tmp_path):
    root = str(tmp_path / "wds")
    write_webdataset_shards(_samples(10), root, shard_size=4)
    rows = read_webdataset(spark, root).collect()
    # 10 samples x 2 members
    assert len(rows) == 20
    by_key = {}
    for r in rows:
        by_key.setdefault(r["key"], []).append(r)
    for i in range(10):
        k = f"{i:09d}"
        got = by_key[k]
        assert {r["ext"] for r in got} == {"txt", "json"}
        assert all(r["shard_idx"] == i // 4 for r in got)
        txt = next(r for r in got if r["ext"] == "txt")
        assert bytes(txt["blob"]) == b"text-" * (i + 1)
        assert txt["n_bytes"] == 5 * (i + 1)


def test_corrupt_shard_quarantines_not_crashes(spark, tmp_path):
    root = str(tmp_path / "wds")
    write_webdataset_shards(_samples(4), root, shard_size=4)
    with open(os.path.join(root, "shard-00001.tar"), "wb") as fh:
        fh.write(b"this is not a tar archive at all" * 3)
    rows = read_webdataset(spark, root)
    bad = rows.filter(F.col("ext") == "_corrupt").collect()
    assert len(bad) == 1 and bad[0]["shard"] == "shard-00001.tar"
    assert rows.filter(F.col("ext") != "_corrupt").count() == 8


def test_demo_corpus_missing_member_class(spark, sf_dir):
    from shared_etl_pipelines_spark.sources.webdataset import (
        ensure_demo_webdataset,
    )

    rows = read_webdataset(spark, ensure_demo_webdataset(sf_dir))
    per_key = (
        rows.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("doc_id", F.col("key").cast("long"))
        .collect()
    )
    for r in per_key:
        want = 2 if r["doc_id"] % 43 == 0 else 3
        assert r["n"] == want, r


def test_zip_shards_round_trip_and_corrupt(spark, tmp_path):
    from shared_etl_pipelines_spark.sources.webdataset import (
        read_zipdataset,
        write_zipdataset_shards,
    )

    samples = [
        (f"{i:09d}", {"txt": b"zip-" * (i + 1), "json": b"{}"})
        for i in range(6)
    ]
    root = str(tmp_path / "zds")
    assert write_zipdataset_shards(samples, root, shard_size=4) == 2
    rows = read_zipdataset(spark, root).collect()
    assert len(rows) == 12
    txt = {r["key"]: bytes(r["blob"]) for r in rows if r["ext"] == "txt"}
    assert txt == {f"{i:09d}": b"zip-" * (i + 1) for i in range(6)}
    # DEFLATE actually engaged: a large repetitive payload compresses
    # far below its raw size (header overhead dominates tiny members)
    import os

    big = str(tmp_path / "zds_big")
    write_zipdataset_shards(
        [("000000000", {"txt": b"compress me " * 4000})], big, shard_size=1
    )
    assert os.path.getsize(os.path.join(big, "shard-00000.zip")) < 4000
    # corrupt archive quarantines
    with open(os.path.join(root, "shard-00001.zip"), "wb") as fh:
        fh.write(b"PK\x03\x04 definitely broken")
    rows2 = read_zipdataset(spark, root)
    assert rows2.filter("ext = '_corrupt'").count() == 1
    assert rows2.filter("ext != '_corrupt'").count() == 8


def test_zip_writer_is_deterministic(tmp_path):
    from shared_etl_pipelines_spark.sources.webdataset import (
        write_zipdataset_shards,
    )

    samples = [(f"{i:09d}", {"txt": b"x" * (50 + i)}) for i in range(5)]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_zipdataset_shards(samples, a, shard_size=3)
    write_zipdataset_shards(samples, b, shard_size=3)
    import os

    for f in sorted(os.listdir(a)):
        with open(os.path.join(a, f), "rb") as fa, open(
            os.path.join(b, f), "rb"
        ) as fb:
            assert fa.read() == fb.read(), f


def test_zip64_structures_read_and_truncation_quarantines(spark, tmp_path):
    """ZIP64 coverage (r9, VERDICT r8 item 5): (a) shards written
    through the ZIP64 local-header path (8-byte sizes in the extra
    field) read identically to classic shards; (b) a shard whose
    member count forces the ZIP64 end-of-central-directory record
    reads completely; (c) truncating that central directory
    quarantines as one _corrupt row instead of wrong rows."""
    import os
    import struct
    import zipfile

    from shared_etl_pipelines_spark.sources.webdataset import (
        read_zipdataset,
        write_zipdataset_shards,
    )

    # (a) forced ZIP64 local headers
    root = str(tmp_path / "z64members")
    samples = [
        (f"{i:09d}", {"txt": b"payload-" * (i + 1), "json": b"{}"})
        for i in range(5)
    ]
    write_zipdataset_shards(samples, root, shard_size=8, force_zip64=True)
    with open(os.path.join(root, "shard-00000.zip"), "rb") as fh:
        blob = fh.read()
    assert struct.pack("<HH", 1, 16) in blob  # ZIP64 extra-field header
    rows = read_zipdataset(spark, root).collect()
    got = {r["key"]: r["blob"] for r in rows if r["ext"] == "txt"}
    assert got == {f"{i:09d}": b"payload-" * (i + 1) for i in range(5)}

    # (b) ZIP64 end-of-central-directory via member count > 0xFFFF
    big = str(tmp_path / "z64eocd")
    os.makedirs(big)
    path = os.path.join(big, "shard-00000.zip")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for i in range(0x10000 + 3):
            info = zipfile.ZipInfo(
                f"{i:09d}.txt", date_time=(1980, 1, 1, 0, 0, 0)
            )
            z.writestr(info, b"x")
    with open(path, "rb") as fh:
        tail = fh.read()[-200:]
    assert b"PK\x06\x06" in tail  # zip64 end-of-central-directory record
    out = read_zipdataset(spark, big)
    assert out.count() == 0x10000 + 3
    assert out.where("ext = '_corrupt'").count() == 0

    # (c) truncation inside the zip64 central directory -> loud
    # quarantine row, never partial/wrong members
    with open(path, "rb") as fh:
        whole = fh.read()
    cd_off = whole.rindex(b"PK\x06\x06")
    trunc = str(tmp_path / "z64trunc")
    os.makedirs(trunc)
    with open(os.path.join(trunc, "shard-00000.zip"), "wb") as fh:
        fh.write(whole[: cd_off - 1000])
    qrows = read_zipdataset(spark, trunc).collect()
    assert len(qrows) == 1 and qrows[0]["ext"] == "_corrupt"


def test_reshard_roundtrip_identical_census_and_budget(spark, tmp_path, sf_dir):
    """Reshard (r9, VERDICT r8 item 8): write -> read -> IDENTICAL
    sample census (every key, ext and payload byte), per-shard payload
    respects the watermark contract (overshoot <= one sample), and the
    executor-written manifest matches the plan."""
    import os

    from shared_etl_pipelines_spark.sources.webdataset import (
        ensure_demo_webdataset,
        read_webdataset,
        reshard_webdataset,
    )

    in_root = ensure_demo_webdataset(sf_dir)
    out_root = str(tmp_path / "resharded")
    budget = 4096
    manifest = {
        r["new_shard"]: r
        for r in reshard_webdataset(spark, in_root, out_root, budget).collect()
    }
    assert len(manifest) > 1
    # every new shard exists on disk with the planned name
    for shard, r in manifest.items():
        assert os.path.basename(r["path"]) == f"shard-{shard:05d}.tar"
        assert os.path.exists(r["path"])

    before = {
        (r["key"], r["ext"]): bytes(r["blob"])
        for r in read_webdataset(spark, in_root)
        .where("ext <> '_corrupt'")
        .collect()
    }
    after_rows = read_webdataset(spark, out_root).collect()
    after = {(r["key"], r["ext"]): bytes(r["blob"]) for r in after_rows}
    assert after == before  # identical sample census, byte for byte

    # watermark contract: shard payload < budget + its largest sample
    by_shard: dict[int, dict[str, int]] = {}
    for r in after_rows:
        by_shard.setdefault(r["shard_idx"], {}).setdefault(r["key"], 0)
        by_shard[r["shard_idx"]][r["key"]] += r["n_bytes"]
    for shard, samples in by_shard.items():
        total = sum(samples.values())
        assert total == manifest[shard]["payload_bytes"]
        assert total < budget + max(samples.values())
    # global-bin accounting: shard k holds exactly the samples whose
    # exclusive cumsum lands in [k*budget, (k+1)*budget) — replay the
    # cumsum over the key order and check every assignment
    sizes_by_key: dict[str, int] = {}
    shard_by_key: dict[str, int] = {}
    for r in after_rows:
        sizes_by_key[r["key"]] = sizes_by_key.get(r["key"], 0) + r["n_bytes"]
        shard_by_key[r["key"]] = r["shard_idx"]
    cum = 0
    for key in sorted(sizes_by_key):
        assert shard_by_key[key] == cum // budget
        cum += sizes_by_key[key]
