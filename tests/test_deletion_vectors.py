"""Deletion vectors: roaring codec units + merge-on-read DELETE
end-to-end (sources/dv.py, sources/delta.py:delete_delta).

The reference REJECTS DV tables (README.md:66); this suite pins the
one-feature-past-the-reference support: reading foreign DVs (inline
and file-backed, array/bitmap/run containers) and writing them via
DELETE, with optimize purging and vacuum collecting the bins."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lakeapi_spark.sources import dv as D


class TestCodec:
    def test_z85_spec_vector(self):
        """The ZeroMQ Z85 RFC test vector: 0x86..0x5B <-> 'HelloWorld'."""
        raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
        assert D.z85_encode(raw) == "HelloWorld"
        assert D.z85_decode("HelloWorld") == raw

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
    def test_z85_roundtrip_property(self, data):
        assert D.z85_decode(D.z85_encode(data)) == data

    def test_z85_rejects_bad_input(self):
        with pytest.raises(ValueError, match="multiple of 4"):
            D.z85_encode(b"abc")
        with pytest.raises(ValueError, match="multiple of 5"):
            D.z85_decode("abcd")
        with pytest.raises(ValueError, match="invalid z85"):
            D.z85_decode('abcd"')

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=(1 << 34)),
            max_size=300,
            unique=True,
        )
    )
    def test_rba_roundtrip_property(self, values):
        """serialize->parse is identity for any position set, including
        values past 2^32 (multiple 32-bit bitmaps)."""
        values = sorted(values)
        assert D.parse_rba(D.serialize_rba(values)) == values

    def test_bitmap_container_roundtrip(self):
        """> 4096 values in one 16-bit key forces a bitmap container."""
        values = sorted(set(range(0, 9000)) | {65535, 65536, 1 << 19})
        got, end = D._parse_rb32(D._serialize_rb32(values), 0)
        assert got == values

    def test_run_container_parse(self):
        """Foreign writers emit run containers (cookie 12347); parse the
        hand-framed layout from the RoaringFormatSpec: run bitset, then
        per run (start, length-1)."""
        buf = (
            struct.pack("<I", 12347 | (0 << 16))  # 1 container (n-1=0)
            + bytes([1])  # run bitset: container 0 is runs
            + struct.pack("<HH", 0, 9)  # key 0, cardinality 10
            + struct.pack("<H", 2)  # 2 runs
            + struct.pack("<HH", 3, 4)  # 3..7
            + struct.pack("<HH", 100, 4)  # 100..104
        )
        got, _ = D._parse_rb32(buf, 0)
        assert got == list(range(3, 8)) + list(range(100, 105))

    def test_dv_file_framing_and_checksum(self):
        p1, p2 = D.serialize_rba([1, 2, 3]), D.serialize_rba([10, 1 << 33])
        blob, offsets = D.pack_dv_file([p1, p2])
        assert blob[0] == 1  # format version byte
        assert D.unpack_dv_at(blob, offsets[0], len(p1)) == p1
        assert D.unpack_dv_at(blob, offsets[1], len(p2)) == p2
        corrupted = bytearray(blob)
        corrupted[offsets[0] + 5] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            D.unpack_dv_at(bytes(corrupted), offsets[0], len(p1))
        with pytest.raises(ValueError, match="size mismatch"):
            D.unpack_dv_at(blob, offsets[0], len(p1) + 1)

    def test_uuid_descriptor_roundtrip(self):
        import uuid

        u = uuid.uuid4()
        payload = D.serialize_rba([5, 6])
        blob, offsets = D.pack_dv_file([payload])
        desc = D.make_dv_descriptor_u("", u, offsets[0], len(payload), 2)
        assert D.dv_relative_path(desc["pathOrInlineDv"]) == (
            f"deletion_vector_{u}.bin"
        )
        assert D.read_dv_positions(desc, lambda rel: blob) == [5, 6]

    def test_cardinality_mismatch_raises(self):
        payload = D.serialize_rba([1, 2])
        desc = {
            "storageType": "i",
            "pathOrInlineDv": D.z85_encode(
                payload + b"\x00" * ((-len(payload)) % 4)
            ),
            "sizeInBytes": len(payload),
            "cardinality": 5,
        }
        with pytest.raises(ValueError, match="cardinality"):
            D.read_dv_positions(desc, lambda rel: b"")


def _seed(spark, path, n=200):
    from lakeapi_spark.sources.delta import write_delta

    df = spark.range(n).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id % 4 AS STRING) AS p"
    )
    write_delta(df, path, mode="append", partition_by=["p"])


class TestDeleteDelta:
    """delete_delta: cost ∝ deleted rows (KB of bitmap), not touched
    data — the merge-on-read trade delta-spark calls DV-enabled
    DELETE."""

    def test_delete_and_read(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import (
            delete_delta,
            delta_snapshot,
            read_delta_fallback,
        )

        path = str(tmp_path / "d1")
        _seed(spark, path)
        assert delete_delta(spark, path, "k % 13 = 0") == 1
        snap = delta_snapshot(spark, path)
        assert snap.protocol["minReaderVersion"] == 3
        assert "deletionVectors" in snap.protocol["readerFeatures"]
        got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
        assert got == [k for k in range(200) if k % 13]
        # no data file was REWRITTEN: every surviving path existed at v0
        # (files whose every row matched may drop via the remove path)
        assert set(snap.files) <= set(delta_snapshot(spark, path, 0).files)

    def test_second_delete_unions_positions(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import delete_delta, read_delta_fallback

        path = str(tmp_path / "d2")
        _seed(spark, path)
        delete_delta(spark, path, "k % 13 = 0")
        delete_delta(spark, path, "k % 7 = 0")
        got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
        assert got == [k for k in range(200) if k % 13 and k % 7]

    def test_time_travel_sees_pre_delete_rows(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import delete_delta, read_delta_fallback

        path = str(tmp_path / "d3")
        _seed(spark, path, n=50)
        delete_delta(spark, path, "k < 25")
        assert read_delta_fallback(spark, path, version_as_of=0).count() == 50
        assert read_delta_fallback(spark, path).count() == 25

    def test_noop_and_oversize_guard(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import delete_delta, delta_snapshot

        path = str(tmp_path / "d4")
        _seed(spark, path, n=20)
        assert delete_delta(spark, path, "k > 1000") == 0  # no-op, no commit
        assert delta_snapshot(spark, path).version == 0
        with pytest.raises(ValueError, match="max_deleted_rows"):
            delete_delta(spark, path, "k >= 0", max_deleted_rows=5)

    def test_full_file_delete_drops_file(self, spark, tmp_path):
        """A file whose every row matches is removed outright (via the
        stats numRecords), not kept as a fully-dead DV'd file."""
        from lakeapi_spark.sources.delta import delete_delta, delta_snapshot

        path = str(tmp_path / "d5")
        _seed(spark, path)
        delete_delta(spark, path, "p = '0'")
        snap = delta_snapshot(spark, path)
        assert not any(pv.get("p") == "0" for pv in snap.files.values())

    def test_version_diff_sees_dv_only_change(self, spark, tmp_path):
        """identity = (path, DV): a DELETE re-adds the same path with a
        new descriptor, and the diff reports exactly the deleted rows."""
        from lakeapi_spark.sources.delta import delete_delta, delta_version_diff

        path = str(tmp_path / "d6")
        _seed(spark, path, n=40)
        delete_delta(spark, path, "k % 10 = 0")
        diff = delta_version_diff(spark, path, 0, 1)
        got = sorted((r.k, r._change_type) for r in diff.collect())
        assert got == [(k, "delete") for k in range(0, 40, 10)]

    def test_checkpoint_carries_dv_descriptors(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import (
            checkpoint_delta,
            delete_delta,
            read_delta_fallback,
        )

        path = str(tmp_path / "d7")
        _seed(spark, path, n=60)
        delete_delta(spark, path, "k % 3 = 0")
        checkpoint_delta(spark, path)
        got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
        assert got == [k for k in range(60) if k % 3]

    def test_optimize_purges_dvs(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import (
            _file_dv,
            delete_delta,
            delta_snapshot,
            optimize_delta,
            read_delta_fallback,
        )

        path = str(tmp_path / "d8")
        _seed(spark, path)
        delete_delta(spark, path, "k % 9 = 0")
        optimize_delta(spark, path)
        snap = delta_snapshot(spark, path)
        assert not any(_file_dv(snap, r) for r in snap.files)
        got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
        assert got == [k for k in range(200) if k % 9]

    def test_vacuum_collects_purged_dv_bins(self, spark, tmp_path):
        from lakeapi_spark.sources.delta import (
            delete_delta,
            optimize_delta,
            read_delta_fallback,
            vacuum_delta,
        )

        path = str(tmp_path / "d9")
        _seed(spark, path)
        delete_delta(spark, path, "k % 9 = 0")
        # while the latest version references the DV, vacuum keeps it
        kept = vacuum_delta(spark, path)
        assert not any(x.endswith(".bin") for x in kept)
        optimize_delta(spark, path)
        deleted = vacuum_delta(spark, path)
        assert any(x.endswith(".bin") for x in deleted)
        got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
        assert got == [k for k in range(200) if k % 9]

    def test_inline_dv_descriptor(self, spark, tmp_path):
        """storageType 'i': the bitmap rides z85-encoded in the log
        itself (what delta writes for tiny DVs)."""
        import json
        import os

        import pyarrow as pa
        import pyarrow.parquet as papq

        from lakeapi_spark.sources.delta import read_delta_fallback

        base = str(tmp_path / "inline")
        os.makedirs(base)
        papq.write_table(pa.table({"x": list(range(10))}), f"{base}/f0.parquet")
        payload = D.serialize_rba([0, 3, 9])
        padded = payload + b"\x00" * ((-len(payload)) % 4)
        os.makedirs(f"{base}/_delta_log")
        schema_str = json.dumps(
            {
                "type": "struct",
                "fields": [
                    {"name": "x", "type": "long", "nullable": True, "metadata": {}}
                ],
            }
        )
        with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "protocol": {
                            "minReaderVersion": 3,
                            "minWriterVersion": 7,
                            "readerFeatures": ["deletionVectors"],
                        }
                    }
                )
                + "\n"
            )
            f.write(
                json.dumps(
                    {
                        "metaData": {
                            "id": "x",
                            "schemaString": schema_str,
                            "partitionColumns": [],
                            "format": {"provider": "parquet"},
                            "configuration": {},
                        }
                    }
                )
                + "\n"
            )
            f.write(
                json.dumps(
                    {
                        "add": {
                            "path": "f0.parquet",
                            "partitionValues": {},
                            "size": 1,
                            "modificationTime": 0,
                            "dataChange": True,
                            "deletionVector": {
                                "storageType": "i",
                                "pathOrInlineDv": D.z85_encode(padded),
                                "offset": None,
                                "sizeInBytes": len(payload),
                                "cardinality": 3,
                            },
                        }
                    }
                )
                + "\n"
            )
        got = sorted(r.x for r in read_delta_fallback(spark, base).collect())
        assert got == [1, 2, 4, 5, 6, 7, 8]

    def test_merge_applies_dvs_and_conflicts_on_dv_change(self, spark, tmp_path):
        """merge on a DV table reads through the DVs (no resurrection:
        rewrite = copy-on-write promotion), and a concurrent DV-only
        change to an analyzed file aborts the merge."""
        from lakeapi_spark.sources import delta as delta_mod

        path = str(tmp_path / "d10")
        _seed(spark, path, n=40)
        delta_mod.delete_delta(spark, path, "k % 2 = 1")  # odd rows dead
        src = spark.createDataFrame(
            [(2, 999, "2")], "k long, v long, p string"
        )
        delta_mod.merge_delta(src, path, on=["k"], when_not_matched="ignore")
        got = {r.k: r.v for r in delta_mod.read_delta_fallback(spark, path).collect()}
        assert got[2] == 999
        assert all(k % 2 == 0 for k in got)  # odd rows stayed dead
        # concurrent DV change -> ConcurrentDeltaModificationError
        real_try = delta_mod._try_commit
        state = {"raced": False}

        def racing_try(log_dir, version, actions, operation=None):
            if not state["raced"]:
                state["raced"] = True
                delta_mod.delete_delta(spark, path, "k = 4")
                return False
            return real_try(log_dir, version, actions)

        import pytest as _pytest

        orig = delta_mod._try_commit
        delta_mod._try_commit = racing_try
        try:
            with _pytest.raises(delta_mod.ConcurrentDeltaModificationError):
                delta_mod.merge_delta(
                    src, path, on=["k"], when_not_matched="ignore"
                )
        finally:
            delta_mod._try_commit = orig

    def test_dv_free_table_plan_has_no_join(self, spark, tmp_path):
        """Zero overhead for DV-free tables: the scan plan contains no
        join and no _metadata columns."""
        from lakeapi_spark.sources.delta import read_delta_fallback

        path = str(tmp_path / "d11")
        _seed(spark, path, n=20)
        plan = read_delta_fallback(spark, path)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert "__dv_pos" not in plan


def test_dv_anti_join_is_broadcast(spark, tmp_path):
    """Small DVs (the overwhelmingly common case) must apply as a
    BROADCAST left-anti join — a map-side probe, not a shuffle of the
    scanned data."""
    from lakeapi_spark.sources.delta import (
        delete_delta,
        read_delta_fallback,
        write_delta,
    )

    path = str(tmp_path / "bplan")
    # one multi-row file per partition (coalesce) so the delete takes
    # the DV path rather than dropping single-row files outright
    df = spark.range(100).selectExpr(
        "id AS k", "id * 2 AS v", "CAST(id % 4 AS STRING) AS p"
    ).coalesce(1)
    write_delta(df, path, mode="append", partition_by=["p"])
    delete_delta(spark, path, "k % 11 = 0")
    plan = (
        read_delta_fallback(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the scanned side must not shuffle for the join
    assert "Exchange hashpartitioning" not in plan.split("BroadcastHashJoin")[0]


def _dv_log_table(tmp_path, name, dv_descriptor):
    """10-row single-file table whose add carries ``dv_descriptor``."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as papq

    base = str(tmp_path / name)
    os.makedirs(base)
    papq.write_table(pa.table({"x": list(range(10))}), f"{base}/f0.parquet")
    os.makedirs(f"{base}/_delta_log")
    schema_str = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "x", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    actions = [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
            }
        },
        {
            "metaData": {
                "id": name,
                "schemaString": schema_str,
                "partitionColumns": [],
                "format": {"provider": "parquet"},
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "f0.parquet",
                "partitionValues": {},
                "size": 1,
                "modificationTime": 0,
                "dataChange": True,
                "deletionVector": dv_descriptor,
            }
        },
    ]
    with open(f"{base}/_delta_log/{0:020d}.json", "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    return base


def test_foreign_prefixed_u_descriptor(spark, tmp_path):
    """delta-spark writes 'u' descriptors with a random directory
    prefix before the z85 uuid; the bin lives under <table>/<prefix>/."""
    import os
    import uuid

    from lakeapi_spark.sources.delta import read_delta_fallback

    payload = D.serialize_rba([2, 5])
    blob, offsets = D.pack_dv_file([payload])
    u = uuid.uuid4()
    desc = D.make_dv_descriptor_u("ab", u, offsets[0], len(payload), 2)
    base = _dv_log_table(tmp_path, "prefixed", desc)
    os.makedirs(f"{base}/ab")
    with open(f"{base}/ab/deletion_vector_{u}.bin", "wb") as f:
        f.write(blob)
    got = sorted(r.x for r in read_delta_fallback(spark, base).collect())
    assert got == [0, 1, 3, 4, 6, 7, 8, 9]


def test_foreign_absolute_p_descriptor(spark, tmp_path):
    """storageType 'p': the descriptor names the bin by absolute path."""
    from lakeapi_spark.sources.delta import read_delta_fallback

    payload = D.serialize_rba([0, 9])
    blob, offsets = D.pack_dv_file([payload])
    bin_path = str(tmp_path / "elsewhere.bin")
    with open(bin_path, "wb") as f:
        f.write(blob)
    desc = {
        "storageType": "p",
        "pathOrInlineDv": bin_path,
        "offset": offsets[0],
        "sizeInBytes": len(payload),
        "cardinality": 2,
    }
    base = _dv_log_table(tmp_path, "absolute", desc)
    got = sorted(r.x for r in read_delta_fallback(spark, base).collect())
    assert got == list(range(1, 9))


def test_vacuum_keeps_p_descriptor_bin_inside_table(spark, tmp_path):
    """A retained add whose DV is a storageType 'p' descriptor pointing
    INSIDE the table directory must keep its .bin through VACUUM — only
    'u' paths were added to the referenced set before (advice finding,
    r6), so the bin of a still-live snapshot was deleted and the table
    became unreadable."""
    import os

    from lakeapi_spark.sources.delta import read_delta_fallback, vacuum_delta

    payload = D.serialize_rba([0, 9])
    blob, offsets = D.pack_dv_file([payload])
    base_dir = str(tmp_path / "p_inside")
    bin_rel = "dv/inside.bin"
    desc = {
        "storageType": "p",
        "pathOrInlineDv": f"{base_dir}/{bin_rel}",
        "offset": offsets[0],
        "sizeInBytes": len(payload),
        "cardinality": 2,
    }
    base = _dv_log_table(tmp_path, "p_inside", desc)
    os.makedirs(f"{base}/dv")
    with open(f"{base}/{bin_rel}", "wb") as f:
        f.write(blob)
    before = sorted(r.x for r in read_delta_fallback(spark, base).collect())
    assert before == list(range(1, 9))

    deleted = vacuum_delta(spark, base, keep_versions=0)
    assert all(not d.endswith("inside.bin") for d in deleted), deleted
    after = sorted(r.x for r in read_delta_fallback(spark, base).collect())
    assert after == before


def test_restore_checks_p_descriptor_bins(spark, tmp_path):
    """restore_delta's reconstructability check must cover 'p'
    descriptor bins the same way it covers 'u' ones: restoring to a
    version whose in-table 'p' bin is gone raises instead of
    committing an unreadable snapshot."""
    import os

    import pytest as _pytest

    from lakeapi_spark.sources.delta import restore_delta

    payload = D.serialize_rba([3])
    blob, offsets = D.pack_dv_file([payload])
    base_dir = str(tmp_path / "p_restore")
    desc = {
        "storageType": "p",
        "pathOrInlineDv": f"{base_dir}/gone.bin",
        "offset": offsets[0],
        "sizeInBytes": len(payload),
        "cardinality": 1,
    }
    base = _dv_log_table(tmp_path, "p_restore", desc)
    with open(f"{base}/gone.bin", "wb") as f:
        f.write(blob)
    os.remove(f"{base}/gone.bin")
    with _pytest.raises(ValueError, match="no longer reconstructable"):
        restore_delta(spark, base, 0)


def test_corrupt_dv_checksum_fails_loudly(spark, tmp_path):
    """A flipped byte in the bin must raise (CRC verify), never return
    partial rows silently."""
    import os
    import uuid

    from lakeapi_spark.sources.delta import read_delta_fallback

    payload = D.serialize_rba([1])
    blob, offsets = D.pack_dv_file([payload])
    corrupted = bytearray(blob)
    corrupted[offsets[0] + 5] ^= 0xFF
    u = uuid.uuid4()
    desc = D.make_dv_descriptor_u("", u, offsets[0], len(payload), 1)
    base = _dv_log_table(tmp_path, "corrupt", desc)
    with open(f"{base}/deletion_vector_{u}.bin", "wb") as f:
        f.write(bytes(corrupted))
    with pytest.raises(Exception, match="checksum"):
        read_delta_fallback(spark, base).collect()


def test_distributed_decode_path_matches_local(spark, tmp_path, monkeypatch):
    """Force the mapInPandas decode path (threshold 0) and check it
    returns exactly what the driver-local path returns."""
    from lakeapi_spark.sources import delta as delta_mod

    path = str(tmp_path / "bigdv")
    _seed(spark, path, n=100)
    delta_mod.delete_delta(spark, path, "k % 3 = 0")
    local = sorted(
        r.k for r in delta_mod.read_delta_fallback(spark, path).collect()
    )
    monkeypatch.setattr(delta_mod, "_DV_LOCAL_DECODE_LIMIT", 0)
    dist = sorted(
        r.k for r in delta_mod.read_delta_fallback(spark, path).collect()
    )
    assert local == dist == [k for k in range(100) if k % 3]


def test_dv_delete_on_paths_with_spaces(spark, tmp_path):
    """Partition values with spaces percent-encode in
    _metadata.file_path ('p=a%20b'); the DV anti-join and the delete
    provenance mapping must decode back to the raw path or deleted
    rows silently resurface (review finding, verified)."""
    from lakeapi_spark.sources.delta import (
        delete_delta,
        read_delta_fallback,
        write_delta,
    )

    path = str(tmp_path / "sp")
    df = spark.range(40).selectExpr(
        "id AS k",
        "CASE WHEN id % 2 = 0 THEN 'a b' ELSE 'c+d' END AS p",
    ).coalesce(1)
    write_delta(df, path, mode="append", partition_by=["p"])
    delete_delta(spark, path, "k % 5 = 0")
    got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
    assert got == [k for k in range(40) if k % 5]
    # second delete unions into the existing DVs on the encoded paths
    delete_delta(spark, path, "k % 7 = 0")
    got = sorted(r.k for r in read_delta_fallback(spark, path).collect())
    assert got == [k for k in range(40) if k % 5 and k % 7]
