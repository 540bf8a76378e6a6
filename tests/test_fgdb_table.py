"""Pure-Python FileGDB table-format writer/reader pins (S10 — VERDICT
r11 ask #1). The strict reader is the audit's verifier, so these tests
cover both directions: faithful round trips AND loud rejection of
corrupted bytes (a reader that 'repairs' bad structure would let a
writer regression pass the audit silently)."""

from __future__ import annotations

import struct

import pytest

from overturelink_data_pipeline_spark.sinks import fgdb_table as FG


def _mk(tmp_path, rows, cols=None, dtypes=None, name="t"):
    cols = cols or ["id", "name", "score", "geometry"]
    dtypes = dtypes or {
        "id": "bigint", "name": "string", "score": "double",
        "geometry": "binary",
    }
    d = str(tmp_path / "x.gdb")
    FG.write_fgdb({name: (cols, dtypes, rows)}, d)
    return d


def test_roundtrip_types_nulls_unicode(tmp_path):
    rows = [
        (1, "Café μ — ünïcode", 0.5, (9.52, 47.14)),
        (2, None, None, None),
        (3, "b" * 5000, -1.25, (-179.9999999, -89.9999999)),
        (4, "", 0.0, (0.0, 0.0)),
    ]
    d = _mk(tmp_path, rows)
    cols, got = FG.read_fgdb_layer(d, "t")
    assert cols == ["OBJECTID", "id", "name", "score", "geometry"]
    assert [r[0] for r in got] == [1, 2, 3, 4]  # objectids implied 1..n
    assert [r[1] for r in got] == [1, 2, 3, 4]
    assert got[0][2] == "Café μ — ünïcode"
    assert got[1][2] is None and got[1][3] is None and got[1][4] is None
    assert got[2][2] == "b" * 5000  # multi-byte varuint length
    assert got[3][2] == ""  # empty string is NOT null
    for r, (exp_x, exp_y) in zip(
        [got[0], got[2], got[3]], [(9.52, 47.14),
                                   (-179.9999999, -89.9999999), (0.0, 0.0)]
    ):
        x, y = r[4]
        # quantization resolution: 1e-9 deg (writer parameter)
        assert abs(x - exp_x) <= 5e-10 and abs(y - exp_y) <= 5e-10


def test_multi_block_tablx(tmp_path):
    """>1024 rows forces a second 1024-entry index block."""
    rows = [(i, f"r{i}", float(i), None) for i in range(1, 2501)]
    d = _mk(tmp_path, rows)
    _, got = FG.read_fgdb_layer(d, "t")
    assert len(got) == 2500
    assert got[-1][1] == 2500 and got[-1][2] == "r2500"
    # the index file is exactly 3 blocks + header + trailer
    import os

    base = FG._table_base(d, 9)
    assert os.path.getsize(base + ".gdbtablx") == 16 + 3 * 1024 * 5 + 16


def test_wide_null_bitmap(tmp_path):
    """9 nullable fields -> 2-byte bitmap; alternate nulls to hit both
    bytes and every bit position."""
    cols = [f"c{i}" for i in range(9)]
    dtypes = {c: "string" for c in cols}
    rows = [
        tuple((f"v{i}" if (i + j) % 2 else None) for i in range(9))
        for j in range(4)
    ]
    d = str(tmp_path / "w.gdb")
    FG.write_fgdb({"wide": (cols, dtypes, rows)}, d)
    _, got = FG.read_fgdb_layer(d, "wide")
    for j, r in enumerate(got):
        assert r[0] == j + 1
        for i in range(9):
            exp = f"v{i}" if (i + j) % 2 else None
            assert r[1 + i] == exp, (i, j, r)


def test_catalog_maps_names_to_table_ids(tmp_path):
    d = str(tmp_path / "m.gdb")
    FG.write_fgdb(
        {
            "beta": (["v"], {"v": "int"}, [(2,)]),
            "alpha": (["v"], {"v": "int"}, [(1,)]),
        },
        d,
    )
    assert FG.list_fgdb_layers(d) == ["alpha", "beta"]
    # layers are written in sorted order from id 9; catalog row position
    # IS the table id
    _, cat = FG.read_fgdb_table(FG._table_base(d, 1))
    assert [r[1] for r in cat[:8]] == list(FG._SYSTEM_TABLE_NAMES)
    assert (cat[8][0], cat[8][1]) == (9, "alpha")
    assert (cat[9][0], cat[9][1]) == (10, "beta")
    assert FG.read_fgdb_layer(d, "alpha")[1][0][1] == 1
    assert FG.read_fgdb_layer(d, "beta")[1][0][1] == 2
    with pytest.raises(KeyError):
        FG.read_fgdb_layer(d, "ghost")


def test_writer_input_validation(tmp_path):
    d = str(tmp_path / "v.gdb")
    with pytest.raises(ValueError, match="int32"):
        FG.write_fgdb({"t": (["v"], {"v": "bigint"}, [(2**40,)])}, d)
    with pytest.raises(ValueError, match="system tables"):
        FG.write_fgdb({"GDB_Items": (["v"], {"v": "int"}, [])}, d)
    with pytest.raises(ValueError, match="layer name"):
        FG.write_fgdb({"a/b": (["v"], {"v": "int"}, [])}, d)
    with pytest.raises(ValueError, match="no FGDB-table mapping"):
        FG.write_fgdb({"t": (["v"], {"v": "timestamp"}, [])}, d)


def test_reader_rejects_corruption(tmp_path):
    """Flip one structural byte at a time; the strict reader must raise
    rather than return wrong rows."""
    d = _mk(tmp_path, [(1, "a", 1.0, (1.0, 2.0))])
    base = FG._table_base(d, 9)
    orig = open(base + ".gdbtable", "rb").read()

    def put(buf):
        with open(base + ".gdbtable", "wb") as fh:
            fh.write(buf)

    # bad magic
    put(b"\x07" + orig[1:])
    with pytest.raises(ValueError, match="magic"):
        FG.read_fgdb_table(base)
    # header file_size disagrees with actual
    bad = bytearray(orig)
    struct.pack_into("<q", bad, 24, len(orig) + 3)
    put(bytes(bad))
    with pytest.raises(ValueError, match="file_size"):
        FG.read_fgdb_table(base)
    # truncated last row
    put(orig[:-2])
    with pytest.raises(ValueError):
        FG.read_fgdb_table(base)
    put(orig)
    # index row count disagrees with table
    xorig = open(base + ".gdbtablx", "rb").read()
    badx = bytearray(xorig)
    struct.pack_into("<I", badx, 8, 5)
    with open(base + ".gdbtablx", "wb") as fh:
        fh.write(bytes(badx))
    with pytest.raises(ValueError, match="rows"):
        FG.read_fgdb_table(base)


def test_varuint_roundtrip_property():
    import random

    rng = random.Random(12)
    vals = [0, 1, 127, 128, 16383, 16384, 2**35, 2**63 - 1] + [
        rng.randrange(2**62) for _ in range(200)
    ]
    for v in vals:
        enc = FG._varuint(v)
        got, pos = FG._read_varuint(enc, 0)
        assert got == v and pos == len(enc)
    with pytest.raises(ValueError):
        FG._varuint(-1)


def test_spark_layer_writer_points_only(spark, tmp_path):
    """write_fgdb_layers unwraps WKB points and refuses other families;
    64-char truncation applies (the audit's contract)."""
    from overturelink_data_pipeline_spark.geo import wkb as W

    long_col = "x" * 70
    pt = bytes(W.dumps(("Point", (5.0, 6.0))))
    df = spark.createDataFrame(
        [(1, "a", pt), (2, None, None)],
        f"id long, `{long_col}` string, geometry binary",
    )
    d = str(tmp_path / "s.gdb")
    from overturelink_data_pipeline_spark.sinks.fgdb_table import (
        read_fgdb_layer,
        write_fgdb_layers,
    )

    assert write_fgdb_layers({"pts": df}, d) == {"pts": 2}
    cols, rows = read_fgdb_layer(d, "pts")
    assert "x" * 64 in cols and long_col not in cols
    assert rows[0][3] == (5.0, 6.0) and rows[1][3] is None

    line = bytes(W.dumps(("LineString", [(0.0, 0.0), (1.0, 1.0)])))
    bad = spark.createDataFrame([(1, line)], "id long, geometry binary")
    with pytest.raises(ValueError, match="scoped to points"):
        write_fgdb_layers({"l": bad}, str(tmp_path / "l.gdb"))


def test_failed_write_leaves_no_partial_files(spark, tmp_path):
    """The streaming writer must clean up every pair it created when a
    lazy row stream fails mid-write (no-partial-layer contract, same
    as the gpkg sink's rollback)."""
    import os

    from overturelink_data_pipeline_spark.geo import wkb as W
    from overturelink_data_pipeline_spark.sinks.fgdb_table import (
        write_fgdb_layers,
    )

    pt = bytes(W.dumps(("Point", (1.0, 2.0))))
    line = bytes(W.dumps(("LineString", [(0.0, 0.0), (1.0, 1.0)])))
    # first row fine, second row blows up inside the stream
    df = spark.createDataFrame(
        [(1, pt), (2, line)], "id long, geometry binary"
    ).coalesce(1)
    d = str(tmp_path / "p.gdb")
    with pytest.raises(ValueError, match="scoped to points"):
        write_fgdb_layers({"pts": df}, d)
    leftovers = [f for f in os.listdir(d) if f.startswith("a")]
    assert leftovers == [], leftovers


def test_reader_valueerror_contract_and_fresh_dir_guard(tmp_path):
    """Review r12: every corruption shape — missing files, offsets past
    EOF, mangled bytes that would surface struct/index errors — reads
    as ValueError (the documented contract); and write_fgdb refuses an
    existing dataset rather than corrupting it via in-place overwrite."""
    import os
    import struct as _s

    d = _mk(tmp_path, [(1, "a", 1.0, (1.0, 2.0))])
    base = FG._table_base(d, 9)
    # missing table file
    with pytest.raises(ValueError, match="missing"):
        FG.read_fgdb_table(str(tmp_path / "nope"))
    # tablx offset pointing past EOF (passes the nonzero check)
    xorig = open(base + ".gdbtablx", "rb").read()
    badx = bytearray(xorig)
    badx[16:21] = (1 << 39).to_bytes(5, "little")
    with open(base + ".gdbtablx", "wb") as fh:
        fh.write(bytes(badx))
    with pytest.raises(ValueError, match="beyond table end"):
        FG.read_fgdb_table(base)
    with open(base + ".gdbtablx", "wb") as fh:
        fh.write(xorig)
    # descriptor nlen mangled so the parse runs off the buffer end:
    # must normalize to ValueError, not IndexError/struct.error
    orig = open(base + ".gdbtable", "rb").read()
    bad = bytearray(orig)
    bad[54] = 255  # first field's name-length byte (desc starts at 40:
    # size4 + version4 + flags4 + nfields2 -> 54)
    with open(base + ".gdbtable", "wb") as fh:
        fh.write(bytes(bad))
    with pytest.raises(ValueError):
        FG.read_fgdb_table(base)
    with open(base + ".gdbtable", "wb") as fh:
        fh.write(orig)

    # existing dataset -> refuse in-place rewrite, leave it untouched
    with pytest.raises(ValueError, match="already contains"):
        FG.write_fgdb({"t2": (["v"], {"v": "int"}, [(1,)])}, d)
    assert FG.list_fgdb_layers(d) == ["t"]
    assert not os.path.exists(FG._table_base(d, 10) + ".gdbtable")
