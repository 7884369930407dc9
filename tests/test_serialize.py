"""Round-trip tests for the output formats (ref test_output_formats.py +
test_app.py:214-271 round-trip style)."""

from __future__ import annotations

import io
import json

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.feather as feather
import pyarrow.ipc as ipc
import pyarrow.parquet as papq
import pytest

from lakeapi_spark.serialize import FORMATS, serialize, stream_ndjson


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        [(1, "a;b", 1.5), (2, "x,y", 2.5), (3, None, None)], ["id", "s", "v"]
    )


def test_json(small_df):
    rows = json.loads(serialize(small_df, "json"))
    assert rows[0] == {"id": 1, "s": "a;b", "v": 1.5}
    assert rows[2]["s"] is None


def test_ndjson_lines(small_df):
    lines = serialize(small_df, "ndjson").decode().strip().split("\n")
    assert len(lines) == 3
    assert json.loads(lines[1])["id"] == 2


def test_csv_and_custom_separator(small_df):
    out = serialize(small_df, "csv").decode()
    assert out.splitlines()[0] == '"id","s","v"'
    assert '"x,y"' in out
    scsv = serialize(small_df, "scsv").decode()
    assert '"a;b"' in scsv and scsv.splitlines()[1].count(";") >= 2


def test_csv4excel_utf16_preamble(small_df):
    """Byte-exact reference layout (response.py:158-169,
    test_output_formats.py:22-27): raw utf-8 'sep=,\\n' preamble, then
    the csv body in utf-16-le."""
    raw = serialize(small_df, "csv4excel")
    assert raw[0:6].decode("ascii") == "sep=,\n"
    import csv as _csv

    body = raw[6:].decode("utf-16-le")
    rows = list(_csv.DictReader(body.splitlines()))
    assert rows[0]["id"] == "1" and rows[1]["s"] == "x,y"


def test_parquet_roundtrip(small_df):
    tab = papq.read_table(io.BytesIO(serialize(small_df, "parquet")))
    assert tab.num_rows == 3 and tab.column("id").to_pylist() == [1, 2, 3]


def test_arrow_roundtrips(small_df):
    tab = feather.read_table(io.BytesIO(serialize(small_df, "arrow")))
    assert tab.num_rows == 3
    stream = ipc.open_stream(io.BytesIO(serialize(small_df, "arrow-stream"))).read_all()
    assert stream.column("s").to_pylist() == ["a;b", "x,y", None]


def test_html_xml(small_df):
    assert b"<table" in serialize(small_df, "html")
    assert b"<row>" in serialize(small_df, "xml")


def test_custom_encoding(small_df):
    latin = serialize(small_df, "csv", encoding="latin-1")
    assert b'"id"' in latin


def test_stream_ndjson_chunks(small_df):
    chunks = list(stream_ndjson(small_df, chunk_size=2))
    rows = [json.loads(ln) for c in chunks for ln in c.decode().strip().split("\n")]
    assert len(rows) == 3
    assert len(chunks) >= 2  # chunked at 2 rows per batch


def test_unknown_format(small_df):
    with pytest.raises(ValueError):
        serialize(small_df, "yaml")


def test_all_declared_formats_covered():
    assert set(FORMATS) >= {"json", "ndjson", "csv", "scsv", "csv4excel", "parquet", "arrow", "arrow-stream", "html", "xml"}


class TestStreamSerialize:
    """stream_serialize must (a) produce the same logical content as
    serialize(), (b) stay memory-bounded — every yielded chunk is small
    regardless of total result size (the full-sf lineitem test below is
    the limit=-1 export of ref test_app.py:181-203)."""

    def test_stream_matches_serialize_small(self, small_df):
        from lakeapi_spark.serialize import serialize, stream_serialize

        # every byte-stable format byte-matches the single-shot writer;
        # html/xml/xlsx included since this round's seekable-sink spill
        for fmt in ("ndjson", "json", "csv", "scsv", "csv4excel", "html", "xml", "xlsx"):
            whole = serialize(small_df.orderBy("id"), fmt)
            streamed = b"".join(stream_serialize(small_df.orderBy("id").coalesce(1), fmt))
            assert streamed == whole, fmt

    def test_stream_arrow_file_roundtrip(self, small_df):
        """The feather/IPC *file* format (seekable footer) streams via
        the temp-file spill; layout may differ from write_feather's but
        the table read back is identical."""
        from lakeapi_spark.serialize import stream_serialize

        df = small_df.orderBy("id").coalesce(1)
        raw = b"".join(stream_serialize(df, "arrow"))
        tab = feather.read_table(io.BytesIO(raw))
        assert tab.column("id").to_pylist() == [1, 2, 3]
        assert tab.column("s").to_pylist() == ["a;b", "x,y", None]

    def test_stream_parquet_and_arrow_roundtrip(self, small_df):
        from lakeapi_spark.serialize import stream_serialize

        df = small_df.orderBy("id").coalesce(1)
        tab = papq.read_table(io.BytesIO(b"".join(stream_serialize(df, "parquet"))))
        assert tab.column("id").to_pylist() == [1, 2, 3]
        stream = ipc.open_stream(
            io.BytesIO(b"".join(stream_serialize(df, "arrow-stream")))
        ).read_all()
        assert stream.column("s").to_pylist() == ["a;b", "x,y", None]

    def test_stream_empty_result_keeps_schema(self, small_df):
        from lakeapi_spark.serialize import stream_serialize

        empty = small_df.filter("id < 0")
        tab = papq.read_table(io.BytesIO(b"".join(stream_serialize(empty, "parquet"))))
        assert tab.num_rows == 0 and tab.column_names == ["id", "s", "v"]
        csv = b"".join(stream_serialize(empty, "csv")).decode()
        assert csv.splitlines()[0] == '"id","s","v"'
        assert json.loads(b"".join(stream_serialize(empty, "json"))) == []

    def test_stream_unknown_format_raises(self, small_df):
        from lakeapi_spark.serialize import stream_serialize

        with pytest.raises(ValueError):
            list(stream_serialize(small_df, "yaml"))

    def test_stream_xlsx_full_lineitem_memory_bounded(self, spark, sf_dir):
        """limit=-1 xlsx export of the whole lineitem table: the sheet
        is written batch-by-batch into a DISK temp file and re-streamed
        in 64 KiB chunks — no whole-result buffer on the driver — and
        the workbook round-trips with every row."""
        import xml.etree.ElementTree as ET
        import zipfile

        from lakeapi_spark.catalog import table
        from lakeapi_spark.serialize import stream_serialize

        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        n_expected = li.count()
        chunks = list(stream_serialize(li, "xlsx", chunk_size=1000))
        assert len(chunks) > 1  # genuinely chunked
        assert max(len(c) for c in chunks) <= 65536
        z = zipfile.ZipFile(io.BytesIO(b"".join(chunks)))
        ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        assert len(sheet.findall(".//m:row", ns)) == n_expected + 1  # + header

    @pytest.mark.parametrize("fmt", ["ndjson", "csv", "parquet", "arrow-stream"])
    def test_full_lineitem_export_memory_bounded(self, spark, sf_dir, fmt):
        """limit=-1 export of the whole lineitem table: chunks stay
        bounded (driver never holds the full serialized result) and the
        row count survives the round trip."""
        from lakeapi_spark.catalog import table
        from lakeapi_spark.serialize import stream_serialize

        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
        )
        n_expected = li.count()
        total_rows = 0
        max_chunk = 0
        n_chunks = 0
        if fmt in ("parquet", "arrow-stream"):
            buf = io.BytesIO()
            for chunk in stream_serialize(li, fmt, chunk_size=1000):
                max_chunk = max(max_chunk, len(chunk))
                n_chunks += 1
                buf.write(chunk)
            buf.seek(0)
            tab = (
                papq.read_table(buf)
                if fmt == "parquet"
                else ipc.open_stream(buf).read_all()
            )
            total_rows = tab.num_rows
        else:
            rest = b""
            for chunk in stream_serialize(li, fmt, chunk_size=1000):
                max_chunk = max(max_chunk, len(chunk))
                n_chunks += 1
                data = rest + chunk
                lines = data.split(b"\n")
                rest = lines[-1]
                total_rows += sum(1 for ln in lines[:-1] if ln)
            total_rows += 1 if rest else 0
            if fmt == "csv":
                total_rows -= 1  # header line
        assert total_rows == n_expected
        assert n_chunks > 1  # genuinely chunked
        # one 1k-row chunk of 4 narrow columns serializes well under 1MB;
        # a whole-result buffer would be orders of magnitude bigger
        assert max_chunk < 1024 * 1024


def test_xlsx_roundtrip_stdlib(small_df):
    """xlsx is now a real sink (stdlib SpreadsheetML writer, no
    openpyxl gate): verify the package structure and cell values by
    unzipping with the stdlib."""
    import xml.etree.ElementTree as ET
    import zipfile

    raw = serialize(small_df.orderBy("id"), "xlsx")
    z = zipfile.ZipFile(io.BytesIO(raw))
    assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml"} <= set(
        z.namelist()
    )
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows = sheet.findall(".//m:row", ns)
    assert len(rows) == 4  # header + 3 data rows

    def cellvals(row):
        out = {}
        for c in row.findall("m:c", ns):
            ref = c.attrib["r"]
            if c.attrib.get("t") == "inlineStr":
                out[ref] = c.find("m:is/m:t", ns).text
            else:
                v = c.find("m:v", ns)
                out[ref] = v.text if v is not None else None
        return out

    assert cellvals(rows[0]) == {"A1": "id", "B1": "s", "C1": "v"}
    r2 = cellvals(rows[1])
    assert r2["A2"] == "1" and r2["B2"] == "a;b" and float(r2["C2"]) == 1.5
    # nulls are omitted cells
    assert "B4" not in cellvals(rows[3])


def test_xlsx_column_letters():
    from lakeapi_spark.serialize import _col_ref

    assert [_col_ref(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]
