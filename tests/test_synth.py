"""The synth formulas must agree BIT-FOR-BIT with their SQL twins —
this is what makes the driver's DuckDB oracle gate meaningful for the
geospatial pipelines."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from pygridmap_ray.synth import (
    build_spans_array,
    derive_xy,
    polygon_layer,
    span_summary_from_column,
    sql_points_cte,
    sql_polygon_area_cte,
    sql_polygon_rects_cte,
    sql_span_summary_cte,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return c


def test_xy_matches_sql_exactly(con):
    sql = con.sql(f"SELECT doc_id, x, y FROM ({sql_points_cte()}) ORDER BY doc_id")
    t = sql.arrow()
    doc_id = np.asarray(t["doc_id"])
    x, y = derive_xy(doc_id)
    assert np.array_equal(x, np.asarray(t["x"]))  # exact, not approx
    assert np.array_equal(y, np.asarray(t["y"]))
    # sanity: points spread over the domain, clusters present
    assert x.min() >= 0 and x.max() <= 500_000
    assert y.min() >= 0 and y.max() <= 501_000


def test_spans_match_sql_summary(con):
    t = con.sql("SELECT doc_id FROM documents ORDER BY doc_id").arrow()
    doc_id = np.asarray(t["doc_id"])
    spans = build_spans_array(doc_id)
    got = span_summary_from_column(pa.array(doc_id), spans).to_pandas()
    exp = con.sql(
        f"SELECT * FROM ({sql_span_summary_cte()}) ORDER BY doc_id"
    ).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    for col in ["n_spans", "n_text", "offset_sum", "last_offset", "kind_seq"]:
        assert got[col].tolist() == exp[col].tolist(), col


def test_spans_schema_and_order():
    spans = build_spans_array(np.array([0, 5, 12], dtype=np.int64))
    assert spans.type == pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    row = spans[1].as_py()  # doc_id=5 -> 6 spans
    assert len(row) == 6
    offs = [s["offset"] for s in row]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    for i, s in enumerate(row):
        kind = ["text", "image", "audio"][(5 + i) % 3]
        assert s["kind"] == kind
        if kind == "text":
            assert s["text"] == f"t-5-{i}" and s["media_ref"] == ""
        else:
            assert s["media_ref"] == f"media://5/{i}" and s["text"] == ""


def test_polygon_sql_area_matches_rings(con):
    con.sql(f"CREATE OR REPLACE VIEW poly_rects AS {sql_polygon_rects_cte()}")
    df = con.sql(f"SELECT * FROM ({sql_polygon_area_cte()}) ORDER BY poly_id").df()
    layer = polygon_layer()
    assert len(df) == len(layer)
    for row, p in zip(df.itertuples(), layer):
        assert row.poly_id == p["poly_id"]
        assert row.poly_area == pytest.approx(p["area"])
        assert row.pop == p["pop"]
