"""Lance-gated interleaved-document source: fallback, gating, schema contract."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pygridmap_ray.sources.documents import (
    SPAN_FIELDS,
    read_document_table,
    validate_span_schema,
)
from pygridmap_ray.synth import build_spans_array


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs")
    did = np.arange(50, dtype=np.int64)
    t = pa.table({"doc_id": did, "spans": build_spans_array(did)})
    pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return str(d)


def test_parquet_fallback_streams(ray_session, doc_dir):
    ds = read_document_table(doc_dir, validate=True)
    assert ds.count() == 50
    assert "spans" in ds.schema().names


def test_column_pruning_skips_spans(ray_session, doc_dir):
    ds = read_document_table(doc_dir, columns=["doc_id"])
    assert ds.schema().names == ["doc_id"]


def test_lance_path_gated(tmp_path):
    lance_dir = tmp_path / "corpus.lance"
    lance_dir.mkdir()
    with pytest.raises(ImportError, match="[Ll]ance"):
        read_document_table(str(lance_dir))


def test_span_schema_contract():
    did = np.arange(3, dtype=np.int64)
    good = pa.table({"doc_id": did, "spans": build_spans_array(did)})
    validate_span_schema(good.schema)  # no raise

    with pytest.raises(ValueError, match="missing 'spans'"):
        validate_span_schema(pa.table({"doc_id": did}).schema)
    with pytest.raises(ValueError, match="must be list"):
        validate_span_schema(pa.table({"doc_id": did, "spans": did}).schema)
    # wrong offset width (int64 instead of the contract's int32)
    bad_inner = pa.array(
        [[{"kind": "text", "text": "t", "media_ref": "", "offset": 0}]],
        pa.list_(
            pa.struct(
                [
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int64()),
                ]
            )
        ),
    )
    with pytest.raises(ValueError, match="offset"):
        validate_span_schema(pa.table({"spans": bad_inner}).schema)
    assert set(SPAN_FIELDS) == {"kind", "text", "media_ref", "offset"}


def _lance_available():
    from pygridmap_ray.sources.documents import _lance_available as f

    return f()


@pytest.mark.skipif(
    not _lance_available(),
    reason="lance not installed (env-blocked); activates when available",
)
def test_lance_roundtrip_when_available(ray_session, tmp_path):
    """The Lance branch is a READER SWAP: same pruned-column streaming
    contract as parquet.  Runs automatically wherever pylance exists."""
    import lance

    did = np.arange(20, dtype=np.int64)
    t = pa.table({"doc_id": did, "spans": build_spans_array(did)})
    path = str(tmp_path / "corpus.lance")
    lance.write_dataset(t, path)
    ds = read_document_table(path, validate=True)
    assert ds.count() == 20
    pruned = read_document_table(path, columns=["doc_id"])
    assert pruned.schema().names == ["doc_id"]


def test_jsonl_branch_streams(ray_session, tmp_path):
    """JSONL corpora (the interchange format) read through the same
    entry point with post-parse column projection."""
    import json

    d = tmp_path / "corpus"
    d.mkdir()
    with open(d / "part-0.jsonl", "w") as f:
        for i in range(30):
            f.write(json.dumps({"doc_id": i, "text": f"doc {i}",
                                "lang": "en"}) + "\n")
    ds = read_document_table(str(d))
    assert ds.count() == 30
    pruned = read_document_table(str(d), columns=["doc_id"])
    assert pruned.schema().names == ["doc_id"]
