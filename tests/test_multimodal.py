"""Multimodal plumbing tests: binary columns, Arrow batches, metadata,
frame explosion, stubbed real-decode gate."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from algoritmos_etl_spark.operators import multimodal
from algoritmos_etl_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").cache()


def test_payload_schema_and_determinism(docs):
    out = multimodal.attach_payload(docs)
    assert dict(out.dtypes)["payload"] == "binary"
    assert (
        dict(out.dtypes)["meta"]
        == "struct<modality:string,width:int,height:int,n_frames:int>"
    )
    row1 = out.orderBy("doc_id").first()
    row2 = multimodal.attach_payload(docs).orderBy("doc_id").first()
    assert row1.payload == row2.payload  # deterministic bytes
    assert len(row1.payload) == 16 * row1.meta.n_frames


def test_payload_bytes_match_python_md5(docs):
    row = multimodal.attach_payload(docs).orderBy("doc_id").first()
    text = docs.orderBy("doc_id").first().text
    expect = b"".join(
        bytes.fromhex(hashlib.md5(f"{text}:{i}".encode()).hexdigest())
        for i in range(row.meta.n_frames)
    )
    assert bytes(row.payload) == expect


def test_decode_features_values(docs):
    feats = {r.doc_id: r for r in multimodal.decode_features(docs).collect()}
    payloads = {
        r.doc_id: bytes(r.payload)
        for r in multimodal.attach_payload(docs).collect()
    }
    assert set(feats) == set(payloads)
    some = sorted(feats)[:5]
    for doc_id in some:
        p = payloads[doc_id]
        assert feats[doc_id].byte_mean == pytest.approx(
            round(sum(p) / len(p), 6)
        )
        assert feats[doc_id].dominant == int(
            hashlib.md5(p.hex().encode()).hexdigest()[:4], 16
        )


def test_frame_sampling_shape(docs):
    frames = multimodal.sample_frames(docs, stride=2)
    per_doc = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    meta = {
        r.doc_id: r.meta.n_frames
        for r in multimodal.attach_payload(docs).collect()
    }
    for r in per_doc:
        # ceil(n_frames / 2) sampled frames
        assert r.n == (meta[r.doc_id] + 1) // 2


def test_real_decode_is_clearly_stubbed(docs):
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_image_real(docs)
