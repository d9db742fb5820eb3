"""Byte-level correctness of the REAL multimodal decode path
(sources/multimodal.py round 4): the synthesized payloads are honest
on-disk PPM/WAV files, the decoder's outputs match hand-computed
values, and external stdlib readers agree with the decoder."""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np
from pyspark.sql import functions as F

from hyperion_history_api_spark.sources.multimodal import (
    decode_media,
    resize_ppm,
    synth_media,
)
from hyperion_history_api_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _media_rows(spark, n=6):
    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < n)
    return {
        int(r["media_id"]): bytes(r["payload"])
        for r in synth_media(docs).collect()
    }, {
        int(r["doc_id"]): r["text"]
        for r in docs.select("doc_id", "text").collect()
    }


def test_synth_payloads_are_honest_files(spark):
    media, texts = _media_rows(spark)
    for mid, payload in media.items():
        dg = hashlib.md5(texts[mid].encode()).digest()
        if mid % 2 == 0:
            assert payload[:2] == b"P6"
            _, dims, _, body = payload.split(b"\n", 3)
            w, h = (int(x) for x in dims.split())
            assert (w, h) == (4 + mid % 13, 3 + mid % 11)
            assert len(body) == 3 * w * h
            assert body[:16] == dg  # pixel stream = repeated digest
        else:
            # the stdlib wave reader (an INDEPENDENT parser) opens it
            with wave.open(io.BytesIO(payload), "rb") as wf:
                assert wf.getframerate() == 8000
                assert wf.getnchannels() == 1
                assert wf.getnframes() == 50 + mid % 200
                pcm = np.frombuffer(
                    wf.readframes(wf.getnframes()), dtype="<i2"
                )
            expect = [(b - 128) * 256 for b in (dg * 20)[: len(pcm)]]
            assert pcm.tolist() == expect


def test_decode_matches_hand_computation(spark):
    media, texts = _media_rows(spark)
    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < 6)
    out = {
        int(r["media_id"]): r
        for r in decode_media(synth_media(docs)).collect()
    }
    for mid, payload in media.items():
        dg = hashlib.md5(texts[mid].encode()).digest()
        r = out[mid]
        if mid % 2 == 0:
            w, h = 4 + mid % 13, 3 + mid % 11
            px = (dg * (3 * w * h // 16 + 1))[: 3 * w * h]
            assert (r["fmt"], r["width"], r["height"]) == ("ppm", w, h)
            assert r["n_units"] == w * h and r["duration_ms"] is None
            assert r["mean_val"] == round(
                float(np.frombuffer(px, "u1").astype("f8").mean()), 4
            )
        else:
            n = 50 + mid % 200
            samples = [(b - 128) * 256 for b in (dg * 20)[:n]]
            assert (r["fmt"], r["width"], r["height"]) == ("wav", None, None)
            assert r["duration_ms"] == n * 1000 // 8000
            assert r["n_units"] == n
            assert r["mean_val"] == round(sum(samples) / n, 4)


def test_resize_nearest_neighbor_exact(spark):
    media, texts = _media_rows(spark)
    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < 6)
    out = {
        int(r["media_id"]): r
        for r in resize_ppm(synth_media(docs), box=8).collect()
    }
    for mid, payload in media.items():
        if mid % 2 != 0:
            assert mid not in out  # WAV rows filtered by the sniff
            continue
        _, dims, _, body = payload.split(b"\n", 3)
        w, h = (int(x) for x in dims.split())
        img = np.frombuffer(body[: 3 * w * h], "u1").reshape(h, w, 3)
        ow = 8 if w >= h else max(w * 8 // h, 1)
        oh = 8 if h > w else max(h * 8 // w, 1)
        ref = img[(np.arange(oh) * h) // oh][:, (np.arange(ow) * w) // ow]
        r = out[mid]
        assert (r["in_w"], r["in_h"], r["out_w"], r["out_h"]) == (w, h, ow, oh)
        assert r["out_mean"] == round(float(ref.astype("f8").mean()), 4)


# ------------------------------------------------------------- BMP


def _bmp_rows(spark, n=8):
    from hyperion_history_api_spark.sources.multimodal import synth_media_bmp

    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < n)
    return {
        int(r["media_id"]): bytes(r["payload"])
        for r in synth_media_bmp(docs).collect()
    }, {
        int(r["doc_id"]): r["text"]
        for r in docs.select("doc_id", "text").collect()
    }


def test_bmp_payloads_are_honest_files(spark):
    """Independent parse (struct offsets only, no shared decoder
    code): header fields, declared size, stride padding, and the
    bottom-up byte layout all match the synthesis contract."""
    import struct

    media, texts = _bmp_rows(spark)
    assert any((3 * (3 + m % 14)) % 4 for m in media), "need padded widths"
    for mid, payload in media.items():
        w, h = 3 + mid % 14, 2 + mid % 9
        stride = (3 * w + 3) & ~3
        magic, fsize, _, _, off = struct.unpack_from("<2sIHHI", payload, 0)
        assert magic == b"BM" and off == 54
        assert fsize == len(payload) == 54 + stride * h
        hw, hh = struct.unpack_from("<ii", payload, 18)
        assert (hw, hh) == (w, h)
        dg = hashlib.md5(texts[mid].encode()).digest()
        logical = (dg * (3 * w * h // 16 + 1))[: 3 * w * h]
        # stored row r is logical row h-1-r, then zero pad to stride
        for r in range(h):
            row = payload[54 + r * stride : 54 + (r + 1) * stride]
            lr = h - 1 - r
            assert row[: 3 * w] == logical[3 * w * lr : 3 * w * (lr + 1)]
            assert row[3 * w :] == b"\x00" * (stride - 3 * w)


def test_bmp_decode_matches_hand_computed_means(spark):
    from hyperion_history_api_spark.sources.multimodal import (
        decode_bmp,
        synth_media_bmp,
    )

    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < 8)
    media, texts = _bmp_rows(spark)
    got = {
        int(r["media_id"]): r
        for r in decode_bmp(synth_media_bmp(docs)).collect()
    }
    for mid, text in texts.items():
        w, h = 3 + mid % 14, 2 + mid % 9
        dg = hashlib.md5(text.encode()).digest()
        logical = np.frombuffer(
            (dg * (3 * w * h // 16 + 1))[: 3 * w * h], dtype=np.uint8
        ).astype("float64")
        r = got[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["stride"] == (3 * w + 3) & ~3
        assert r["n_units"] == w * h
        assert r["mean_val"] == round(float(logical.mean()), 4)
        assert r["top_row_mean"] == round(float(logical[: 3 * w].mean()), 4)
        assert r["chan0_mean"] == round(float(logical[0::3].mean()), 4)


def test_bmp_decode_rejects_corrupt_header(spark):
    import pytest as _pytest

    from hyperion_history_api_spark.sources.multimodal import (
        decode_bmp,
        synth_media_bmp,
    )

    docs = load_tables(spark, SF_DIR)["documents"].where(F.col("doc_id") < 2)
    bad = synth_media_bmp(docs).withColumn(
        "payload",
        F.concat(F.lit(b"XX"), F.expr("substring(payload, 3)")),
    )
    with _pytest.raises(Exception, match="BMP|PythonException"):
        decode_bmp(bad).collect()
