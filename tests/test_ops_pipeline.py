"""Composed curation chain + multimodal resize plumbing."""

from pyspark.sql import functions as F

from kgloom.ops.curate import curate
from kgloom.ops.multimodal import resize_images, synth_assets


def test_curate_chain_semantics(spark):
    rows = [
        (1, "the cat sat on the mat in the sun"),       # en, kept
        (2, "the cat sat on the mat in the sun"),       # exact dup of 1
        (3, "the cat sat on the mat in the rain"),      # near dup of 1
        (4, "el gato y la casa de los que hablan"),     # es → dropped
        (5, "tiny"),                                    # < min_tokens
        (6, "the quick brown fox jumps over the lazy dog of norway"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: (r.n_tokens, r.pred_lang)
           for r in curate(docs, jaccard_threshold=0.4, min_tokens=3,
                           langs=("en",)).collect()}
    assert set(out) == {1, 6}
    assert out[1][1] == "en" and out[6][0] == 11


def test_resize_images_schema_and_passthrough(spark):
    assets = synth_assets(spark, 12)
    out = resize_images(assets, width=4, height=4).collect()
    assert len(out) == 12
    by_id = {r.asset_id: r for r in out}
    for r in out:
        if r.modality == "image":
            assert r.width == 4 and r.height == 4
            assert len(r.payload) == 16  # width*height byte budget
        else:  # audio/video rows pass through untouched
            assert r.width == 64 and len(r.payload) > 16
    # deterministic fake: same input → same bytes
    again = {r.asset_id: bytes(r.payload)
             for r in resize_images(assets, 4, 4).collect()}
    assert all(bytes(by_id[a].payload) == again[a] for a in again)


def test_redact_pii_semantics(spark):
    from kgloom.ops.textstats import redact_pii
    rows = [
        (1, "mail me at jo.doe+x@ex-ample.org or call +1 (555) 123-4567"),
        (2, "server at 192.168.0.1 responded"),
        (3, "no pii here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: (r.text, r.n_redactions)
           for r in redact_pii(docs).collect()}
    assert out[1] == ("mail me at [EMAIL] or call [PHONE]", 2)
    assert out[2] == ("server at [IPV4] responded", 1)
    assert out[3] == ("no pii here at all", 0)


def test_multimodal_real_mode_gates_on_pil(spark):
    """Without Pillow, real mode fails fast on the DRIVER (clear
    NotImplementedError before any Spark job); with Pillow present the
    real kernels run (covered by the skipif test below)."""
    import pytest

    from kgloom.ops import multimodal as M
    assets = M.synth_assets(spark, 6)
    if not M._HAS_PIL:
        with pytest.raises(NotImplementedError):
            M.extract_features(assets, batch_fake=False)
        with pytest.raises(NotImplementedError):
            M.resize_images(assets, batch_fake=False)
    else:
        assert M.extract_features(assets, batch_fake=False) is not None


def test_multimodal_real_decoder_with_pil(spark):
    """Real PIL decode path end-to-end: a genuine PNG payload through
    the same mapInPandas kernels (runs only where Pillow exists)."""
    import pytest

    from kgloom.ops import multimodal as M
    if not M._HAS_PIL:
        pytest.skip("Pillow not installed in this environment")
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (255, 0, 0)).save(buf, format="PNG")
    assets = spark.createDataFrame(
        [("a0", "image", "image/png", bytearray(buf.getvalue()),
          16, 16, None)], schema=M.ASSET_SCHEMA)
    feats = M.extract_features(assets, batch_fake=False).collect()
    assert len(feats) == 1 and len(feats[0].feature) == 8
    assert abs(sum(feats[0].feature) - 1.0) < 1e-3  # histogram sums to 1
    resized = M.resize_images(assets, width=4, height=4,
                              batch_fake=False).collect()[0]
    with Image.open(io.BytesIO(bytes(resized.payload))) as im:
        assert im.size == (4, 4)
