"""Multimodal plumbing: metadata sniff (real), decode stubs (fake path)."""
import pytest

from pysemanticcomplexity_spark.operators import multimodal


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nrestofpng"),
        (1, b"\xff\xd8\xff\xe0JFIFdata"),
        (2, b"GIF89a..."),
        (3, b"<html><body>hi</body></html>"),
        (4, b"randombytes" * 20),
        (5, b""),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_binary_metadata(spark, blobs):
    out = {r["id"]: (r["n_bytes"], r["format"])
           for r in multimodal.binary_metadata(blobs).collect()}
    assert out[0][1] == "png"
    assert out[1][1] == "jpeg"
    assert out[2][1] == "gif"
    assert out[3][1] == "html"
    assert out[4][1] == "unknown"
    assert out[0][0] == len(b"\x89PNG\r\n\x1a\nrestofpng")


def test_decode_images_fake_path(spark, blobs):
    out = {r["id"]: r for r in
           multimodal.decode_images(blobs, fake=True).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    for r in out.values():
        assert r["channels"] == 3
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic across runs
    out2 = {r["id"]: r["features"] for r in
            multimodal.decode_images(blobs, fake=True).collect()}
    assert all(out[k]["features"] == out2[k] for k in out)


def test_decode_images_real_path_raises(spark, blobs):
    import pyspark.errors
    with pytest.raises(Exception) as err:
        multimodal.decode_images(blobs, fake=False).collect()
    assert "NotImplementedError" in str(err.value) or "decode" in str(err.value)


def test_frame_sample_fake(spark, blobs):
    out = multimodal.frame_sample(blobs, every_n=2, fake=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert by_id[4] == sorted(by_id[4])
    assert len(by_id[4]) >= 2
