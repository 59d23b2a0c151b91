"""Multimodal binary-column pipeline: metadata, resize, features, frame
sampling — fake RAW8/VID8 codec, real Spark plumbing, numpy oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from mandoline_spark.functions.multimodal import (
    decode_image,
    decode_video,
    encode_image,
    encode_video,
    frame_sample,
    image_features,
    resize_images,
    with_blob_metadata,
)


def _images(n=8, seed=3):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        for h, w in rng.integers(4, 40, (n, 2))
    ]


@pytest.fixture(scope="module")
def image_df(spark):
    imgs = _images()
    pdf = pd.DataFrame(
        {"id": range(len(imgs)), "blob": [encode_image(i) for i in imgs]}
    )
    return spark.createDataFrame(pdf), imgs


def test_codec_roundtrip():
    for img in _images(4):
        np.testing.assert_array_equal(decode_image(encode_image(img)), img)
    vid = np.stack(_images(6, seed=4)[0:1] * 5)
    np.testing.assert_array_equal(decode_video(encode_video(vid)), vid)


def test_non_fake_format_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 not a raw8 image")


def test_blob_metadata(image_df):
    df, imgs = image_df
    got = (
        with_blob_metadata(df, "blob", mime="image/raw8")
        .select("id", "meta.*")
        .orderBy("id")
        .collect()
    )
    for row, img in zip(got, imgs):
        blob = encode_image(img)
        assert row["nbytes"] == len(blob)
        assert row["fp"] == hashlib.md5(blob).hexdigest()
        assert row["mime"] == "image/raw8"


def test_resize_images(image_df):
    df, imgs = image_df
    got = resize_images(df, 8, 8).orderBy("id").collect()
    for row, img in zip(got, imgs):
        out = decode_image(bytes(row["blob"]))
        assert out.shape == (8, 8, 3)
        h, w, _ = img.shape
        yi = (np.arange(8) * h // 8).astype(int)
        xi = (np.arange(8) * w // 8).astype(int)
        np.testing.assert_array_equal(out, img[np.ix_(yi, xi)])


def test_image_features(image_df):
    df, imgs = image_df
    got = image_features(df).orderBy("id").collect()
    for row, img in zip(got, imgs):
        f = np.array(row["features"])
        assert f.shape == (12,)
        imgf = img.astype(np.float64)
        np.testing.assert_allclose(f[0::4], imgf.mean(axis=(0, 1)))
        np.testing.assert_allclose(f[1::4], imgf.std(axis=(0, 1)))


def test_frame_sample(spark):
    rng = np.random.default_rng(9)
    vids = [
        rng.integers(0, 256, (17, 6, 5, 3), dtype=np.uint8),
        rng.integers(0, 256, (4, 6, 5, 3), dtype=np.uint8),
    ]
    pdf = pd.DataFrame(
        {"id": [0, 1], "blob": [encode_video(v) for v in vids]}
    )
    df = spark.createDataFrame(pdf)
    got = frame_sample(df, every_n=5).orderBy("id", "frame_idx").collect()
    expect = [(0, 0), (0, 5), (0, 10), (0, 15), (1, 0)]
    assert [(r["id"], r["frame_idx"]) for r in got] == expect
    for r in got:
        np.testing.assert_array_equal(
            decode_image(bytes(r["frame"])), vids[r["id"]][r["frame_idx"]]
        )


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from mandoline_spark.functions.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(img)) == img).all()
    # header with a comment line (valid per the spec)
    blob = b"P6\n# made by a camera\n5 7\n255\n" + img.tobytes()
    assert (decode_image(blob) == img).all()


def test_wav_roundtrip_and_audio_features(spark):
    import numpy as np

    from mandoline_spark.functions.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / rate) * 16000).astype(np.int16)
    silence = np.zeros(rate // 2, dtype=np.int16)
    stereo = np.stack([sine, -sine], axis=1)

    got, r = decode_wav(encode_wav(sine, rate))
    assert r == rate and (got[:, 0] == sine).all()

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(sine, rate))),
            (2, bytearray(encode_wav(silence, rate))),
            (3, bytearray(encode_wav(stereo, rate))),
        ],
        "clip_id long, blob binary",
    )
    rows = {r.clip_id: r for r in audio_features(df).collect()}
    assert rows[1].sample_rate == rate and rows[1].channels == 1
    assert abs(rows[1].duration_s - 1.0) < 1e-9
    # 440 Hz sine: RMS = amp/sqrt(2), zcr = 2*440/8000
    assert abs(rows[1].rms - (16000 / 32768) / np.sqrt(2)) < 1e-3
    assert abs(rows[1].zcr - 880 / rate) < 0.01
    assert rows[2].rms == 0.0 and rows[2].peak == 0.0
    assert rows[3].channels == 2
    # rms is per-channel (both carry the sine), but the zero-crossing
    # rate runs on the mono mean — the inverse channels cancel to DC
    assert abs(rows[3].rms - rows[1].rms) < 1e-9
    assert rows[3].zcr == 0.0


def test_compressed_codecs_raise(spark):
    import pytest as _pytest

    from mandoline_spark.functions import multimodal as mm
    from mandoline_spark.functions.multimodal import decode_image, decode_wav

    if "pil" not in mm._AUTO_CODECS:  # PNG decodes when PIL auto-registered
        with _pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\nrest")
    with _pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03mp3data")  # mp3: no built-in or auto codec


def test_optional_codec_auto_registration():
    """PIL/soundfile, when importable, are registered at import time so
    compressed corpora work without a manual register_codec call; the
    sniffs are magic-byte-only so the no-deps container still
    cloudpickles every registered closure."""
    from mandoline_spark.functions import multimodal as mm

    # sniffs claim the right formats regardless of library presence
    assert mm._pil_sniff(b"\xff\xd8\xff\xe0rest")  # JPEG
    assert mm._pil_sniff(b"\x89PNG\r\n\x1a\nrest")
    assert mm._pil_sniff(b"RIFF\x00\x00\x00\x00WEBP")
    assert not mm._pil_sniff(b"P6\n1 1\n255\n\x00\x00\x00")  # PPM is built-in
    assert mm._soundfile_sniff(b"fLaC\x00\x00\x00\x00")
    assert not mm._soundfile_sniff(b"ID3\x03mp3")
    # registry state matches library availability
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    assert ("pil" in mm._AUTO_CODECS) == has_pil
    image_names = [n for n, _, _ in mm._CODECS["image"]]
    assert ("pil" in image_names) == has_pil
    if has_pil:  # auto path end-to-end (skipped in the no-deps container)
        import io

        from PIL import Image

        arr = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        from mandoline_spark.functions.multimodal import decode_image

        assert np.array_equal(decode_image(buf.getvalue()), arr)


def test_register_codec_reaches_executors(spark):
    """A driver-side register_codec must make image_features decode a
    new format WITHOUT editing multimodal.py: the operator snapshots
    the registry into its closure at plan time, so the registered
    callables ride to executors with the serialized stage."""
    import numpy as np

    from mandoline_spark.functions import multimodal as mm

    # fake "compressed" format: magic FAKE + h + w, one gray channel of
    # constant value 7
    def sniff(b):
        return b[:4] == b"FAKE"

    def decode(b):
        import struct as _s

        h, w = _s.unpack("<HH", b[4:8])
        return np.full((h, w, 1), 7, np.uint8)

    mm.register_codec("image", "fake", sniff, decode)
    try:
        import struct as _s

        blob = b"FAKE" + _s.pack("<HH", 4, 6)
        df = spark.createDataFrame([(1, bytearray(blob))], "id long, blob binary")
        rows = mm.image_features(df).collect()
        assert len(rows) == 1
        # [mean, std, min, max] for the single channel of constant 7
        assert rows[0].features == [7.0, 0.0, 7.0, 7.0]
    finally:
        mm.unregister_codec("image", "fake")
    # after unregistering, the same blob raises again
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        mm.decode_image(blob)


def test_greedy_codec_is_an_explicit_override():
    """Pins the registry's documented tie semantics (the sniff
    contract at register_codec): priority-0 insertion means a greedy
    sniff SHADOWS the built-ins for every blob it claims — which is
    why the contract requires sniffs to claim only losslessly-decoded
    formats — and unregistering restores the byte-exact built-in."""
    import numpy as np

    from mandoline_spark.functions import multimodal as mm

    sine = (np.sin(np.linspace(0, 6.28, 64)) * 3000).astype(np.int16)
    blob = mm.encode_wav(sine, 8000)

    calls = []

    def greedy_decode(b):
        calls.append(len(b))
        return (np.zeros((1, 1), np.int16), 1)

    mm.register_codec("audio", "greedy", lambda b: True, greedy_decode)
    try:
        got, rate = mm.decode_wav(blob)
        assert rate == 1 and calls, "greedy codec must win every sniff"
    finally:
        mm.unregister_codec("audio", "greedy")
    got, rate = mm.decode_wav(blob)
    assert rate == 8000
    np.testing.assert_array_equal(got[:, 0], sine)


def test_soundfile_sniff_excludes_pcm16_wav():
    """VERDICT r7 #2: 16-bit integer PCM WAV must stay on the built-in
    lossless decoder even when a soundfile codec is registered (later
    registrations win sniff ties, so the sniff itself must decline);
    float/24-bit WAVs are NOT silently downconverted — without
    soundfile they raise, with it they are an explicit opt-in."""
    import struct

    from mandoline_spark.functions import multimodal as mm
    from mandoline_spark.functions.multimodal import decode_wav, encode_wav

    def _wav(fmt_tag, bits, fmt_size=16, extensible_tag=None):
        fmt = struct.pack("<HHIIHH", fmt_tag, 1, 8000, 8000 * bits // 8,
                          bits // 8, bits)
        if fmt_size > 16:
            # cbSize + validBitsPerSample + channelMask + SubFormat GUID
            # (the GUID's leading u16 IS the real format tag)
            ext = struct.pack("<HHI", fmt_size - 18, bits, 0)
            if extensible_tag is not None:
                ext += struct.pack("<H", extensible_tag) + b"\x00" * 14
            fmt += ext
        data = b"\x00" * 16
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    pcm16 = _wav(1, 16)
    f32 = _wav(3, 32)
    pcm24 = _wav(1, 24)
    ext_pcm16 = _wav(0xFFFE, 16, fmt_size=40, extensible_tag=1)

    assert mm._wav_is_pcm16(pcm16)
    assert mm._wav_is_pcm16(ext_pcm16)
    assert not mm._wav_is_pcm16(f32)
    assert not mm._wav_is_pcm16(pcm24)
    assert not mm._wav_is_pcm16(b"RIFFxxxx")  # malformed: False, not raise
    # ADVICE r8: a WAVE_FORMAT_EXTENSIBLE fmt chunk whose declared size
    # (24-25) passes the old guards but stops BEFORE the GUID tag must
    # return False, not raise struct.error from the short slice.
    trunc_ext = _wav(0xFFFE, 16, fmt_size=24)
    assert mm._wav_is_pcm16(trunc_ext) is False
    # ...and the same header with the blob cut at the chunk end (the
    # literal short-slice unpack the old guards allowed)
    fmt_end = 12 + 8 + 24
    assert mm._wav_is_pcm16(trunc_ext[:fmt_end]) is False

    # the sniff declines exactly the built-in's formats
    assert not mm._soundfile_sniff(pcm16)
    assert not mm._soundfile_sniff(ext_pcm16)
    assert mm._soundfile_sniff(f32)
    assert mm._soundfile_sniff(pcm24)
    assert mm._soundfile_sniff(b"fLaC\x00\x00\x00\x00")

    # built-in path wins for PCM16 even with a later-registered codec
    # whose decode would corrupt the samples if reached
    def _poison(b):
        raise AssertionError("soundfile-shaped codec must not claim PCM16")

    mm.register_codec("audio", "poison-sf", mm._soundfile_sniff, _poison)
    try:
        sine = (np.sin(np.linspace(0, 6.28, 64)) * 3000).astype(np.int16)
        got, rate = decode_wav(encode_wav(sine, 8000))
        np.testing.assert_array_equal(got[:, 0], sine)
        assert rate == 8000
        # a REAL encode_wav blob is also classified PCM16 by the parser
        assert mm._wav_is_pcm16(encode_wav(sine, 8000))
        # float WAV: the poison codec claims it (the opt-in path)
        with pytest.raises(AssertionError, match="must not claim"):
            decode_wav(f32)
    finally:
        mm.unregister_codec("audio", "poison-sf")

    # without any library codec, float WAV raises (built-in declines
    # non-16-bit inside its decode)
    try:
        import soundfile  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            decode_wav(f32)
