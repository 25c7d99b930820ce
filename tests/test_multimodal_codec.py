"""Capability-gated codec path for multimodal operators.

Pillow is not installed in this container, so three layers cover the
contract:

1. the codec BRANCH is exercised with a PIL-shaped stub module fed to
   the module-level helpers (`_decode_with` / `_resize_with`) — the
   same code the mapInPandas kernels call;
2. a real-PIL end-to-end test runs wherever Pillow IS installed
   (skipped here);
3. the Spark-side fallback + `use_codec=True` hard-require are checked
   through the real mapInPandas plan.
"""

from __future__ import annotations

import importlib.util
import io

import pytest

HAS_PIL = importlib.util.find_spec("PIL") is not None


class _StubImage:
    """PIL.Image-shaped object: open() parses our toy header
    b'IMG<w><h>' (two bytes), resize returns a new stub, save writes a
    recognizable marker."""

    def __init__(self, width, height):
        self.width, self.height = width, height

    def resize(self, size):
        return _StubImage(*size)

    def save(self, buf, format):
        buf.write(b"PNGSTUB:%dx%d:%s" % (self.width, self.height, format.encode()))


class _StubImageModule:
    @staticmethod
    def open(fp):
        data = fp.read()
        assert data[:3] == b"IMG", "stub codec fed a non-image payload"
        return _StubImage(data[3], data[4])


def test_codec_branch_decodes_real_image_mime():
    from data_pipeline_project_spark.operators.multimodal import _decode_with

    payload = b"IMG" + bytes([120, 80]) + b"rest"
    assert _decode_with(_StubImageModule, "image/png", payload) == (120, 80)
    # synthetic */fake types never take the codec path even when a
    # codec exists (the stub would assert on the missing IMG header)
    assert _decode_with(_StubImageModule, "image/fake", bytes([7, 9, 1])) == (7, 9)
    # and audio never routes to the image codec
    assert _decode_with(_StubImageModule, "audio/wav", bytes([3, 4])) == (3, 4)


def test_codec_branch_resizes_and_reencodes():
    from data_pipeline_project_spark.operators.multimodal import _resize_with

    out = _resize_with(_StubImageModule, "image/jpeg", b"IMG\x10\x10", 64, 32)
    assert out == b"PNGSTUB:64x32:PNG"
    # fallback: truncate/pad to width*height
    fb = _resize_with(None, "image/jpeg", b"abc", 2, 3)
    assert fb == b"abc\x00\x00\x00"


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this container")
def test_real_pil_roundtrip(spark):
    """End-to-end with the real codec: encode a PNG, decode dims and
    resize through the Spark operators."""
    from PIL import Image

    from data_pipeline_project_spark.operators.multimodal import (
        extract_media_features,
        resize_media,
    )

    buf = io.BytesIO()
    Image.new("RGB", (12, 8)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(buf.getvalue()))],
        "doc_id long, media_type string, payload binary",
    )
    feat = extract_media_features(media, use_codec=True).collect()[0]
    assert (feat.width, feat.height) == (12, 8)
    resized = resize_media(media, 4, 4, use_codec=True).collect()[0]
    img = Image.open(io.BytesIO(bytes(resized.payload)))
    assert (img.width, img.height) == (4, 4)


def test_spark_fallback_and_hard_require(spark):
    """Through the real mapInPandas plan: auto mode falls back to the
    deterministic fake when no codec exists; use_codec=True fails
    loudly instead of emitting fake dims."""
    from data_pipeline_project_spark.operators.multimodal import (
        extract_media_features,
    )

    media = spark.createDataFrame(
        [(1, "image/fake", bytearray([9, 4, 0, 0]))],
        "doc_id long, media_type string, payload binary",
    )
    row = extract_media_features(media, use_codec=None).collect()[0]
    assert (row.width, row.height, row.n_bytes) == (9, 4, 4)
    # forced-fake is identical
    row2 = extract_media_features(media, use_codec=False).collect()[0]
    assert (row2.width, row2.height) == (9, 4)

    if not HAS_PIL:
        with pytest.raises(Exception, match="Pillow"):
            extract_media_features(media, use_codec=True).collect()


# ---- perceptual hashing -----------------------------------------------------

def test_phash_exact_dup_and_locality(spark):
    """Identical payloads hash identically (Hamming 0); a one-byte edit
    moves the hash strictly less than an unrelated payload does — the
    locality property that makes pHash a NEAR-dup signal, real even on
    the stub decoder (bytes tile the pixel grid, so local edits are
    local pixel changes)."""
    import numpy as np

    from data_pipeline_project_spark.operators.multimodal import (
        perceptual_hash,
    )

    rng = np.random.RandomState(3)
    base = bytes(rng.randint(0, 256, 1024, dtype=np.uint8))
    tweaked = bytearray(base)
    tweaked[500] = (tweaked[500] + 1) % 256  # one-byte edit
    rows = [
        (0, "image/fake", base),
        (1, "image/fake", base),            # exact duplicate
        (2, "image/fake", bytes(tweaked)),  # near duplicate
        (3, "image/fake", bytes(rng.randint(0, 256, 1024, dtype=np.uint8))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    h = {r.doc_id: r.phash for r in perceptual_hash(media).collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert h[0] == h[1]
    assert ham(h[0], h[2]) <= 3   # local edit: hash survives
    assert ham(h[0], h[3]) > 10   # unrelated content: far away


def test_media_near_pairs_finds_exact_dups_only_at_tight_radius(spark):
    from data_pipeline_project_spark.operators.multimodal import (
        media_near_pairs,
    )

    import numpy as np

    rng = np.random.RandomState(3)
    base = bytes(rng.randint(0, 256, 1024, dtype=np.uint8))
    tweaked = bytearray(base)
    tweaked[500] = (tweaked[500] + 1) % 256
    rows = [
        (0, "image/fake", base),
        (1, "image/fake", base),                # exact dup of 0
        (2, "image/fake", bytes(tweaked)),      # near dup of 0
        (3, "image/fake", bytes(rng.randint(0, 256, 1024, dtype=np.uint8))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    pairs = sorted(
        (r.id_a, r.id_b) for r in media_near_pairs(media, max_hamming=3).collect()
    )
    assert pairs == [(0, 1), (0, 2), (1, 2)]  # the dup cluster, nothing else


def test_phash_brightness_invariance_on_stub_pixels(spark):
    """The DC coefficient is excluded, so a constant brightness shift
    of every pixel leaves the hash unchanged. Exercised through the
    pixel helper directly (payload bytes can't express +20 brightness
    without wrap-around)."""
    import numpy as np

    from data_pipeline_project_spark.operators.multimodal import _phash60

    rng = np.random.RandomState(11)
    px = rng.rand(32, 32) * 200
    assert _phash60(px) == _phash60(px + 20.0)


# ---- audio: REAL stdlib-wave decode (no stub needed — wave ships) ----------


def _make_wav(rate=16_000, secs=0.25, freq=440.0, width=2, chans=1, amp=0.5):
    """In-memory PCM WAV: a sine at `amp` of full scale."""
    import math
    import struct
    import wave

    import numpy as np

    n = int(rate * secs)
    t = np.arange(n) / rate
    x = amp * np.sin(2 * math.pi * freq * t)
    if width == 1:
        data = (x * 127 + 128).astype(np.uint8).tobytes()
    elif width == 2:
        data = (x * 32767).astype("<i2").tobytes()
    elif width == 4:
        data = (x * (2**31 - 1)).astype("<i4").tobytes()
    else:
        raise ValueError(width)
    if chans == 2:
        # interleave the same signal on both channels
        import numpy as np

        mono = np.frombuffer(data, dtype=np.uint8).reshape(n, width)
        data = np.repeat(mono, 2, axis=0).tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(chans)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data)
    return buf.getvalue()


def test_audio_real_wav_decode(spark):
    """The REAL audio path: genuine RIFF/WAVE bytes through the actual
    mapInPandas plan. Sample rate / channels / frames / duration come
    straight from the container; RMS of a 0.5-full-scale sine must be
    0.5/sqrt(2) within quantization error — a value the fake path
    cannot produce by accident."""
    from data_pipeline_project_spark.operators.multimodal import (
        extract_audio_features,
    )

    rows = [
        (1, "audio/wav", _make_wav(rate=16_000, secs=0.25, amp=0.5, width=2)),
        (2, "audio/wav", _make_wav(rate=8_000, secs=0.5, amp=0.25, width=1)),
        (3, "audio/wav", _make_wav(rate=44_100, secs=0.1, amp=0.9, width=4)),
        (4, "audio/wav", _make_wav(rate=16_000, secs=0.2, amp=0.5, chans=2)),
        (5, "audio/fake", b"0123456789abcdef" * 50),  # fake co-resident
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {
        r["doc_id"]: r
        for r in extract_audio_features(media).collect()
    }
    import math

    r1 = out[1]
    assert r1["sample_rate"] == 16_000 and r1["n_channels"] == 1
    assert r1["n_frames"] == 4_000
    assert abs(r1["duration_s"] - 0.25) < 1e-9
    assert abs(r1["rms"] - 0.5 / math.sqrt(2)) < 2e-3

    r2 = out[2]  # 8-bit unsigned PCM: the 128-offset must be removed
    assert r2["sample_rate"] == 8_000
    assert abs(r2["rms"] - 0.25 / math.sqrt(2)) < 8e-3  # 8-bit quantization

    r3 = out[3]  # 32-bit PCM
    assert r3["sample_rate"] == 44_100 and r3["n_frames"] == 4_410
    assert abs(r3["rms"] - 0.9 / math.sqrt(2)) < 2e-3

    r4 = out[4]  # stereo: frames counted per channel-frame, same RMS
    assert r4["n_channels"] == 2
    assert abs(r4["duration_s"] - 0.2) < 1e-9
    assert abs(r4["rms"] - 0.5 / math.sqrt(2)) < 2e-3

    # the fake row keeps the fake contract (8 kHz, byte-count frames)
    r5 = out[5]
    assert r5["sample_rate"] == 8_000 and r5["n_frames"] == 800
    assert r5["duration_s"] == 800 / 8000.0


def test_audio_fake_forced_and_24bit_branch(spark):
    """use_codec=False forces the deterministic fake even on real WAV
    bytes (hermetic mode); the 24-bit widening branch decodes a known
    constant signal exactly."""
    import numpy as np

    from data_pipeline_project_spark.operators.multimodal import (
        _decode_audio_with,
        extract_audio_features,
    )

    wav = _make_wav(secs=0.1)
    media = spark.createDataFrame(
        [(1, "audio/wav", wav)], "doc_id long, media_type string, payload binary"
    )
    forced = extract_audio_features(media, use_codec=False).collect()[0]
    assert forced["sample_rate"] == 8_000           # fake signature
    assert forced["n_frames"] == len(wav)

    # 24-bit: hand-build a WAV holding constant +half-scale samples
    import wave as wave_mod

    half = 2**22  # == 0.5 full scale in 24-bit (2^23 is full)
    frames = int.to_bytes(half, 3, "little", signed=True) * 100
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(1000)
        w.writeframes(frames)
    rate, chans, n, dur, rms = _decode_audio_with(
        wave_mod, "audio/wav", buf.getvalue()
    )
    assert (rate, chans, n) == (1000, 1, 100)
    assert abs(dur - 0.1) < 1e-12
    assert abs(rms - 0.5) < 1e-9  # constant signal: RMS == level exactly

    with pytest.raises(NotImplementedError):
        _decode_audio_with(wave_mod, "audio/fake", b"")


# ---- audio fingerprint + near-dup pairs ------------------------------------


def _make_melody_wav(freqs, rate=8_000, sec_per=0.1, amp=0.5, noise=0.0, seed=0):
    """Tone sequence WAV: one sine frequency per section — a
    non-stationary signal whose spectral shape changes across the
    fingerprint's time frames."""
    import math
    import wave

    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(rate * sec_per)
    parts = []
    for f in freqs:
        t = np.arange(n) / rate
        x = amp * np.sin(2 * math.pi * f * t)
        if noise:
            x = x + noise * rng.standard_normal(n)
        parts.append(x)
    sig = np.clip(np.concatenate(parts), -1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((sig * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_audio_fingerprint_invariances_and_near_pairs(spark):
    """The audio near-dup tier on REAL WAV bytes: identical audio has
    Hamming 0; the same melody at a different volume has Hamming 0
    (within-frame spectral-shape bits are amplitude-invariant); the
    same melody under low-level noise stays within the banded join's
    radius; a different melody does not pair."""
    from data_pipeline_project_spark.operators.multimodal import (
        audio_fingerprint,
        audio_near_pairs,
    )

    melody = [440, 880, 220, 1760, 440, 660, 330, 990]
    other = [523, 262, 1047, 392, 784, 587, 294, 1175]
    rows = [
        (1, "audio/wav", _make_melody_wav(melody, amp=0.5)),
        (2, "audio/wav", _make_melody_wav(melody, amp=0.5)),   # exact dup
        (3, "audio/wav", _make_melody_wav(melody, amp=0.9)),   # louder
        (4, "audio/wav", _make_melody_wav(melody, amp=0.5, noise=0.02, seed=7)),
        (5, "audio/wav", _make_melody_wav(other, amp=0.5)),    # different
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    fp = {r.doc_id: r.afp for r in audio_fingerprint(media).collect()}

    def ham(a, b):
        return bin(fp[a] ^ fp[b]).count("1")

    assert ham(1, 2) == 0                       # identical bytes
    assert ham(1, 3) == 0                       # amplitude-invariant
    assert ham(1, 4) <= 3                       # noise: inside radius
    assert ham(1, 5) > 3                        # different melody

    pairs = {
        (r.id_a, r.id_b)
        for r in audio_near_pairs(media, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (1, 4) in pairs
    assert (2, 3) in pairs
    assert not any(5 in p for p in pairs)


def test_audio_fingerprint_fake_and_short_payloads(spark):
    """The deterministic fake path fingerprints byte payloads (exact
    dups collide; distinct payloads don't), and payloads shorter than
    one frame tile deterministically instead of failing."""
    from data_pipeline_project_spark.operators.multimodal import (
        _audio_fp60,
        audio_fingerprint,
    )

    import numpy as np

    media = spark.createDataFrame(
        [
            (1, "audio/fake", b"0123456789abcdef" * 64),
            (2, "audio/fake", b"0123456789abcdef" * 64),
            (3, "audio/fake", bytes(range(256)) * 4),
        ],
        "doc_id long, media_type string, payload binary",
    )
    fp = {r.doc_id: r.afp for r in audio_fingerprint(media).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]

    short = _audio_fp60(np.array([0.5, -0.5, 0.25]))
    assert short == _audio_fp60(np.array([0.5, -0.5, 0.25]))  # deterministic
    import pytest

    with pytest.raises(NotImplementedError):
        _audio_fp60(np.array([]))


# ---- video container metadata (real ISO BMFF parse) ------------------------


def _mp4_box(fourcc, body):
    import struct

    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _make_mp4(duration_ticks=7500, timescale=1000, w=640, h=360,
              codec=b"avc1", mvhd_v1=False, n_audio_tracks=0):
    """Minimal-but-valid ISO BMFF: ftyp + moov{mvhd, trak{tkhd,
    mdia{minf{stbl{stsd(codec)}}}}[, audio traks]} built with stdlib
    struct — real container bytes, no media data."""
    import struct

    if mvhd_v1:
        mvhd = _mp4_box(
            b"mvhd",
            bytes([1]) + bytes(3) + bytes(16)
            + struct.pack(">IQ", timescale, duration_ticks) + bytes(80),
        )
    else:
        mvhd = _mp4_box(
            b"mvhd",
            bytes(4) + bytes(8)
            + struct.pack(">II", timescale, duration_ticks) + bytes(80),
        )
    tkhd = _mp4_box(
        b"tkhd", bytes(4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36)
        + struct.pack(">II", w << 16, h << 16)
    )
    entry = struct.pack(">I", 16) + codec + bytes(8)
    stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    mdia = _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))
    trak = _mp4_box(b"trak", tkhd + mdia)
    audio_traks = b""
    for _ in range(n_audio_tracks):
        a_tkhd = _mp4_box(
            b"tkhd", bytes(4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36)
            + struct.pack(">II", 0, 0)      # audio: zero dims
        )
        a_entry = struct.pack(">I", 16) + b"mp4a" + bytes(8)
        a_stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + a_entry)
        a_mdia = _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", a_stsd)))
        audio_traks += _mp4_box(b"trak", a_tkhd + a_mdia)
    moov = _mp4_box(b"moov", mvhd + trak + audio_traks)
    return _mp4_box(b"ftyp", b"isom" + bytes(4)) + moov


def test_video_metadata_real_mp4_parse(spark):
    """REAL ISO BMFF parsing through the actual mapInPandas plan:
    duration from mvhd (v0 and 64-bit v1), dimensions from tkhd's
    16.16 fixed point, codec from the first stsd entry, track count
    including audio traks; the fake path stays deterministic."""
    from data_pipeline_project_spark.operators.multimodal import (
        _parse_mp4_meta,
        extract_video_metadata,
    )

    rows = [
        (1, "video/mp4", _make_mp4()),
        (2, "video/mp4", _make_mp4(duration_ticks=90_000, timescale=600,
                                   w=1920, h=1080, codec=b"hvc1",
                                   mvhd_v1=True, n_audio_tracks=1)),
        (3, "video/fake", b"\x20fakepayload\x40"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in extract_video_metadata(media).collect()}

    r1 = out[1]
    assert abs(r1.duration_s - 7.5) < 1e-9
    assert (r1.n_tracks, r1.width, r1.height, r1.codec) == (1, 640, 360, "avc1")

    r2 = out[2]  # v1 mvhd, 2 tracks, video dims win over audio zeros
    assert abs(r2.duration_s - 150.0) < 1e-9
    assert (r2.n_tracks, r2.width, r2.height, r2.codec) == (2, 1920, 1080, "hvc1")

    r3 = out[3]  # deterministic fake
    assert (r3.width, r3.height, r3.codec) == (0x20, 0x40, "fake")

    import pytest

    with pytest.raises(ValueError, match="no moov"):
        _parse_mp4_meta(b"garbage that is not a container")


def _make_mp4_with_samples(samples, chunks, sync=None, codec=b"avc1",
                           co64=False):
    """MP4 with a real mdat + sample tables: ftyp, mdat (concatenated
    sample bytes), then moov whose stsz/stsc/stco describe exactly
    where each sample lives (moov last, so offsets don't depend on its
    size). `chunks` = samples per chunk; `sync` = 1-based keyframe
    sample numbers (None = no stss box = every sample a keyframe)."""
    import struct

    assert sum(chunks) == len(samples)
    ftyp = _mp4_box(b"ftyp", b"isom" + bytes(4))
    mdat = _mp4_box(b"mdat", b"".join(bytes(s) for s in samples))
    data_start = len(ftyp) + 8

    offs, i, cur = [], 0, data_start
    for c in chunks:
        offs.append(cur)
        cur += sum(len(s) for s in samples[i : i + c])
        i += c

    stsz = _mp4_box(
        b"stsz",
        bytes(4) + struct.pack(">II", 0, len(samples))
        + struct.pack(f">{len(samples)}I", *[len(s) for s in samples]),
    )
    stsc_rows = []
    for ci, c in enumerate(chunks):
        if not stsc_rows or stsc_rows[-1][1] != c:
            stsc_rows.append((ci + 1, c, 1))
    stsc = _mp4_box(
        b"stsc",
        bytes(4) + struct.pack(">I", len(stsc_rows))
        + b"".join(struct.pack(">III", *r) for r in stsc_rows),
    )
    if co64:
        stco = _mp4_box(
            b"co64",
            bytes(4) + struct.pack(">I", len(offs))
            + struct.pack(f">{len(offs)}Q", *offs),
        )
    else:
        stco = _mp4_box(
            b"stco",
            bytes(4) + struct.pack(">I", len(offs))
            + struct.pack(f">{len(offs)}I", *offs),
        )
    boxes = stsz + stsc + stco
    if sync is not None:
        boxes += _mp4_box(
            b"stss",
            bytes(4) + struct.pack(">I", len(sync))
            + struct.pack(f">{len(sync)}I", *sync),
        )
    entry = struct.pack(">I", 16) + codec + bytes(8)
    stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    mvhd = _mp4_box(
        b"mvhd", bytes(4) + bytes(8) + struct.pack(">II", 1000, 5000) + bytes(80)
    )
    tkhd = _mp4_box(
        b"tkhd", bytes(4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36)
        + struct.pack(">II", 320 << 16, 240 << 16)
    )
    mdia = _mp4_box(
        b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd + boxes))
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def test_real_mp4_keyframe_extraction(spark):
    """sample_frames on a genuine container: the MP4 sample tables are
    walked (stsz sizes, stsc chunk mapping, stco offsets, stss sync
    marks) and the KEYFRAMES' actual byte ranges come back out of the
    payload — values only the real tables can produce. Fake payloads
    keep the chunker; missing sample tables fail loudly."""
    import pytest

    from data_pipeline_project_spark.operators.multimodal import (
        _mp4_samples,
        sample_frames,
    )

    planted = [b"KEY0" + b"a" * 20, b"dlt1" + b"b" * 7, b"dlt2" + b"c" * 33,
               b"KEY3" + b"d" * 11, b"dlt4" + b"e" * 5]
    mp4 = _make_mp4_with_samples(planted, chunks=[2, 3], sync=[1, 4])

    # pure-parser contract: every sample slices back byte-identical
    got = _mp4_samples(mp4)
    assert [sz for _, sz, _ in got] == [len(s) for s in planted]
    assert [mp4[o : o + s] for o, s, _ in got] == planted
    assert [is_sync for _, _, is_sync in got] == [True, False, False, True, False]

    media = spark.createDataFrame(
        [
            (1, "video/mp4", mp4),
            (2, "video/fake", b"0123456789abcdef" * 3),
        ],
        "doc_id long, media_type string, payload binary",
    )
    rows = {
        (r.doc_id, r.frame_no): (r.frame_bytes, r.frame_prefix)
        for r in sample_frames(media).collect()
    }
    # doc 1: exactly the two keyframes, at their sample indices
    assert rows[(1, 0)] == (24, "KEY0")
    assert rows[(1, 3)] == (15, "KEY3")
    assert not any(d == 1 and no in (1, 2, 4) for d, no in rows)
    # doc 2: chunker fallback intact
    assert rows[(2, 0)][0] == 16 and rows[(2, 2)][1] == "0123"

    # no stss box == every sample is a keyframe, capped at MAX_FRAMES
    all_sync = _make_mp4_with_samples(planted, chunks=[5], sync=None)
    assert sum(1 for _, _, s in _mp4_samples(all_sync) if s) == 5

    with pytest.raises(ValueError, match="stsz/stco/stsc"):
        _mp4_samples(_make_mp4())  # metadata-only container, no tables


def test_mp4_co64_offsets():
    """64-bit chunk offsets (co64 — what any >4 GB container writes)
    walk identically to stco."""
    from data_pipeline_project_spark.operators.multimodal import _mp4_samples

    planted = [b"AAA1", b"BBB22", b"CCC333"]
    mp4 = _make_mp4_with_samples(planted, chunks=[2, 1], co64=True)
    got = _mp4_samples(mp4)
    assert [mp4[o : o + s] for o, s, _ in got] == planted


def test_audio_fingerprint_sample_rate_invariant(spark):
    """The same melody recorded at 8/16/44.1 kHz lands within the
    banded radius (internal resample to AUDIO_FP_RATE); without it,
    band positions would be relative to each file's own Nyquist and
    re-encoded copies would never pair."""
    from data_pipeline_project_spark.operators.multimodal import (
        audio_fingerprint,
    )

    melody = [440, 880, 220, 1760, 440, 660, 330, 990]
    rows = [
        (1, "audio/wav", _make_melody_wav(melody, rate=8_000)),
        (2, "audio/wav", _make_melody_wav(melody, rate=16_000)),
        (3, "audio/wav", _make_melody_wav(melody, rate=44_100)),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    fp = {r.doc_id: r.afp for r in audio_fingerprint(media).collect()}

    def ham(a, b):
        return bin(fp[a] ^ fp[b]).count("1")

    assert ham(1, 2) <= 3 and ham(1, 3) <= 3 and ham(2, 3) <= 3


def test_video_metadata_lenient_mode_quarantines_corrupt(spark):
    """strict=False: a corrupt container yields NULL features (the
    quarantine contract) instead of failing the batch; good rows in
    the same batch are unaffected; strict=True still raises."""
    import pytest

    from data_pipeline_project_spark.operators.multimodal import (
        extract_video_metadata,
    )

    rows = [
        (1, "video/mp4", _make_mp4()),
        (2, "video/mp4", b"definitely not an mp4"),
        (3, "video/fake", b"\x05ok\x09"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in extract_video_metadata(media, strict=False).collect()}
    assert out[1].codec == "avc1" and out[1].width == 640
    assert out[2].duration_s is None and out[2].codec is None
    assert out[3].codec == "fake"

    with pytest.raises(Exception):
        extract_video_metadata(media, strict=True).collect()


def test_mjpeg_frames_decode_through_image_gate():
    """MJPEG-family tracks: every MP4 keyframe sample is a complete
    JPEG, so frame decode rides the existing image codec gate — the
    planted per-sample dims come back out, values only a real sample
    walk + per-sample decode can produce. Other codecs stay behind the
    declared ffmpeg gate; a missing image codec refuses loudly."""
    import pytest

    from data_pipeline_project_spark.operators.multimodal import (
        _decode_frames_with,
    )

    # three "JPEG" samples (stub header IMG<w><h>), samples 1 and 3 sync
    planted = [
        b"IMG" + bytes([64, 48]) + b"x" * 9,
        b"IMG" + bytes([32, 32]) + b"y" * 4,
        b"IMG" + bytes([120, 80]) + b"z" * 17,
    ]
    mjpeg = _make_mp4_with_samples(planted, chunks=[3], sync=[1, 3],
                                   codec=b"jpeg")
    got = _decode_frames_with(_StubImageModule, "video/mp4", mjpeg)
    assert got == [(0, 64, 48), (2, 120, 80)]

    # non-MJPEG codecs need a real video decoder: declared stub
    avc = _make_mp4_with_samples(planted, chunks=[3], sync=[1], codec=b"avc1")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _decode_frames_with(_StubImageModule, "video/mp4", avc)
    # MJPEG without an image codec on the worker: loud, not silent
    with pytest.raises(NotImplementedError, match="Pillow"):
        _decode_frames_with(None, "video/mp4", mjpeg)
    # fake payloads keep the deterministic chunker dims
    fake = _decode_frames_with(None, "video/fake", bytes(range(1, 40)))
    assert fake and all(len(t) == 3 for t in fake)


def test_decode_frames_spark_fake_path(spark):
    """The mapInPandas plumbing: schema, row expansion, and the
    use_codec=False forced-fake branch — hermetic (no Pillow here)."""
    from data_pipeline_project_spark.operators.multimodal import (
        FRAME_SIZE,
        MAX_FRAMES,
        decode_frames,
    )

    media = spark.createDataFrame(
        [(1, "video/fake", bytes(range(1, 250)) * 2), (2, "image/fake", b"ab")],
        "doc_id long, media_type string, payload binary",
    )
    rows = decode_frames(media, use_codec=False).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    d1 = sorted(r.frame_no for r in rows if r.doc_id == 1)
    want = min(MAX_FRAMES, (498 + FRAME_SIZE - 1) // FRAME_SIZE)
    assert d1 == list(range(want))
    assert all(r.width is not None and r.height is not None for r in rows)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed in this container")
def test_real_pil_mjpeg_decode(spark):
    """Wherever Pillow exists: real JPEGs inside an MJPEG MP4 decode to
    their true pixel dimensions through the Spark operator."""
    import io

    from PIL import Image

    from data_pipeline_project_spark.operators.multimodal import decode_frames

    def jpeg(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="JPEG")
        return buf.getvalue()

    samples = [jpeg(64, 48, "red"), jpeg(32, 32, "green"), jpeg(120, 80, "blue")]
    mjpeg = _make_mp4_with_samples(samples, chunks=[3], sync=[1, 3],
                                   codec=b"jpeg")
    media = spark.createDataFrame(
        [(1, "video/mp4", mjpeg)],
        "doc_id long, media_type string, payload binary",
    )
    got = {(r.frame_no, r.width, r.height)
           for r in decode_frames(media, use_codec=True).collect()}
    assert got == {(0, 64, 48), (2, 120, 80)}
