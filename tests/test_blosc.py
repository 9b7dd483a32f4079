"""Vendored blosc/LZ4 codec tests (data/_blosc.py, data/_lz4.py).

The production anemoi-datasets stores are blosc-lz4 zarr v2 chunks (ref
training/src/anemoi/training/data/data_reader.py:86); these tests pin the
vendored decoder to hand-constructed byte-exact frames per the c-blosc 1.x
chunk format and the LZ4 block spec, then round-trip through the encoder
and the zarr layer.
"""

import struct

import numpy as np
import pytest

from anemoi_tpu.data import _blosc, _lz4


# --- LZ4 block format ------------------------------------------------------


def test_lz4_handcrafted_literals_only():
    # token 0x50: 5 literals, no match (final sequence)
    src = bytes([0x50]) + b"hello"
    assert _lz4._decompress_py(src, 5) == b"hello"


def test_lz4_handcrafted_match():
    # "abcdabcdabcdX...": 4 literals "abcd", match offset 4 len 8 (token low
    # nibble 4 => 4+4=8), then final literals "XYZWV"
    stream = bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x50]) + b"XYZWV"
    assert _lz4._decompress_py(stream, 17) == b"abcdabcdabcdXYZWV"


def test_lz4_handcrafted_overlap_rle():
    # 1 literal "a", match offset 1 len 15+4=19 -> "a"*20, final 5 literals
    stream = (
        bytes([0x1F]) + b"a" + struct.pack("<H", 1) + bytes([0x00])
        + bytes([0x50]) + b"bcdef"
    )
    assert _lz4._decompress_py(stream, 25) == b"a" * 20 + b"bcdef"


def test_lz4_extended_lengths():
    # literal length 15+255+3 = 273 via extension bytes
    lits = bytes(range(256)) * 2
    lits = lits[:273]
    stream = bytes([0xF0, 255, 3]) + lits
    assert _lz4._decompress_py(stream, 300) == lits


@pytest.mark.parametrize("pattern", ["random", "repetitive", "text", "short", "empty"])
def test_lz4_roundtrip(pattern, rng):
    data = {
        "random": rng.integers(0, 256, 10000, dtype=np.uint8).tobytes(),
        "repetitive": (b"0123456789abcdef" * 700)[:10000],
        "text": b"the quick brown fox jumps over the lazy dog " * 200,
        "short": b"tiny",
        "empty": b"",
    }[pattern]
    comp = _lz4.compress(data)
    assert _lz4._decompress_py(comp, len(data)) == data
    # native decoder (if a compiler is available) must agree byte-for-byte
    if _lz4._load_native() is not None:
        assert _lz4.decompress(comp, len(data)) == data


def test_lz4_python_and_native_reject_malformed():
    bad = bytes([0x44]) + b"abcd" + struct.pack("<H", 9)  # offset beyond output
    with pytest.raises(ValueError):
        _lz4._decompress_py(bad + bytes([0x50]) + b"XYZWV", 17)
    if _lz4._load_native() is not None:
        with pytest.raises(ValueError):
            _lz4.decompress(bad + bytes([0x50]) + b"XYZWV", 17)


# --- blosc chunk format ----------------------------------------------------


def _header(flags, typesize, nbytes, blocksize, cbytes):
    return struct.pack("<BBBBIII", 2, 1, flags, typesize, nbytes, blocksize, cbytes)


def test_blosc_handcrafted_memcpy_chunk():
    payload = bytes(range(32))
    chunk = _header(_blosc.MEMCPYED, 4, 32, 32, 48) + payload
    assert _blosc.decompress(chunk) == payload


def test_blosc_handcrafted_single_stream_chunk():
    """One block, dont-split, no shuffle, lz4 codec — built byte-by-byte."""
    payload = b"abcdabcdabcdXYZWV"  # 17 bytes
    lz4_stream = (
        bytes([0x44]) + b"abcd" + struct.pack("<H", 4) + bytes([0x50]) + b"XYZWV"
    )
    body = struct.pack("<i", len(lz4_stream)) + lz4_stream
    flags = (_blosc._CODEC_LZ4 << 5) | _blosc.DONT_SPLIT
    chunk = (
        _header(flags, 1, 17, 17, 16 + 4 + len(body))
        + struct.pack("<i", 20)  # bstarts[0]: first block starts after header
        + body
    )
    assert _blosc.decompress(chunk) == payload


def test_blosc_handcrafted_shuffled_split_chunk():
    """Byte-shuffled float32 block split into 4 byte-plane streams, each
    stored raw (csize == neblock) — the split layout real blosc-lz4 writes."""
    arr = np.arange(8, dtype=np.float32)
    raw = arr.tobytes()  # 32 bytes, typesize 4, one 32-byte block
    shuffled = np.frombuffer(raw, np.uint8).reshape(8, 4).T.tobytes()
    body = b""
    for plane in range(4):
        body += struct.pack("<i", 8) + shuffled[plane * 8 : (plane + 1) * 8]
    flags = (_blosc._CODEC_LZ4 << 5) | _blosc.DOSHUFFLE  # split: flag clear
    chunk = _header(flags, 4, 32, 32, 16 + 4 + len(body)) + struct.pack("<i", 20) + body
    out = _blosc.decompress(chunk)
    np.testing.assert_array_equal(np.frombuffer(out, np.float32), arr)


@pytest.mark.parametrize("cname", ["lz4", "zlib"])
@pytest.mark.parametrize("shuffle", [0, 1])
@pytest.mark.parametrize("split", [False, True, None])
def test_blosc_roundtrip(cname, shuffle, split, rng):
    arr = rng.normal(size=4003).astype(np.float32)  # odd size: leftover block
    raw = arr.tobytes()
    chunk = _blosc.compress(raw, typesize=4, cname=cname, shuffle=shuffle,
                            blocksize=1024, split=split)
    assert _blosc.decompress(chunk) == raw


def test_blosc_roundtrip_multiblock_f64(rng):
    arr = rng.normal(size=40000)  # float64, several 64 KiB blocks
    raw = arr.tobytes()
    chunk = _blosc.compress(raw, typesize=8)
    assert len(chunk) < len(raw)  # shuffle+lz4 actually compresses doubles
    assert _blosc.decompress(chunk) == raw


def test_blosc_incompressible_falls_back_to_memcpy(rng):
    raw = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    chunk = _blosc.compress(raw, typesize=1)
    assert chunk[2] & _blosc.MEMCPYED
    assert _blosc.decompress(chunk) == raw


def test_blosc_empty_and_errors():
    assert _blosc.decompress(_blosc.compress(b"", typesize=4)) == b""
    with pytest.raises(ValueError, match="truncated"):
        _blosc.decompress(b"\x02\x01\x00\x04")
    # unsupported codec named in the error
    chunk = bytearray(_blosc.compress(b"abcd" * 100, typesize=4))
    chunk[2] = (chunk[2] & 0x1F) | (_blosc._CODEC_ZSTD << 5)
    with pytest.raises(ValueError, match="zstd"):
        _blosc.decompress(bytes(chunk))
    with pytest.raises(ValueError, match="bit-shuffle"):
        _blosc.decompress(_header(_blosc.DOBITSHUFFLE, 4, 16, 16, 16) + b"x" * 16)


def test_zarr_blosc_store_roundtrip(tmp_path, rng):
    """End-to-end: a blosc-lz4 zarr v2 array (the anemoi-datasets on-disk
    default) written and read through the zarr layer."""
    from anemoi_tpu.data.zarr_reader import ZarrV2Array, write_zarr_array

    a = rng.normal(size=(7, 13)).astype(np.float32)
    path = str(tmp_path / "a")
    write_zarr_array(path, a, chunks=(3, 5),
                     compressor={"id": "blosc", "cname": "lz4", "clevel": 5,
                                 "shuffle": 1, "blocksize": 0})
    z = ZarrV2Array(path)
    np.testing.assert_array_equal(z[:, :], a)
    np.testing.assert_array_equal(z[2:6, 4:11], a[2:6, 4:11])
