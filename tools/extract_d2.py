"""Extract the reference's vendored detectron2.7z with stdlib only (no 7z
tool in this environment — SURVEY.md §0.2 documents the approach).

The archive is a single solid LZMA1 stream: parse the 32-byte signature
header, LZMA1-decompress the encoded header, walk kHeader → MainStreamsInfo
(pack pos/sizes, one folder, SubStreamsInfo sizes) and kFilesInfo
(kEmptyStream bitmask 0x0E, UTF-16-LE names 0x11), decompress the one
stream and split it by substream sizes in name order.

Usage: python tools/extract_d2.py [outdir=/tmp/d2]  → writes the .py tree.
READ-ONLY use of /root/reference; output goes to /tmp.
"""

import lzma
import os
import struct
import sys

ARCHIVE = "/root/reference/detectron2.7z"


class Reader:
    def __init__(self, data):
        self.d = data
        self.i = 0

    def byte(self):
        b = self.d[self.i]
        self.i += 1
        return b

    def bytes(self, n):
        b = self.d[self.i : self.i + n]
        self.i += n
        return b

    def num(self):
        """7z variable-length uint64."""
        first = self.byte()
        mask = 0x80
        value = 0
        for i in range(8):
            if not (first & mask):
                value |= (first & (mask - 1)) << (8 * i)
                return value
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n):
        bits = []
        for i in range(n):
            if i % 8 == 0:
                b = self.byte()
            bits.append(bool(b & (0x80 >> (i % 8))))
        return bits

    def bitvector_alldefined(self, n):
        return self.bitvector(n) if not self.byte() else [True] * n


def raw_decompress(coder_id, props, packed, out_size):
    filt = {b"\x03\x01\x01": lzma.FILTER_LZMA1, b"\x21": lzma.FILTER_LZMA2}[
        bytes(coder_id)
    ]
    dec = lzma.LZMADecompressor(
        lzma.FORMAT_RAW,
        filters=[lzma._decode_filter_properties(filt, props)],
    )
    return dec.decompress(packed, max_length=out_size)


def parse_streams_info(r):
    """Returns (pack_pos, pack_sizes, coder_id, coder_props, unpack_size,
    substream_sizes)."""
    pack_pos = pack_sizes = None
    coder_id = props = unpack_size = None
    sub_sizes = None
    while True:
        pid = r.num()
        if pid == 0x00:  # kEnd
            break
        if pid == 0x06:  # kPackInfo
            pack_pos = r.num()
            n = r.num()
            assert r.num() == 0x09  # kSize
            pack_sizes = [r.num() for _ in range(n)]
            assert r.num() == 0x00
        elif pid == 0x07:  # kUnPackInfo
            assert r.num() == 0x0B  # kFolder
            nfolders = r.num()
            assert nfolders == 1, "expected one solid folder"
            assert r.byte() == 0  # external=0
            ncoders = r.num()
            assert ncoders == 1
            flags = r.byte()
            id_size = flags & 0x0F
            coder_id = r.bytes(id_size)
            assert coder_id in (b"\x03\x01\x01", b"\x21"), coder_id.hex()
            if flags & 0x20:
                props = r.bytes(r.num())
            assert r.num() == 0x0C  # kCodersUnPackSize
            unpack_size = r.num()
            nid = r.num()
            if nid == 0x0A:  # kCRC (optional)
                defined = r.bitvector_alldefined(1)
                for d in defined:
                    if d:
                        r.bytes(4)
                nid = r.num()
            assert nid == 0x00
        elif pid == 0x08:  # kSubStreamsInfo
            nstreams = 1
            nid = r.num()
            if nid == 0x0D:  # kNumUnPackStream
                nstreams = r.num()
                nid = r.num()
            sub_sizes = []
            if nid == 0x09:  # kSize: first n-1 sizes; last = remainder
                tot = 0
                for _ in range(nstreams - 1):
                    s = r.num()
                    sub_sizes.append(s)
                    tot += s
                sub_sizes.append(unpack_size - tot)
                nid = r.num()
            if nid == 0x0A:  # kCRC
                ndig = sum(1 for _ in range(nstreams))
                defined = r.bitvector_alldefined(ndig)
                for d in defined:
                    if d:
                        r.bytes(4)
                nid = r.num()
            assert nid == 0x00
        else:
            raise AssertionError(f"unexpected id {pid:#x}")
    return pack_pos, pack_sizes, coder_id, props, unpack_size, sub_sizes


def parse_files_info(r):
    nfiles = r.num()
    names, empty = None, [False] * nfiles
    while True:
        pid = r.num()
        if pid == 0x00:
            break
        size = r.num()
        end = r.i + size
        if pid == 0x0E:  # kEmptyStream
            empty = r.bitvector(nfiles)
        elif pid == 0x11:  # kNames
            assert r.byte() == 0  # external=0
            raw = r.bytes(size - 1)
            names = raw.decode("utf-16-le").split("\x00")[:-1]
        r.i = end
    assert names is not None and len(names) == nfiles
    return names, empty


def extract(outdir):
    with open(ARCHIVE, "rb") as f:
        data = f.read()
    assert data[:6] == b"7z\xbc\xaf\x27\x1c"
    nh_off, nh_size, _nh_crc = struct.unpack("<QQI", data[12:32])
    hdr = data[32 + nh_off : 32 + nh_off + nh_size]
    r = Reader(hdr)
    pid = r.num()
    if pid == 0x17:  # kEncodedHeader
        pp, ps, cid, props, usz, _ = parse_streams_info(r)
        packed = data[32 + pp : 32 + pp + sum(ps)]
        hdr = raw_decompress(cid, props, packed, usz)
        r = Reader(hdr)
        pid = r.num()
    assert pid == 0x01  # kHeader
    names = empty = None
    pp = ps = cid = props = usz = subs = None
    while True:
        pid = r.num()
        if pid == 0x00:
            break
        if pid == 0x04:  # kMainStreamsInfo
            pp, ps, cid, props, usz, subs = parse_streams_info(r)
        elif pid == 0x05:  # kFilesInfo
            names, empty = parse_files_info(r)
        else:
            raise AssertionError(f"unexpected top id {pid:#x}")
    packed = data[32 + pp : 32 + pp + sum(ps)]
    blob = raw_decompress(cid, props, packed, usz)
    file_names = [n for n, e in zip(names, empty) if not e]
    if subs is None:
        subs = [usz]
    assert len(subs) == len(file_names), (len(subs), len(file_names))
    off = 0
    nwritten = 0
    for name, size in zip(file_names, subs):
        dst = os.path.join(outdir, name.replace("\\", "/"))
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        with open(dst, "wb") as f:
            f.write(blob[off : off + size])
        off += size
        nwritten += 1
    print(f"{nwritten} files, {off} bytes -> {outdir}")


if __name__ == "__main__":
    extract(sys.argv[1] if len(sys.argv) > 1 else "/tmp/d2")
