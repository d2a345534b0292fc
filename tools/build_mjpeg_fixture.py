#!/usr/bin/env python3
"""Independent builder for the checked-in MJPEG-in-AVI fixture
(src/test/resources/fixtures/clip_mjpeg_16x8.avi).

Each frame is a hand-encoded BASELINE JPEG of a UNIFORM grayscale
value gray(f) = 32 + 21*f — DC-only blocks with Q(DC) = 8, so any
compliant JPEG decoder reproduces the exact flat value:
  quantDC = (V - 128)  (exact: 8*(V-128)/Q00 with Q00 = 8)
  decoded = quantDC * 8 / 8 + 128 = V  (no AC terms, no chroma)
Grayscale single-component JPEG: no chroma subsampling or YCbCr
rounding anywhere. The Scala twin (graft.multimodal.AviFixtures
.mjpegClip) must reproduce these bytes exactly (spec-checked).

Dev-only tool; the shipped library never depends on Python.
"""
import struct

W, H, FRAMES = 16, 8, 10


def gray(f):
    return 32 + 21 * f


# standard luminance DC Huffman table (JPEG Annex K.3.1)
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))
# standard luminance AC Huffman table (JPEG Annex K.3.2)
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def huff_codes(counts, symbols):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


DC = huff_codes(DC_COUNTS, DC_SYMBOLS)
AC = huff_codes(AC_COUNTS, AC_SYMBOLS)


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, ln):
        self.acc = (self.acc << ln) | (code & ((1 << ln) - 1))
        self.nbits += ln
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


def jpeg_gray_uniform(w, h, v):
    assert w % 8 == 0 and h % 8 == 0
    seg = bytearray()
    seg += b"\xFF\xD8"                                   # SOI
    seg += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
    seg += bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    seg += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([0x00]) + bytes([8] * 64)
    seg += b"\xFF\xC0" + struct.pack(">H", 11) + bytes([8])
    seg += struct.pack(">HH", h, w) + bytes([1, 0x01, 0x11, 0x00])
    seg += (b"\xFF\xC4" + struct.pack(">H", 2 + 1 + 16 + len(DC_SYMBOLS))
            + bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMBOLS))
    seg += (b"\xFF\xC4" + struct.pack(">H", 2 + 1 + 16 + len(AC_SYMBOLS))
            + bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMBOLS))
    seg += (b"\xFF\xDA" + struct.pack(">H", 8) + bytes([1, 0x01, 0x00])
            + bytes([0, 63, 0]))
    bw = BitWriter()
    d = v - 128  # first block's DC difference; later diffs are 0
    for blk in range((w // 8) * (h // 8)):
        diff = d if blk == 0 else 0
        s = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        code, ln = DC[s]
        bw.put(code, ln)
        if s:
            bits = diff if diff > 0 else diff + (1 << s) - 1
            bw.put(bits, s)
        eob, eln = AC[0x00]
        bw.put(eob, eln)
    seg += bw.flush()
    seg += b"\xFF\xD9"                                   # EOI
    return bytes(seg)


def mjpeg_avi(w, h, frames):
    jpegs = [jpeg_gray_uniform(w, h, gray(f)) for f in range(frames)]
    padded = [j + (b"\x00" if len(j) % 2 else b"") for j in jpegs]
    movi = 4 + sum(8 + len(p) for p in padded)
    strl = 8 + 56 + 8 + 40
    hdrl = 4 + 8 + 56 + 8 + 4 + strl
    out = bytearray()

    def cc(s):
        out.extend(s.encode("ascii"))

    def u32(v):
        out.extend(struct.pack("<I", v & 0xFFFFFFFF))

    def u16(v):
        out.extend(struct.pack("<H", v & 0xFFFF))

    maxlen = max(len(j) for j in jpegs)
    cc("RIFF"); u32(4 + 8 + hdrl + 8 + movi); cc("AVI ")
    cc("LIST"); u32(hdrl); cc("hdrl")
    cc("avih"); u32(56)
    u32(100000); u32(maxlen * 10); u32(0); u32(0)
    u32(frames); u32(0); u32(1); u32(maxlen)
    u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(4 + strl); cc("strl")
    cc("strh"); u32(56)
    cc("vids"); cc("MJPG")
    u32(0); u32(0); u32(0)
    u32(1); u32(10)
    u32(0); u32(frames); u32(maxlen); u32(0xFFFFFFFF); u32(0)
    u16(0); u16(0); u16(w); u16(h)
    cc("strf"); u32(40)
    u32(40); u32(w); u32(h)
    u16(1); u16(24)
    out.extend(b"MJPG")               # biCompression fourcc
    u32(maxlen); u32(0); u32(0); u32(0); u32(0)
    cc("LIST"); u32(movi); cc("movi")
    for j, p in zip(jpegs, padded):
        cc("00dc"); u32(len(j))
        out.extend(p)
    return bytes(out)


if __name__ == "__main__":
    import hashlib
    avi = mjpeg_avi(W, H, FRAMES)
    path = "src/test/resources/fixtures/clip_mjpeg_16x8.avi"
    with open(path, "wb") as fh:
        fh.write(avi)
    print(f"wrote {path}: {len(avi)} bytes md5={hashlib.md5(avi).hexdigest()}")
    print("thumb_md5 (first 32 bytes):",
          hashlib.md5(avi[:32]).hexdigest())
    for f in (0, 9):
        ppm = (f"P6\n{W} {H}\n255\n".encode("ascii")
               + bytes([gray(f)] * (W * H * 3)))
        print(f"frame{f} PPM md5:", hashlib.md5(ppm).hexdigest())
