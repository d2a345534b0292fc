#!/usr/bin/env python3
"""Independent twin of the IMA ADPCM WAV fixtures
(graft.multimodal.WavFixtures.adpcmMonoClip / adpcmStereoClip).

Implements the pinned waveforms, the pinned encoder spec, the standard
IMA decoder, and the m05 feature bundle from scratch — no shared code
with the Scala side — then prints:
  - md5 of each fixture's bytes (spec-pinned against the Scala twin);
  - the decoded-feature golden rows for the m05 oracle SQL.

Pinned encoder spec (what both builders implement):
  - block header per channel: first input sample verbatim (int16 LE),
    carried step index (uint8), reserved 0;
  - later samples quantized by the standard IMA quantizer against the
    running predictor, which is updated with the DECODER's rule so
    encoder and decoder state never diverge;
  - nibbles low-first in 4-byte groups, round-robin across channels;
  - fmt(0x11, bits=4, cbSize=2, samplesPerBlock) + fact + data.

Dev-only tool; the shipped library never depends on Python.
"""
import hashlib
import struct

STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767]
INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def clamp16(x):
    return max(-32768, min(32767, x))


def decode_step(delta, pred, idx):
    step = STEP[idx]
    diff = step >> 3
    if delta & 4:
        diff += step
    if delta & 2:
        diff += step >> 1
    if delta & 1:
        diff += step >> 2
    pred = clamp16(pred - diff if (delta & 8) else pred + diff)
    idx = max(0, min(88, idx + INDEX[delta & 7]))
    return pred, idx


def encode_delta(sample, pred, idx):
    step = STEP[idx]
    diff = sample - pred
    delta = 0
    if diff < 0:
        delta = 8
        diff = -diff
    if diff >= step:
        delta |= 4
        diff -= step
    if diff >= step >> 1:
        delta |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        delta |= 1
    return delta


def adpcm_wav(channels, rate, block_align, n_blocks, sample):
    spb = (block_align - 4 * channels) * 2 // channels + 1
    frames = n_blocks * spb
    data = bytearray()
    pred = [0] * channels
    idx = [0] * channels
    for blk in range(n_blocks):
        for c in range(channels):
            pred[c] = sample(blk * spb, c)
            data += struct.pack("<hBB", pred[c], idx[c], 0)
        groups = (block_align - 4 * channels) // (4 * channels)
        for g in range(groups):
            for c in range(channels):
                for k in range(4):
                    byte = 0
                    for nib in range(2):
                        f = blk * spb + 1 + g * 8 + k * 2 + nib
                        delta = encode_delta(sample(f, c), pred[c], idx[c])
                        pred[c], idx[c] = decode_step(delta, pred[c], idx[c])
                        byte |= (delta & 0xF) << (4 * nib)
                    data += bytes([byte])
    hdr = b"RIFF" + struct.pack("<I", 4 + 28 + 12 + 8 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHHHH", 20, 0x11, channels, rate,
                                 rate * block_align // spb, block_align,
                                 4, 2, spb)
    hdr += b"fact" + struct.pack("<II", 4, frames)
    hdr += b"data" + struct.pack("<I", len(data))
    return bytes(hdr) + bytes(data)


def decode_wav(b):
    """Standalone decoder: block headers emit their sample directly,
    nibbles run the reference update — returns (channels, rate,
    interleaved samples)."""
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    i = 12
    fmt = None
    fact = None
    data = None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        ln = struct.unpack("<I", b[i + 4:i + 8])[0]
        body = b[i + 8:i + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHHHH", body[:20])
        elif cid == b"fact":
            fact = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            data = body
        i += 8 + ln + (ln & 1)
    tag, ch, rate, _, ba, bits, _, spb = fmt
    assert tag == 0x11 and bits == 4
    n_blocks = len(data) // ba
    frames = fact if fact is not None else n_blocks * spb
    out = [[0] * frames for _ in range(ch)]
    for blk in range(n_blocks):
        base = blk * ba
        pred = [0] * ch
        idx = [0] * ch
        for c in range(ch):
            p, ix, _ = struct.unpack("<hBB", data[base + 4 * c:base + 4 * c + 4])
            pred[c], idx[c] = p, ix
            if blk * spb < frames:
                out[c][blk * spb] = p
        groups = (ba - 4 * ch) // (4 * ch)
        for g in range(groups):
            for c in range(ch):
                off = base + 4 * ch + g * 4 * ch + 4 * c
                for k in range(4):
                    byte = data[off + k]
                    for nib in range(2):
                        delta = (byte & 0xF) if nib == 0 else (byte >> 4)
                        pred[c], idx[c] = decode_step(delta, pred[c], idx[c])
                        f = blk * spb + 1 + g * 8 + k * 2 + nib
                        if f < frames:
                            out[c][f] = pred[c]
    inter = []
    for f in range(frames):
        for c in range(ch):
            inter.append(out[c][f])
    return ch, rate, inter


def features(ch, rate, samples, windows=4):
    n_frames = len(samples) // ch
    energy = sum(x * x for x in samples)
    peak = max(abs(x) for x in samples)
    zc = 0
    for c in range(ch):
        for f in range(1, n_frames):
            if (samples[(f - 1) * ch + c] < 0) != (samples[f * ch + c] < 0):
                zc += 1
    we = []
    for w in range(windows):
        f0 = w * n_frames // windows
        f1 = (w + 1) * n_frames // windows
        we.append(sum(samples[f * ch + c] ** 2
                      for f in range(f0, f1) for c in range(ch)))
    return dict(channels=ch, rate=rate, n_frames=n_frames, energy=energy,
                zero_crossings=zc, peak=peak, windows=we)


def main():
    mono = adpcm_wav(1, 8000, 256, 4,
                     lambda f, c: (f * 13) % 2401 - 1200)
    stereo = adpcm_wav(2, 16000, 256, 4,
                       lambda f, c: ((f * 11) % 1801 - 900) if c == 0
                       else ((f * 17) % 1501 - 750))
    for name, clip in [("mono", mono), ("stereo", stereo)]:
        print(f"{name}: {len(clip)} bytes md5={hashlib.md5(clip).hexdigest()}")
        print("  features:", features(*decode_wav(clip)))


if __name__ == "__main__":
    main()
