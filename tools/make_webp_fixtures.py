#!/usr/bin/env python3
"""Dev tooling: generate REAL WebP lossless (VP8L) test vectors with the
system libwebp (via ctypes), plus golden RGBA decodes from the same
library. The committed fixtures validate graft's pure-JVM VP8L decoder
against the reference C implementation — true interop, not a decoder
agreeing with its own encoder.

Outputs under src/test/resources/graft/webp/:
  <name>.webp    — libwebp lossless encoding of a deterministic image
  <name>.golden  — 4B BE width, 4B BE height, then RGBA bytes (libwebp's
                   own WebPDecodeRGBA of that exact file)
  lossy_gradient.webp — ONE lossy (VP8) file, no golden: pins the
                   "lossy routes to the error channel" contract.

Content is chosen to push the encoder through every VP8L feature:
palettes of every pixel-bundling width (2/4/16/256 colors), smooth
gradients (predictor + cross-color transforms), noise (literal-heavy),
repeating stripes (LZ77 backrefs + color cache), a multi-region
composite big enough to trigger meta-Huffman entropy images, full and
partial alpha, and 1x1 / odd-size degenerates (single-symbol codes).
"""
import ctypes, os, random, struct, sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "webp")
os.makedirs(OUT, exist_ok=True)


def encode_lossless(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "lossless encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_lossy(rgba: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "lossy encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "decode failed"
    rgba = ctypes.string_at(p, w.value * h.value * 4)
    lib.WebPFree(p)
    return w.value, h.value, rgba


def emit(name, rgba, w, h, roundtrip=True):
    webp = encode_lossless(bytes(rgba), w, h)
    dw, dh, got = decode(webp)
    assert (dw, dh) == (w, h)
    # libwebp's default lossless config rewrites RGB under alpha=0 pixels
    # (exact=0), so fixtures with fully-transparent pixels skip this sanity
    # check — the .golden (libwebp's own decode of the file) stays the
    # authority either way.
    assert (not roundtrip) or got == bytes(rgba), \
        f"{name}: libwebp roundtrip not lossless?!"
    open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
    open(os.path.join(OUT, name + ".golden"), "wb").write(
        struct.pack(">II", w, h) + got)
    print(f"  {name}: {w}x{h} -> {len(webp)} bytes webp")


def px(buf, w, x, y, r, g, b, a=255):
    i = (y * w + x) * 4
    buf[i:i + 4] = bytes((r & 255, g & 255, b & 255, a & 255))


def gradient(w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, x * 255 // max(1, w - 1),
               y * 255 // max(1, h - 1), (x + y) * 127 // (w + h), 255)
    return buf


def main():
    rng = random.Random(20260814)

    emit("gradient_64x48", gradient(64, 48), 64, 48)

    w, h = 33, 17
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, rng.randrange(256), rng.randrange(256),
               rng.randrange(256), 255)
    emit("noise_33x17", buf, w, h)

    pal2 = [(0, 0, 0, 255), (255, 255, 255, 255)]
    w, h = 31, 9
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, *pal2[(x // 3 + y) % 2])
    emit("palette2_31x9", buf, w, h)

    pal4 = [(10, 20, 30, 255), (200, 40, 0, 255),
            (0, 180, 90, 255), (250, 250, 10, 255)]
    w, h = 40, 40
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, *pal4[(x * x + 3 * y) % 4])
    emit("palette4_40x40", buf, w, h)

    pal13 = [((i * 37) % 256, (i * 91) % 256, (i * 151) % 256, 255)
             for i in range(13)]
    w, h = 25, 25
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, *pal13[(x + y * 2) % 13])
    emit("palette13_25x25", buf, w, h)

    pal200 = [((i * 7) % 256, (i * 13) % 256, (i * 29) % 256, 255)
              for i in range(200)]
    w, h = 50, 20
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, *pal200[(x * 3 + y * 11) % 200])
    emit("palette200_50x20", buf, w, h)

    w, h = 48, 48
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, x * 5, 128, y * 5, 1 + (x * y) % 255)
    emit("alpha_gradient_48x48", buf, w, h)

    # fully-transparent pixels present: exercises the encoder's
    # alpha-cleanup path; golden-only (no roundtrip assert)
    w, h = 20, 20
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, x * 12, y * 12, 60, 0 if (x + y) % 3 == 0 else 255)
    emit("alpha_holes_20x20", buf, w, h, roundtrip=False)

    # repeating stripes: strong LZ77 structure, many backrefs
    w, h = 80, 60
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            c = [(255, 0, 0, 255), (0, 255, 0, 255), (0, 0, 255, 255),
                 (255, 255, 0, 200)][(x // 5) % 4]
            px(buf, w, x, y, *c)
    emit("stripes_80x60", buf, w, h)

    # big heterogeneous composite: flat | gradient | noise | stripes
    # quadrants -> encoder picks spatially-varying entropy groups
    w, h = 256, 96
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            q = x // 64
            if q == 0:
                c = (90, 130, 200, 255)
            elif q == 1:
                c = (x % 64 * 4, y * 2, (x + y) % 256, 255)
            elif q == 2:
                c = (rng.randrange(256), rng.randrange(256),
                     rng.randrange(256), 255)
            else:
                c = [(20, 20, 20, 255), (230, 230, 230, 255)][(y // 4) % 2]
            px(buf, w, x, y, *c)
    emit("composite_256x96", buf, w, h)

    emit("onecolor_1x1", bytearray((42, 99, 180, 255)), 1, 1)

    w, h = 7, 3
    emit("onecolor_7x3", bytearray((7, 77, 177, 255)) * (w * h), w, h)

    # photo-like: smooth 2D field + mild noise (predictor + cross-color)
    w, h = 120, 80
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            base = (x * x // 40 + y * y // 30 + x * y // 50)
            px(buf, w, x, y, (base + rng.randrange(8)) % 256,
               (base // 2 + rng.randrange(8)) % 256,
               (255 - base + rng.randrange(8)) % 256, 255)
    emit("photo_120x80", buf, w, h)

    # one lossy file (VP8 chunk) — no golden; pins the error-channel
    # contract for the lossy half of the format
    lossy = encode_lossy(bytes(gradient(64, 48)), 64, 48, 75.0)
    open(os.path.join(OUT, "lossy_gradient.webp"), "wb").write(lossy)
    print(f"  lossy_gradient: {len(lossy)} bytes (chunk "
          f"{lossy[12:16].decode('ascii', 'replace')})")

    total = sum(os.path.getsize(os.path.join(OUT, f)) for f in os.listdir(OUT))
    print(f"total fixture bytes: {total}")


if __name__ == "__main__":
    main()
