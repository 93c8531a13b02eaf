#!/usr/bin/env python3
"""Dev tooling: generate REAL lossy WebP (VP8 keyframe) test vectors with
the system libwebp, plus golden decodes from the same library. The
committed fixtures validate graft's pure-JVM VP8 decoder against the
reference C implementation — true interop, not a decoder agreeing with
its own encoder.

Outputs under src/test/resources/graft/vp8/:
  <name>.webp — libwebp lossy encoding (WebPEncodeRGBA simple API:
                4 segments, normal loop filter, 1 token partition)
  <name>.yuv  — libwebp's WebPDecodeYUV of that exact file: 4B BE width,
                4B BE height, then the Y plane row-major (w×h), then the
                U and V planes (⌈w/2⌉×⌈h/2⌉ each). This is the RFC 6386
                bitstream-defined output — decoder-to-decoder identical
                with no colorspace conversion in the comparison.
  <name>.golden — libwebp's WebPDecodeRGBA (4B BE w, 4B BE h, RGBA):
                pins the fancy-upsampling + fixed-point YUV→RGB chain.

Content is chosen to push the encoder through the keyframe feature set:
flat DC-only macroblocks, smooth gradients (16x16 V/H/TM prediction),
noise (dense AC coefficients, B_PRED), stripes (directional 4x4 modes),
photo-like fields, a heterogeneous composite (segment quantizer
deltas), quality extremes (q10 coarse / q95 dense), and odd sizes
(partial edge macroblocks, 1x1 degenerate)."""
import ctypes, os, random, struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "vp8")
os.makedirs(OUT, exist_ok=True)


def encode_lossy(rgba: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "lossy encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def decode_rgba(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "RGBA decode failed"
    rgba = ctypes.string_at(p, w.value * h.value * 4)
    lib.WebPFree(p)
    return w.value, h.value, rgba


def decode_yuv(data: bytes):
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "YUV decode failed"
    W, H = w.value, h.value
    uw, uh = (W + 1) // 2, (H + 1) // 2
    yb = bytearray()
    for r in range(H):
        yb += ctypes.string_at(ctypes.addressof(y.contents)
                               + r * stride.value, W)
    ub, vb = bytearray(), bytearray()
    for r in range(uh):
        ub += ctypes.string_at(ctypes.addressof(u.contents)
                               + r * uv_stride.value, uw)
        vb += ctypes.string_at(ctypes.addressof(v.contents)
                               + r * uv_stride.value, uw)
    lib.WebPFree(y)
    return W, H, bytes(yb), bytes(ub), bytes(vb)


def emit(name, rgba, w, h, q):
    webp = encode_lossy(bytes(rgba), w, h, q)
    dw, dh, got = decode_rgba(webp)
    assert (dw, dh) == (w, h)
    yw, yh, yy, uu, vv = decode_yuv(webp)
    assert (yw, yh) == (w, h)
    open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
    open(os.path.join(OUT, name + ".golden"), "wb").write(
        struct.pack(">II", w, h) + got)
    open(os.path.join(OUT, name + ".yuv"), "wb").write(
        struct.pack(">II", w, h) + yy + uu + vv)
    print(f"  {name}: {w}x{h} q={q} -> {len(webp)} bytes")


def px(buf, w, x, y, r, g, b, a=255):
    i = (y * w + x) * 4
    buf[i:i + 4] = bytes((r & 255, g & 255, b & 255, a & 255))


def gradient(w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, x * 255 // max(1, w - 1),
               y * 255 // max(1, h - 1), (x + y) * 127 // (w + h))
    return buf


def noise(w, h, rng):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            px(buf, w, x, y, rng.randrange(256), rng.randrange(256),
               rng.randrange(256))
    return buf


def stripes(w, h):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            c = [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                 (255, 255, 0)][(x // 5) % 4]
            px(buf, w, x, y, *c)
    return buf


def photo(w, h, rng):
    import math
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            r = int(127 + 90 * math.sin(x / 11.0) * math.cos(y / 7.0))
            g = int(127 + 80 * math.sin((x + y) / 13.0))
            b = int(127 + 70 * math.cos(x / 5.0 + y / 17.0))
            n = rng.randrange(-6, 7)
            px(buf, w, x, y, max(0, min(255, r + n)),
               max(0, min(255, g + n)), max(0, min(255, b + n)))
    return buf


def composite(w, h, rng):
    buf = bytearray(w * h * 4)
    for y in range(h):
        for x in range(w):
            q = x * 4 // w
            if q == 0:
                c = (90, 130, 200)
            elif q == 1:
                c = ((x % 64) * 4, y * 2, (x + y) % 256)
            elif q == 2:
                c = (rng.randrange(256), rng.randrange(256),
                     rng.randrange(256))
            else:
                c = [(20, 20, 20), (230, 230, 230)][(y // 4) % 2]
            px(buf, w, x, y, *c)
    return buf


def main():
    rng = random.Random(20260814)
    emit("flat_16x16", bytearray((64, 128, 192, 255)) * 256, 16, 16, 75)
    emit("onecolor_1x1", bytearray((42, 99, 180, 255)), 1, 1, 75)
    emit("grad_64x48_q75", gradient(64, 48), 64, 48, 75)
    emit("grad_64x48_q10", gradient(64, 48), 64, 48, 10)
    emit("grad_64x48_q95", gradient(64, 48), 64, 48, 95)
    emit("noise_33x17_q50", noise(33, 17, rng), 33, 17, 50)
    emit("edge_17x13_q75", gradient(17, 13), 17, 13, 75)
    emit("stripes_80x60_q75", stripes(80, 60), 80, 60, 75)
    emit("photo_120x80_q75", photo(120, 80, rng), 120, 80, 75)
    emit("photo_120x80_q25", photo(120, 80, rng), 120, 80, 25)
    emit("composite_256x96_q50", composite(256, 96, rng), 256, 96, 50)
    # q=0 pushes the uv_dc quantizer index past 117, the spec's chroma-DC
    # clamp point (the clamp applies to the INDEX, not the dequant value)
    emit("photo_48x32_q0", photo(48, 32, rng), 48, 32, 0)


if __name__ == "__main__":
    main()
