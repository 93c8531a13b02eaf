#!/usr/bin/env python3
"""Dev tooling: generate WebP ALPH-chunk (lossy-with-alpha) and animation
test vectors with the system libwebp, plus golden decodes from the same
library. Committed fixtures validate graft's pure-JVM alpha decoder and
container/first-frame handling against the reference C implementation.

Outputs under src/test/resources/graft/alpha/:
  <name>.webp   — a lossy-with-alpha still (libwebp WebPEncodeRGBA: VP8X +
                  ALPH(method=1 lossless) + VP8), a hand-assembled raw-method
                  ALPH container (one per filter 0..3 — libwebp itself must
                  decode it, so the assembly is validated), a VP8X-with-
                  metadata still, or an ANIM/ANMF animation whose first frame
                  is full-canvas.
  <name>.golden — libwebp's WebPDecodeRGBA (4B BE w, 4B BE h, RGBA bytes) of
                  the still — for animations, of the first frame re-wrapped
                  as the equivalent standalone still (core libwebp has no
                  demuxer; the per-pixel decode is still C-validated, the
                  container walk is pinned by the crafted layout itself).

Raw-method filters follow libwebp src/dsp/filters.c (HorizontalFilter /
VerticalFilter / GradientFilter); chunk layouts follow the public WebP
container spec (developers.google.com/speed/webp/docs/riff_container).
"""
import ctypes, os, random, struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "graft", "alpha")
os.makedirs(OUT, exist_ok=True)


def encode_lossy(rgba: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "lossy encode failed"
    data = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return data


def encode_lossless(rgba: bytes, w: int, h: int) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w * 4, ctypes.byref(out))
    assert n > 0, "lossless encode failed"
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


# ------------------------------------------------------ RIFF assembly

def chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def riff(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def le24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def vp8x(w: int, h: int, alpha=False, anim=False, exif=False) -> bytes:
    flags = (0x10 if alpha else 0) | (0x02 if anim else 0) | (0x08 if exif else 0)
    return chunk(b"VP8X", bytes((flags, 0, 0, 0)) + le24(w - 1) + le24(h - 1))


def parse_chunks(data: bytes):
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    out, off = [], 12
    while off + 8 <= len(data):
        cc = data[off:off + 4]
        size = struct.unpack("<I", data[off + 4:off + 8])[0]
        out.append((cc, data[off + 8:off + 8 + size]))
        off += 8 + size + (size & 1)
    return out


def get_chunk(data: bytes, fourcc: bytes) -> bytes:
    for cc, payload in parse_chunks(data):
        if cc == fourcc:
            return payload
    raise KeyError(fourcc.decode())


# ------------------------------------------------------ alpha filters
# libwebp src/dsp/filters.c forward filters (what an encoder writes);
# the Scala decoder must invert them exactly.

def filter_plane(a: bytes, w: int, h: int, f: int) -> bytes:
    if f == 0:
        return a
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if f == 1:  # horizontal
                pred = (a[i - 1] if x > 0 else (a[i - w] if y > 0 else 0))
            elif f == 2:  # vertical
                pred = (a[i - w] if y > 0 else (a[i - 1] if x > 0 else 0))
            else:  # gradient
                if y == 0:
                    pred = a[i - 1] if x > 0 else 0
                elif x == 0:
                    pred = a[i - w]
                else:
                    g = a[i - 1] + a[i - w] - a[i - w - 1]
                    pred = 0 if g < 0 else (255 if g > 255 else g)
            out[i] = (a[i] - pred) & 0xFF
    return bytes(out)


# ------------------------------------------------------ content

def px(buf, w, x, y, r, g, b, a=255):
    i = (y * w + x) * 4
    buf[i:i + 4] = bytes((r & 255, g & 255, b & 255, a & 255))


def photo_rgb(w, h, rng):
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


def with_alpha(buf, w, h, alpha_fn):
    for y in range(h):
        for x in range(w):
            buf[(y * w + x) * 4 + 3] = alpha_fn(x, y) & 0xFF
    return buf


def alpha_plane(rgba: bytes, w: int, h: int) -> bytes:
    return bytes(rgba[i * 4 + 3] for i in range(w * h))


def write(name: str, webp: bytes):
    w, h, got = decode_rgba(webp)  # libwebp must accept the file
    open(os.path.join(OUT, name + ".webp"), "wb").write(webp)
    open(os.path.join(OUT, name + ".golden"), "wb").write(
        struct.pack(">II", w, h) + got)
    alph = None
    try:
        alph = get_chunk(webp, b"ALPH")[0]
    except KeyError:
        pass
    hdr = ("" if alph is None else
           f" alph[method={alph & 3} filter={(alph >> 2) & 3}"
           f" pre={(alph >> 4) & 3}]")
    print(f"  {name}: {w}x{h} {len(webp)}B{hdr}")


def write_anim(name: str, anim_bytes: bytes, first_frame_still: bytes):
    w, h, got = decode_rgba(first_frame_still)
    open(os.path.join(OUT, name + ".webp"), "wb").write(anim_bytes)
    open(os.path.join(OUT, name + ".golden"), "wb").write(
        struct.pack(">II", w, h) + got)
    print(f"  {name}: anim {w}x{h} {len(anim_bytes)}B")


def anmf(x: int, y: int, w: int, h: int, dur: int, frame_data: bytes,
         flags: int = 0) -> bytes:
    # flags bit0 = disposal, bit1 = blending method (1 = do NOT blend)
    assert x % 2 == 0 and y % 2 == 0
    hdr = le24(x // 2) + le24(y // 2) + le24(w - 1) + le24(h - 1) + le24(dur)
    return chunk(b"ANMF", hdr + bytes((flags,)) + frame_data)


def anim_hdr(loops: int = 0, bg: int = 0xFFFFFFFF) -> bytes:
    return chunk(b"ANIM", struct.pack("<I", bg) + struct.pack("<H", loops))


def main():
    rng = random.Random(20260814)

    # --- libwebp-encoded lossy+alpha stills (ALPH method=1, encoder filter)
    w, h = 64, 48
    grad = with_alpha(photo_rgb(w, h, rng), w, h,
                      lambda x, y: x * 255 // (w - 1))
    write("agrad_64x48_q75", encode_lossy(bytes(grad), w, h, 75))

    w, h = 33, 17
    mask = with_alpha(photo_rgb(w, h, rng), w, h,
                      lambda x, y: 255 if (x // 8 + y // 4) % 2 else 0)
    write("amask_33x17_q50", encode_lossy(bytes(mask), w, h, 50))

    w, h = 17, 13
    anz = with_alpha(photo_rgb(w, h, rng), w, h,
                     lambda x, y: rng.randrange(256))
    write("anoise_17x13_q75", encode_lossy(bytes(anz), w, h, 75))

    w, h = 120, 80
    rad = with_alpha(photo_rgb(w, h, rng), w, h,
                     lambda x, y: max(0, 255 - ((x - 60) ** 2 +
                                                (y - 40) ** 2) // 8))
    write("aradial_120x80_q75", encode_lossy(bytes(rad), w, h, 75))

    # --- hand-assembled raw-method ALPH, one per filter (libwebp-validated)
    w, h = 64, 48
    base = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 75)
    vp8_payload = get_chunk(base, b"VP8 ")
    plane = bytes((x * 255 // (w - 1) + y) & 0xFF
                  for y in range(h) for x in range(w))
    for f, fname in enumerate(("none", "horiz", "vert", "grad")):
        alph_payload = bytes((f << 2,)) + filter_plane(plane, w, h, f)
        webp = riff(vp8x(w, h, alpha=True) + chunk(b"ALPH", alph_payload) +
                    chunk(b"VP8 ", vp8_payload))
        write(f"araw_{fname}_64x48", webp)

    # odd-width raw fixture (row-boundary edge cases in the unfilter)
    w, h = 33, 17
    base = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 50)
    vp8_payload = get_chunk(base, b"VP8 ")
    plane = bytes(rng.randrange(256) for _ in range(w * h))
    alph_payload = bytes((3 << 2,)) + filter_plane(plane, w, h, 3)
    write("araw_grad_33x17", riff(vp8x(w, h, alpha=True) +
                                  chunk(b"ALPH", alph_payload) +
                                  chunk(b"VP8 ", vp8_payload)))

    # --- VP8X still with metadata chunks around the image data
    w, h = 64, 48
    base = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 75)
    vp8_payload = get_chunk(base, b"VP8 ")
    webp = riff(vp8x(w, h, exif=True) + chunk(b"VP8 ", vp8_payload) +
                chunk(b"EXIF", b"Exif\x00\x00fake-metadata-payload"))
    write("meta_exif_64x48", webp)

    # --- animations: first frame full-canvas; golden = frame-1 as a still
    w, h = 64, 48
    f1 = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 75)
    f2 = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 50)
    anim = riff(vp8x(w, h, anim=True) + anim_hdr() +
                anmf(0, 0, w, h, 40, chunk(b"VP8 ", get_chunk(f1, b"VP8 "))) +
                anmf(0, 0, w, h, 40, chunk(b"VP8 ", get_chunk(f2, b"VP8 "))))
    write_anim("anim_vp8_64x48", anim, f1)

    w, h = 40, 30
    rgba = bytes(with_alpha(photo_rgb(w, h, rng), w, h,
                            lambda x, y: 128 + x))
    l1 = encode_lossless(rgba, w, h)
    still_l1 = riff(chunk(b"VP8L", get_chunk(l1, b"VP8L")))
    anim = riff(vp8x(w, h, alpha=True, anim=True) + anim_hdr() +
                anmf(0, 0, w, h, 33,
                     chunk(b"VP8L", get_chunk(l1, b"VP8L"))))
    write_anim("anim_vp8l_40x30", anim, still_l1)

    w, h = 64, 48
    a1 = encode_lossy(bytes(with_alpha(photo_rgb(w, h, rng), w, h,
                                       lambda x, y: y * 255 // (h - 1))),
                      w, h, 75)
    frame = (chunk(b"ALPH", get_chunk(a1, b"ALPH")) +
             chunk(b"VP8 ", get_chunk(a1, b"VP8 ")))
    anim = riff(vp8x(w, h, alpha=True, anim=True) + anim_hdr() +
                anmf(0, 0, w, h, 40, frame))
    write_anim("anim_alpha_64x48", anim, a1)

    # --- pre-processing==1 ("reduced levels", alpha_quality<100) stills.
    # libwebp's decoder treats the flag as informational: under default
    # options (no alpha_dithering_strength — the WebPDecodeRGBA path PIL
    # rides) the plane decodes IDENTICALLY to pre==0. These goldens pin
    # that parity for both ALPH methods.
    w, h = 64, 48
    base = encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 75)
    vp8_payload = get_chunk(base, b"VP8 ")
    plane = bytes((x * y) % 251 for y in range(h) for x in range(w))
    alph_payload = bytes((0x10 | (3 << 2),)) + filter_plane(plane, w, h, 3)
    write("apre1_raw_grad_64x48", riff(vp8x(w, h, alpha=True) +
                                       chunk(b"ALPH", alph_payload) +
                                       chunk(b"VP8 ", vp8_payload)))

    src = open(os.path.join(OUT, "agrad_64x48_q75.webp"), "rb").read()
    alph = bytearray(get_chunk(src, b"ALPH"))
    alph[0] |= 0x10  # method=1 (lossless) payload, pre forced to 1
    write("apre1_vp8l_64x48", riff(vp8x(64, 48, alpha=True) +
                                   chunk(b"ALPH", bytes(alph)) +
                                   chunk(b"VP8 ", get_chunk(src, b"VP8 "))))

    # --- multi-frame animation for the mm_frame_sample fan-out: 6
    # full-canvas lossy frames. Each frame's standalone still gets its own
    # libwebp golden (clip_64x48_f<i>.golden), so graft's per-ANMF-frame
    # decode is C-validated frame by frame; the assembled animation also
    # lands in main resources as the Multimodal fixture corpus's clip.webp.
    w, h = 64, 48
    frames = [encode_lossy(bytes(photo_rgb(w, h, rng)), w, h, 75)
              for _ in range(6)]
    anim = riff(vp8x(w, h, anim=True) + anim_hdr() +
                b"".join(anmf(0, 0, w, h, 30 + 10 * i,
                              chunk(b"VP8 ", get_chunk(f, b"VP8 ")))
                         for i, f in enumerate(frames)))
    write_anim("clip_64x48", anim, frames[0])
    for i, f in enumerate(frames):
        wv, hv, got = decode_rgba(f)
        open(os.path.join(OUT, f"clip_64x48_f{i}.golden"), "wb").write(
            struct.pack(">II", wv, hv) + got)
    main_res = os.path.join(os.path.dirname(__file__), "..",
                            "src", "main", "resources", "graft", "fixtures")
    open(os.path.join(main_res, "clip.webp"), "wb").write(anim)
    print(f"  clip.webp -> main resources ({len(anim)}B, 6 frames)")

    # --- ANMF blend-flag semantics: a non-first ALPHA frame decodes
    # standalone only when it declares do-not-blend (flags bit1). The
    # noblend twin gets per-frame goldens (each frame as a C-decoded
    # still); the blend twin exists so frames() must DROP its second
    # frame rather than decode it wrong.
    w, h = 64, 48
    af = [encode_lossy(bytes(with_alpha(photo_rgb(w, h, rng), w, h,
                             lambda x, y, i=i: (x * (i + 3) + y) % 256)),
                       w, h, 75)
          for i in range(2)]

    def frame_chunks(f):
        return (chunk(b"ALPH", get_chunk(f, b"ALPH")) +
                chunk(b"VP8 ", get_chunk(f, b"VP8 ")))
    noblend = riff(vp8x(w, h, alpha=True, anim=True) + anim_hdr() +
                   anmf(0, 0, w, h, 40, frame_chunks(af[0])) +
                   anmf(0, 0, w, h, 40, frame_chunks(af[1]), flags=2))
    write_anim("anim_alpha2_noblend_64x48", noblend, af[0])
    for i, f in enumerate(af):
        wv, hv, got = decode_rgba(f)
        open(os.path.join(OUT, f"anim_alpha2_noblend_64x48_f{i}.golden"),
             "wb").write(struct.pack(">II", wv, hv) + got)
    blended = riff(vp8x(w, h, alpha=True, anim=True) + anim_hdr() +
                   anmf(0, 0, w, h, 40, frame_chunks(af[0])) +
                   anmf(0, 0, w, h, 40, frame_chunks(af[1]), flags=0))
    write_anim("anim_alpha2_blend_64x48", blended, af[0])

    # --- clip2: the COMPOSITED-animation fixture (round 10) — partial
    # rects, blend and no-blend frames, a dispose-to-background frame,
    # lossless/lossy/lossy+ALPH payloads, 8 frames on a 64x48 canvas.
    # Goldens are per-frame COMPOSITED canvases. Per-frame pixel decode
    # is libwebp (C-validated as stills); the canvas arithmetic is a
    # reimplementation of libwebp demux/anim_decode.c
    # (BlendPixelNonPremult, dispose-to-transparent-black) — no
    # libwebpdemux ships in this container, so the integer blend math is
    # pinned by THIS independent implementation cross-checked against
    # the Scala one (AnimCompositeSpec), not by WebPAnimDecoder itself.
    # Appended at the END of main() so every earlier fixture's RNG
    # stream is untouched.
    make_clip2(rng)


def make_clip2(rng):
    w, h = 64, 48

    def lossless_frame(fw, fh, alpha_fn):
        rgba = bytes(with_alpha(photo_rgb(fw, fh, rng), fw, fh, alpha_fn))
        enc = encode_lossless(rgba, fw, fh)
        payload = get_chunk(enc, b"VP8L")
        still = riff(chunk(b"VP8L", payload))
        return chunk(b"VP8L", payload), still

    def lossy_frame(fw, fh, q):
        rgba = bytes(photo_rgb(fw, fh, rng))
        enc = encode_lossy(rgba, fw, fh, q)
        payload = get_chunk(enc, b"VP8 ")
        still = riff(chunk(b"VP8 ", payload))
        return chunk(b"VP8 ", payload), still

    def lossy_alpha_frame(fw, fh, q, alpha_fn):
        rgba = bytes(with_alpha(photo_rgb(fw, fh, rng), fw, fh, alpha_fn))
        enc = encode_lossy(rgba, fw, fh, q)
        fr = (chunk(b"ALPH", get_chunk(enc, b"ALPH")) +
              chunk(b"VP8 ", get_chunk(enc, b"VP8 ")))
        still = riff(vp8x(fw, fh, alpha=True) +
                     chunk(b"ALPH", get_chunk(enc, b"ALPH")) +
                     chunk(b"VP8 ", get_chunk(enc, b"VP8 ")))
        return fr, still

    # (x, y, fw, fh, flags, chunks, standalone_still); flags bit0 =
    # dispose-to-background, bit1 = do-NOT-blend
    specs = []
    fr, st = lossless_frame(w, h, lambda x, y: 255)
    specs.append((0, 0, w, h, 0, fr, st))                  # f0 full opaque
    fr, st = lossless_frame(32, 24, lambda x, y: (x * 8 + y * 3) % 256)
    specs.append((16, 8, 32, 24, 0, fr, st))               # f1 blend, mixed alpha
    fr, st = lossless_frame(40, 16, lambda x, y: 128)
    specs.append((0, 24, 40, 16, 2, fr, st))               # f2 NO-blend, semi
    fr, st = lossless_frame(24, 20, lambda x, y: (255 - x * 5) % 256)
    specs.append((32, 0, 24, 20, 1, fr, st))               # f3 blend + DISPOSE
    fr, st = lossless_frame(16, 16, lambda x, y: (x * y) % 256)
    specs.append((8, 4, 16, 16, 0, fr, st))                # f4 sees f3 disposed
    fr, st = lossy_frame(w, h, 75)
    specs.append((0, 0, w, h, 2, fr, st))                  # f5 lossy resync
    fr, st = lossy_alpha_frame(32, 24, 75, lambda x, y: y * 255 // 23)
    specs.append((12, 12, 32, 24, 0, fr, st))              # f6 lossy+ALPH blend
    fr, st = lossless_frame(16, 16, lambda x, y: (x * 16 + y) % 256)
    specs.append((40, 24, 16, 16, 0, fr, st))              # f7 blend

    anim = riff(vp8x(w, h, alpha=True, anim=True) + anim_hdr() +
                b"".join(anmf(x, y, fw, fh, 40, fr, flags=flags)
                         for (x, y, fw, fh, flags, fr, _still) in specs))

    # composite exactly like libwebp demux/anim_decode.c
    canvas = bytearray(w * h * 4)  # RGBA, transparent black
    dispose = None
    composited = []
    for (x, y, fw, fh, flags, _fr, still) in specs:
        dw_, dh_, rgba = decode_rgba(still)
        assert (dw_, dh_) == (fw, fh), f"frame decode {dw_}x{dh_} != {fw}x{fh}"
        if dispose is not None:
            dx, dy, ddw, ddh = dispose
            for r in range(ddh):
                off = ((dy + r) * w + dx) * 4
                canvas[off:off + ddw * 4] = bytes(ddw * 4)
        blend = (flags & 2) == 0
        for r in range(fh):
            coff = ((y + r) * w + x) * 4
            foff = r * fw * 4
            for c in range(fw):
                so = foff + c * 4
                sr, sg, sb, sa = rgba[so:so + 4]
                do = coff + c * 4
                if (not blend) or sa == 255:
                    canvas[do:do + 4] = bytes((sr, sg, sb, sa))
                elif sa == 0:
                    pass
                else:
                    dr, dg, db, da = canvas[do:do + 4]
                    scale = da * (255 - sa) // 255
                    ba = sa + scale
                    canvas[do:do + 4] = bytes((
                        (sr * sa + dr * scale) // ba,
                        (sg * sa + dg * scale) // ba,
                        (sb * sa + db * scale) // ba, ba))
        dispose = (x, y, fw, fh) if (flags & 1) else None
        composited.append(bytes(canvas))

    open(os.path.join(OUT, "clip2_64x48.webp"), "wb").write(anim)
    for i, rgba in enumerate(composited):
        open(os.path.join(OUT, f"clip2_64x48_f{i}.composited"), "wb").write(
            struct.pack(">II", w, h) + rgba)
    main_res = os.path.join(os.path.dirname(__file__), "..",
                            "src", "main", "resources", "graft", "fixtures")
    open(os.path.join(main_res, "clip2.webp"), "wb").write(anim)
    print(f"  clip2.webp -> main resources ({len(anim)}B, 8 frames, "
          "blend/dispose/partial)")


if __name__ == "__main__":
    main()
