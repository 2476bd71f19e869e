#!/usr/bin/env python3
# Dev-time fixture generator for Vp8Spec: lossy-encodes a content/quality
# sweep with the SYSTEM libwebp (public, BSD) and dumps each file's golden
# Y/U/V planes via libwebp's OWN WebPDecodeYUV. VP8 reconstruction is
# fully integer-specified (RFC 6386), so the Scala decoder must reproduce
# these planes byte for byte. Not used at runtime.

import ctypes, struct, random, os

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = "/root/repo/src/test/resources/vp8"
os.makedirs(OUT, exist_ok=True)

def gen(name, w, h, pix, quality):
    rgba = bytes(b for p in pix for b in p)
    enc = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, quality, ctypes.byref(enc))
    assert n > 0, name
    data = ctypes.string_at(enc, n)
    ww, hh = ctypes.c_int(), ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yp = lib.WebPDecodeYUV(data, n, ctypes.byref(ww), ctypes.byref(hh),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yp and ww.value == w and hh.value == h, name
    cw, ch = (w + 1) // 2, (h + 1) // 2
    y = b"".join(bytes(yp[r * stride.value + c] for c in range(w)) for r in range(h))
    u = b"".join(bytes(up[r * uv_stride.value + c] for c in range(cw)) for r in range(ch))
    v = b"".join(bytes(vp[r * uv_stride.value + c] for c in range(cw)) for r in range(ch))
    with open(f"{OUT}/{name}.webp", "wb") as f:
        f.write(data)
    with open(f"{OUT}/{name}.yuv", "wb") as f:
        f.write(struct.pack(">II", w, h))
        f.write(y); f.write(u); f.write(v)
    print(name, w, h, n, "bytes q", quality)

rnd = random.Random(7)

# 1. photographic gradient+noise, odd dims, mid quality (B_PRED heavy)
w, h = 97, 61
gen("grad_noise_q75", w, h,
    [((x * 255 // w + rnd.randint(0, 40)) % 256, (y * 255 // h) % 256,
      (x * y) % 256, 255) for y in range(h) for x in range(w)], 75.0)

# 2. same content, q=100 (near-zero quant; often filter level 0)
gen("grad_noise_q100", w, h,
    [((x * 255 // w + rnd.randint(0, 40)) % 256, (y * 255 // h) % 256,
      (x * y) % 256, 255) for y in range(h) for x in range(w)], 100.0)

# 3. low quality (coarse quant, strong loop filter, skip MBs)
gen("grad_noise_q10", w, h,
    [((x * 255 // w + rnd.randint(0, 40)) % 256, (y * 255 // h) % 256,
      (x * y) % 256, 255) for y in range(h) for x in range(w)], 10.0)

# 4. flat blocks (16x16 modes, many skipped MBs, segment features)
w, h = 128, 96
gen("flat_blocks_q50", w, h,
    [(32 * ((x // 32) % 8), 200 if (y // 24) % 2 else 40, (x // 16 * 50) % 256, 255)
     for y in range(h) for x in range(w)], 50.0)

# 5. tiny non-MB-aligned image (single MB, cropping)
w, h = 5, 7
gen("tiny_5x7_q80", w, h,
    [((x * 50) % 256, (y * 37) % 256, (x + y) * 19 % 256, 255)
     for y in range(h) for x in range(w)], 80.0)

# 6. exactly one MB
w, h = 16, 16
gen("one_mb_q60", w, h,
    [((x * 16) % 256, (y * 16) % 256, (x * y) % 256, 255)
     for y in range(h) for x in range(w)], 60.0)

# 7. hard edges (exercises directional B modes + strong filtering)
w, h = 80, 48
gen("edges_q40", w, h,
    [((255 if (x + y) % 17 < 8 else 0), (255 if x % 13 < 6 else 0),
      (255 if y % 11 < 5 else 0), 255) for y in range(h) for x in range(w)], 40.0)

# 8. larger photographic-ish, default quality (multi-row, partitions)
w, h = 161, 113
gen("photo_q75", w, h,
    [(int(128 + 90 * ((x / w) - 0.5) + rnd.randint(0, 25)) % 256,
      int(128 + 90 * ((y / h) - 0.5)) % 256,
      int(100 + 70 * (((x * y) / (w * h)))) % 256, 255)
     for y in range(h) for x in range(w)], 75.0)
