#!/usr/bin/env python3
# Dev-time fixture generator for the ALPH (lossy WebP alpha) decode
# path: encodes RGBA with the SYSTEM libwebp (public, BSD) — which for
# lossy+alpha emits a VP8X container with an ALPH chunk beside 'VP8 ' —
# and dumps each file's golden RGBA via libwebp's OWN WebPDecodeRGBA.
# Also hand-builds one container with a RAW (compression method 0)
# ALPH chunk, golden'd the same way. Not used at runtime.

import ctypes, struct, os, random

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGBA.restype = ctypes.c_size_t
lib.WebPEncodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                               ctypes.c_int, ctypes.c_float,
                               ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.c_void_p
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

OUT = "/root/repo/src/test/resources/webp"

def golden(name, data):
    with open(f"{OUT}/{name}.webp", "wb") as f: f.write(data)
    w = ctypes.c_int(); h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert ptr, name
    rgba = ctypes.string_at(ptr, w.value * h.value * 4)
    with open(f"{OUT}/{name}.rgba", "wb") as f:
        f.write(struct.pack(">II", w.value, h.value)); f.write(rgba)
    # report the ALPH format byte so the fixture sweep provably covers
    # compression methods and filters
    i = 12
    fmt = None
    while i + 8 <= len(data):
        t = data[i:i+4]; ln = struct.unpack("<I", data[i+4:i+8])[0]
        if t == b"ALPH": fmt = data[i+8]
        i += 8 + ln + (ln & 1)
    print(name, w.value, h.value, len(data), "bytes",
          f"ALPH fmt={fmt:#04x} C={fmt&3} F={(fmt>>2)&3} P={(fmt>>4)&3}" if fmt is not None else "NO ALPH")

def enc(name, w, h, pix, q):
    rgba = bytes(b for p in pix for b in p)
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, name
    golden(name, ctypes.string_at(out, n))

rnd = random.Random(7)
# vertical alpha gradient (encoder tends to pick a vertical/gradient filter)
w, h = 48, 40
enc("lossy_alpha_vgrad", w, h,
    [((x*5) % 256, (y*6) % 256, (x+y) % 256, min(255, y*7)) for y in range(h) for x in range(w)], 75)
# horizontal alpha gradient
w, h = 56, 32
enc("lossy_alpha_hgrad", w, h,
    [((x*3) % 256, (y*9) % 256, (x*y) % 256, min(255, x*5)) for y in range(h) for x in range(w)], 50)
# noisy alpha (filter NONE likely), odd dims
w, h = 37, 29
enc("lossy_alpha_noise", w, h,
    [(rnd.randint(0,255), rnd.randint(0,255), rnd.randint(0,255), rnd.randint(0,255))
     for _ in range(w*h)], 90)
# blocky alpha (two levels)
w, h = 64, 48
enc("lossy_alpha_steps", w, h,
    [((x//8*37) % 256, (y//8*53) % 256, 99, 255 if (x//16 + y//16) % 2 == 0 else 64)
     for y in range(h) for x in range(w)], 60)

# ---- hand-built container with a RAW ALPH chunk (compression 0) ----
# take the VP8 chunk from an opaque lossy encode, then wrap VP8X +
# raw-ALPH + VP8; libwebp itself decodes the result for the golden.
w, h = 40, 24
pix = [((x*7) % 256, (y*11) % 256, (x^y) % 256, 255) for y in range(h) for x in range(w)]
rgba = bytes(b for p in pix for b in p)
out = ctypes.c_void_p()
n = lib.WebPEncodeRGBA(rgba, w, h, w * 4, 80.0, ctypes.byref(out))
data = ctypes.string_at(out, n)
i = 12; vp8 = None
while i + 8 <= len(data):
    t = data[i:i+4]; ln = struct.unpack("<I", data[i+4:i+8])[0]
    if t == b"VP8 ": vp8 = data[i+8:i+8+ln]
    i += 8 + ln + (ln & 1)
assert vp8 is not None
alpha_plane = bytes((x*y) % 256 for y in range(h) for x in range(w))
alph = bytes([0x00]) + alpha_plane  # fmt: C=0 raw, F=0, P=0
def chunk(tag, body):
    b = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1: b += b"\x00"
    return b
vp8x = chunk(b"VP8X", bytes([0x10, 0, 0, 0]) + struct.pack("<I", w-1)[:3] + struct.pack("<I", h-1)[:3])
payload = b"WEBP" + vp8x + chunk(b"ALPH", alph) + chunk(b"VP8 ", vp8)
riff = b"RIFF" + struct.pack("<I", len(payload)) + payload
golden("lossy_alpha_raw", riff)

# ---- filtered raw ALPH chunks (F=1,2,3): forward-filter the plane per
# libwebp filters.c, wrap with C=0, and let libwebp decode the golden —
# the reference adjudicates the unfilter math.
def fwd_filter(plane, w, h, f):
    out = bytearray(w*h)
    for y in range(h):
        for x in range(w):
            v = plane[y*w+x]
            if y == 0:
                p = 0 if x == 0 else plane[x-1]
            elif f == 1:   # horizontal
                p = plane[y*w-w] if x == 0 else plane[y*w+x-1]
            elif f == 2:   # vertical
                p = plane[(y-1)*w+x]
            else:          # gradient
                if x == 0: p = plane[(y-1)*w]
                else:
                    g = plane[y*w+x-1] + plane[(y-1)*w+x] - plane[(y-1)*w+x-1]
                    p = 0 if g < 0 else 255 if g > 255 else g
            out[y*w+x] = (v - p) & 0xff
    return bytes(out)

smooth = bytes(min(255, (x*3 + y*5) % 256) for y in range(h) for x in range(w))
for f, name in ((1, "lossy_alpha_fh"), (2, "lossy_alpha_fv"), (3, "lossy_alpha_fg")):
    alph_f = bytes([f << 2]) + fwd_filter(smooth, w, h, f)
    payload = b"WEBP" + vp8x + chunk(b"ALPH", alph_f) + chunk(b"VP8 ", vp8)
    golden(name, b"RIFF" + struct.pack("<I", len(payload)) + payload)
