#!/usr/bin/env python3
# Dev-time fixture generator for WebpSpec: encodes the corpus with the
# SYSTEM libwebp (public, BSD) and dumps each file's golden pixels via
# libwebp's OWN decode (exact=0 zeroes RGB under fully-transparent
# pixels, so the pre-encode input is not the right golden for alpha
# images). Not used at runtime; re-run only to regenerate fixtures.

import ctypes, struct, os, random

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
lib.WebPEncodeLosslessRGBA.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]

def gen(name, w, h, pix):  # pix: list of (r,g,b,a)
    rgba = bytes(b for p in pix for b in p)
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGBA(rgba, w, h, w*4, ctypes.byref(out))
    assert n > 0, name
    data = ctypes.string_at(out, n)
    with open(f"/root/repo/src/test/resources/webp/{name}.webp", "wb") as f: f.write(data)
    with open(f"/root/repo/src/test/resources/webp/{name}.rgba", "wb") as f:
        f.write(struct.pack(">II", w, h)); f.write(rgba)
    print(name, w, h, n, "bytes")

rnd = random.Random(42)
# 1: photographic-ish gradient + noise, odd dims (transforms, LZ77)
w,h = 97, 61
gen("grad_noise", w, h, [((x*255//w + rnd.randint(0,30)) % 256, (y*255//h) % 256, (x*y) % 256, 255) for y in range(h) for x in range(w)])
# 2: few-color palette-ish image (color indexing transform, packed pixels)
w,h = 50, 33
cols = [(255,0,0,255),(0,255,0,255),(0,0,255,255),(10,20,30,255)]
gen("palette4", w, h, [cols[(x//5 + y//3) % 4] for y in range(h) for x in range(w)])
# 3: flat runs (LZ77 heavy, color cache)
w,h = 128, 40
gen("runs", w, h, [((x//16)*40 % 256, (y//8)*60 % 256, 128, 255) for y in range(h) for x in range(w)])
# 4: alpha gradient
w,h = 40, 40
gen("alpha_grad", w, h, [(x*6 % 256, y*6 % 256, (x+y)*3 % 256, (x*255//w)) for y in range(h) for x in range(w)])
# 5: pure noise (max entropy; many huffman groups likely)
w,h = 90, 70
gen("noise", w, h, [(rnd.randint(0,255), rnd.randint(0,255), rnd.randint(0,255), 255) for _ in range(w*h)])
# 6: tiny images
gen("tiny1", 1, 1, [(7, 77, 177, 255)])
gen("tiny31", 3, 1, [(1,2,3,255),(4,5,6,255),(7,8,9,255)])
# 7: two-color checkerboard (simple codes likely)
w,h = 64, 64
gen("checker", w, h, [((0,0,0,255) if (x+y)%2==0 else (255,255,255,255)) for y in range(h) for x in range(w)])

# ---- golden regeneration via reference decode ----
import ctypes, struct, glob, os
lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeRGBA.restype = ctypes.c_void_p
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
  ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
for f in sorted(glob.glob("/root/repo/src/test/resources/webp/*.webp")):
    data = open(f, "rb").read()
    w = ctypes.c_int(); h = ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert ptr, f
    rgba = ctypes.string_at(ptr, w.value * h.value * 4)
    out = f[:-5] + ".rgba"
    old = open(out, "rb").read()[8:]
    with open(out, "wb") as o:
        o.write(struct.pack(">II", w.value, h.value)); o.write(rgba)
    print(os.path.basename(f), w.value, h.value, "changed" if old != rgba else "same")
