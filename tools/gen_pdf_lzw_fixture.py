#!/usr/bin/env python3
# Dev-time fixture: one 8-bit gray LZW-compressed strip from the SYSTEM
# libtiff, for the PDF /LZWDecode image leg (PDF LZW with default
# EarlyChange=1 is exactly TIFF §13 LZW). Not used at runtime.
import ctypes, struct, os
LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
LIB.TIFFOpen.restype = ctypes.c_void_p
LIB.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
w, h = 48, 20
rows = [bytes(((x * 7 + y * 13) % 256) for x in range(w)) for y in range(h)]
path = b"/tmp/lzw_probe.tif"
tif = LIB.TIFFOpen(path, b"w")
def setf(tag, val): LIB.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(val))
setf(256, w); setf(257, h); setf(258, 8); setf(277, 1); setf(262, 1)
setf(259, 5)  # LZW
setf(278, h)
for y, r in enumerate(rows):
    buf = (ctypes.c_ubyte * w)(*r)
    assert LIB.TIFFWriteScanline(ctypes.c_void_p(tif), buf, ctypes.c_uint32(y), ctypes.c_uint16(0)) == 1
LIB.TIFFClose(ctypes.c_void_p(tif))
data = open(path, "rb").read()
def u16(o): return struct.unpack("<H", data[o:o+2])[0]
def u32(o): return struct.unpack("<I", data[o:o+4])[0]
ifd = u32(4); so = sc = None
for k in range(u16(ifd)):
    e = ifd + 2 + 12 * k
    tag, typ = u16(e), u16(e+2)
    v = u16(e+8) if typ == 3 else u32(e+8)
    if tag == 273: so = v
    if tag == 279: sc = v
strip = data[so:so+sc]
OUT = "/root/repo/src/test/resources/ccitt"
with open(f"{OUT}/lzw_gray.strip", "wb") as f:
    f.write(struct.pack(">II", w, h)); f.write(strip)
with open(f"{OUT}/lzw_gray.golden", "wb") as f:
    f.write(struct.pack(">II", w, h))
    for r in rows: f.write(r)
print("lzw strip", len(strip), "bytes for", w, "x", h)
