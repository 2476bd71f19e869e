#!/usr/bin/env python3
# Dev-time fixture generator for CCITT fax decode: encodes bilevel test
# images with the SYSTEM libtiff at COMPRESSION 2 (MH/RLE), 3 (G3 1D),
# 3+2D (T4Options bit 0), and 4 (G4/MMR), in both photometrics and
# both fill orders, multi-strip included. Golden = the packed input
# rows (CCITT is lossless). Not used at runtime.

import ctypes, struct, os, random

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
LIB.TIFFOpen.restype = ctypes.c_void_p
LIB.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

OUT = "/root/repo/src/test/resources/ccitt"
os.makedirs(OUT, exist_ok=True)

def write_tif(path, width, rows, comp, photometric=0, t4opts=None,
              fillorder=1, rows_per_strip=None):
    tif = LIB.TIFFOpen(path.encode(), b"w")
    assert tif, path
    def setf(tag, val):
        LIB.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(val))
    setf(256, width); setf(257, len(rows)); setf(258, 1); setf(277, 1)
    setf(262, photometric)
    setf(259, comp)
    if t4opts is not None: setf(292, t4opts)
    setf(266, fillorder)
    setf(278, rows_per_strip or len(rows))
    nb = (width + 7) // 8
    for y, bits in enumerate(rows):
        packed = bytearray(nb)
        for x, v in enumerate(bits):
            if v: packed[x >> 3] |= 0x80 >> (x & 7)
        buf = (ctypes.c_ubyte * nb)(*packed)
        assert LIB.TIFFWriteScanline(ctypes.c_void_p(tif), buf, ctypes.c_uint32(y),
                                     ctypes.c_uint16(0)) == 1, (path, y)
    LIB.TIFFClose(ctypes.c_void_p(tif))

def golden(path, width, rows):
    nb = (width + 7) // 8
    with open(path, "wb") as f:
        f.write(struct.pack(">II", width, len(rows)))
        for bits in rows:
            packed = bytearray(nb)
            for x, v in enumerate(bits):
                if v: packed[x >> 3] |= 0x80 >> (x & 7)
            f.write(packed)

rnd = random.Random(31)

def textlike(w, h):
    rows = []
    for y in range(h):
        row = [0]*w
        if y % 7 in (2, 3):  # "text lines": runs of black
            x = 1
            while x < w - 2:
                ln = rnd.randint(1, 9)
                for k in range(min(ln, w - x)): row[x+k] = 1
                x += ln + rnd.randint(1, 6)
        rows.append(row)
    return rows

def speckle(w, h, p=0.3):
    return [[1 if rnd.random() < p else 0 for _ in range(w)] for _ in range(h)]

def diagonal(w, h):
    return [[1 if (x + y) % 9 < 4 else 0 for x in range(w)] for y in range(h)]

def wide(w, h):
    # exercises makeups incl. >2560 runs
    return [([0]*w if y % 2 == 0 else [1]*w) for y in range(h)]

cases = [
    ("g3_1d_text", 3, 0, 211, 40, textlike, None, 1, None),
    ("g3_2d_text", 3, 0, 211, 40, textlike, 1, 1, None),       # T4Options bit0 = 2D
    ("g4_text", 4, 0, 211, 40, textlike, None, 1, None),
    ("g4_speckle", 4, 0, 97, 30, speckle, None, 1, None),
    ("g4_diagonal", 4, 0, 160, 48, diagonal, None, 1, None),
    ("rle_text", 2, 0, 133, 24, textlike, None, 1, None),
    ("g4_minisblack", 4, 1, 120, 20, textlike, None, 1, None),
    ("g4_lsb_fill", 4, 0, 120, 20, textlike, None, 2, None),   # FillOrder 2
    ("g4_multistrip", 4, 0, 150, 40, textlike, None, 1, 16),   # 3 strips
    ("g3_2d_diagonal", 3, 0, 160, 48, diagonal, 1, 1, None),
    ("g3_1d_wide", 3, 0, 6000, 6, wide, None, 1, None),        # runs > 2560
    ("g4_wide", 4, 0, 6000, 6, wide, None, 1, None),
    ("g4_allwhite", 4, 0, 64, 8, lambda w, h: [[0]*w for _ in range(h)], None, 1, None),
    ("g4_allblack", 4, 0, 64, 8, lambda w, h: [[1]*w for _ in range(h)], None, 1, None),
    ("g4_1px", 4, 0, 1, 3, lambda w, h: [[1], [0], [1]], None, 1, None),
]
for name, comp, photo, w, h, gen, t4, fo, rps in cases:
    rows = gen(w, h)
    write_tif(f"{OUT}/{name}.tif", w, rows, comp, photo, t4, fo, rps)
    golden(f"{OUT}/{name}.golden", w, rows)
    print(name, w, "x", h, "comp", comp, os.path.getsize(f"{OUT}/{name}.tif"), "bytes")
