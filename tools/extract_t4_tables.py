#!/usr/bin/env python3
# Dev-time BEHAVIORAL extraction of the ITU-T T.4 run-length code
# tables from the SYSTEM libtiff (public, libtiff license): encodes
# probe rows with COMPRESSION_CCITTFAX3 (1D, EOL-delimited) and reads
# the codes straight out of the bitstream — white/black terminating
# codes 0..63, makeup codes 64..1728 per color, and the shared
# extended makeups 1792..2560. Emits CcittTables.scala. No libtiff
# struct layout or source is consulted; only encoder OUTPUT. Not used
# at runtime.

import ctypes, struct, os

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libtiff.so.6")
LIB.TIFFOpen.restype = ctypes.c_void_p
LIB.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]

def encode_rows(width, rows_bits):
    """rows_bits: list of lists of 0/1 pixel values (1 = black under
    PHOTOMETRIC_MINISWHITE). Returns the encoded strip bits as a str."""
    path = b"/tmp/t4_probe.tif"
    tif = LIB.TIFFOpen(path, b"w")
    assert tif
    def setf(tag, val):
        LIB.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), ctypes.c_int(val))
    setf(256, width); setf(257, len(rows_bits)); setf(258, 1); setf(277, 1)
    setf(262, 0)            # WhiteIsZero
    setf(259, 3)            # COMPRESSION_CCITTFAX3, default opts = 1D + EOL
    setf(278, len(rows_bits))
    nb = (width + 7) // 8
    for y, bits in enumerate(rows_bits):
        packed = bytearray(nb)
        for x, v in enumerate(bits):
            if v: packed[x >> 3] |= 0x80 >> (x & 7)
        buf = (ctypes.c_ubyte * nb)(*packed)
        assert LIB.TIFFWriteScanline(ctypes.c_void_p(tif), buf, ctypes.c_uint32(y),
                                     ctypes.c_uint16(0)) == 1
    LIB.TIFFClose(ctypes.c_void_p(tif))
    data = open(path, "rb").read()
    le = data[:2] == b"II"
    fmtH, fmtI = ("<H", "<I") if le else (">H", ">I")
    def u16(o): return struct.unpack(fmtH, data[o:o+2])[0]
    def u32(o): return struct.unpack(fmtI, data[o:o+4])[0]
    ifd = u32(4); n = u16(ifd)
    so = sc = None
    for k in range(n):
        e = ifd + 2 + 12 * k
        tag, typ = u16(e), u16(e + 2)
        val = u16(e + 8) if typ == 3 else u32(e + 8)
        if tag == 273: so = val
        if tag == 279: sc = val
    return "".join(f"{b:08b}" for b in data[so:so+sc])

def first_code(bits):
    """Bits between the first and second EOL (EOL = >=11 zeros then 1)."""
    def eol_end(s, frm):
        i = s.index("1", frm)
        while i - frm < 11 or "1" in s[frm:i]:
            frm = i + 1
            i = s.index("1", frm)
        return i + 1
    a = eol_end(bits, 0)
    # find the start of the next EOL: a run of >=11 zeros ending in 1
    i = a
    while True:
        j = bits.index("1", i)
        if j - i >= 11:
            return bits[a:j - 11]
        i = j + 1

white = {}
black = {}
for n in range(1, 64):
    white[n] = first_code(encode_rows(n, [[0]*n, [0]*n]))
# WT(0): suffix shared by white-makeup rows AND prefix of black rows
c1 = first_code(encode_rows(1, [[1], [1]]))
m64 = first_code(encode_rows(64, [[0]*64, [0]*64]))
m128 = first_code(encode_rows(128, [[0]*128, [0]*128]))
lcs = ""
while len(lcs) < min(len(m64), len(m128)) and m64[-(len(lcs)+1)] == m128[-(len(lcs)+1)]:
    lcs = m64[-(len(lcs)+1):]
wt0 = None
for k in range(len(lcs), 0, -1):
    if c1.startswith(lcs[-k:]):
        wt0 = lcs[-k:]
        break
assert wt0 == "00110101", f"WT(0) extraction got {wt0}"  # T.4 sanity
white[0] = wt0
for n in range(1, 64):
    cb = first_code(encode_rows(n, [[1]*n, [1]*n]))
    assert cb.startswith(wt0), n
    black[n] = cb[len(wt0):]
# BT(0) = 0000110111 per T.4; verify it terminates black makeup rows
bt0 = "0000110111"
b64 = first_code(encode_rows(64, [[1]*64, [1]*64]))[len(wt0):]
b128 = first_code(encode_rows(128, [[1]*128, [1]*128]))[len(wt0):]
assert b64.endswith(bt0) and b128.endswith(bt0), (b64, b128)
black[0] = bt0

white_mk = {}
black_mk = {}
for k in range(1, 28):
    n = 64 * k
    if n > 1728: break
    wm = first_code(encode_rows(n, [[0]*n, [0]*n]))
    assert wm.endswith(white[0]), n
    white_mk[n] = wm[:-len(white[0])]
    bm = first_code(encode_rows(n, [[1]*n, [1]*n]))
    assert bm.startswith(wt0) and bm.endswith(bt0), n
    black_mk[n] = bm[len(wt0):-len(bt0)]
ext_mk = {}
for n in range(1792, 2561, 64):
    em = first_code(encode_rows(n, [[0]*n, [0]*n]))
    assert em.endswith(white[0]), n
    ext_mk[n] = em[:-len(white[0])]
nb_ = 1792
embl = first_code(encode_rows(nb_, [[1]*nb_, [1]*nb_]))
assert embl == wt0 + ext_mk[nb_] + bt0, "extended makeup not shared with black"

out = open("/root/repo/src/main/scala/graft/operators/CcittTables.scala", "w")
out.write("""package graft.operators

/** ITU-T T.4 run-length code tables (terminating 0-63, makeups
  * 64-1728 per color, shared extended makeups 1792-2560), extracted
  * BEHAVIORALLY from the system libtiff encoder's bitstreams at dev
  * time (`tools/extract_t4_tables.py`) — the same public-constant
  * discipline as the brotli/VP8 tables. Strings are MSB-first code
  * bits. */
object CcittTables {
""")
def emit(name, d):
    out.write(f"  val {name}: Seq[(String, Int)] = Seq(\n")
    items = [f'    ("{code}", {val})' for val, code in sorted(d.items())]
    out.write(",\n".join(items))
    out.write(")\n\n")
emit("WhiteCodes", {**white, **white_mk})
emit("BlackCodes", {**black, **black_mk})
emit("ExtMakeups", ext_mk)
out.write("}\n")
out.close()
print("white", len(white), "wmk", len(white_mk), "black", len(black),
      "bmk", len(black_mk), "ext", len(ext_mk))
print("WT0", white[0], "BT0", black[0], "WM64", white_mk[64], "BM64", black_mk[64])
