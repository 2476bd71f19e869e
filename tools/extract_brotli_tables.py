#!/usr/bin/env python3
# Dev-time extraction of RFC 7932 constants from the SYSTEM libbrotli
# (public, MIT): the static dictionary (Appendix A, 122,784 bytes) and
# the 121-transform table (Appendix B). The dictionary blob is dumped
# to a test/main resource; the transforms are recovered BEHAVIORALLY by
# applying BrotliTransformDictionaryWord to a marker word and parsing
# prefix/kind/suffix out of the result — no internal struct layout is
# assumed beyond the public dictionary.h one. Not used at runtime.

import ctypes, struct, os

common = ctypes.CDLL("libbrotlicommon.so.1")

# --- dictionary: public struct (dictionary.h) ---
# { uint8_t size_bits_by_length[32]; uint32_t offsets_by_length[32];
#   size_t data_size; const uint8_t* data; }
class BrotliDictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]

common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
d = common.BrotliGetDictionary().contents
assert d.data_size == 122784, d.data_size  # RFC 7932 Appendix A size
bits = list(d.size_bits_by_length)
offs = list(d.offsets_by_length)
# RFC 7932 §8: words of length 4..24; NWORDS[l] = 1 << bits[l]
assert bits[4:25] == [10,10,11,11,10,10,10,10,10,9,9,8,7,7,8,7,7,6,6,5,5], bits
data = ctypes.string_at(d.data, d.data_size)

OUT = "/root/repo/src/main/resources/graft"
os.makedirs(OUT, exist_ok=True)
with open(f"{OUT}/brotli_dictionary.bin", "wb") as f:
    f.write(data)
print("dictionary:", len(data), "bytes; bits[4..24] ok")

# --- transforms: behavioral recovery ---
common.BrotliGetTransforms.restype = ctypes.c_void_p
transforms = common.BrotliGetTransforms()
common.BrotliTransformDictionaryWord.restype = ctypes.c_int
common.BrotliTransformDictionaryWord.argtypes = [
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]

word = b"abcdefghijklmnopqrst"  # 20 distinct lowercase letters
FERMENT_FIRST = word[:1].upper() + word[1:]
FERMENT_ALL = word.upper()

def classify(out):
    # find the transformed core: one of identity/omit-first-N/omit-last-N/
    # ferment-first/ferment-all applied to `word`
    cands = [("Identity", 0, word), ("FermentFirst", 10, FERMENT_FIRST),
             ("FermentAll", 11, FERMENT_ALL)]
    for n in range(1, 10):
        cands.append((f"OmitFirst{n}", 11 + n, word[n:]))
    for n in range(1, 10):
        cands.append((f"OmitLast{n}", n, word[:-n]))
    best = None
    for name, kind, core in cands:
        i = out.find(core)
        if i < 0: continue
        # prefer the longest core (identity beats omit-last-1 etc.)
        if best is None or len(core) > len(best[3]):
            best = (name, kind, i, core)
    assert best, out
    name, kind, i, core = best
    return kind, out[:i], out[i+len(core):]

rows = []
for t in range(121):
    buf = ctypes.create_string_buffer(256)
    n = common.BrotliTransformDictionaryWord(buf, word, len(word), transforms, t)
    kind, prefix, suffix = classify(buf.raw[:n])
    rows.append((prefix, kind, suffix))

# serialize: count, then per transform: plen u8, prefix, kind u8, slen u8, suffix
blob = bytearray(struct.pack(">H", len(rows)))
for prefix, kind, suffix in rows:
    blob += struct.pack(">B", len(prefix)) + prefix
    blob += struct.pack(">BB", kind, len(suffix)) + suffix
with open(f"{OUT}/brotli_transforms.bin", "wb") as f:
    f.write(blob)
print("transforms:", len(rows), "entries,", len(blob), "bytes")
# show a sample for eyeballing
for t in (0, 1, 2, 3, 4, 5, 9, 12, 26, 44, 120):
    p, k, s = rows[t]
    print(f"  T{t}: prefix={p!r} kind={k} suffix={s!r}")

# --- context lookup table: exported RFC 7932 §7.1 constant (2048 bytes:
# 4 modes x (lut0[256] | lut1[256]), context = lut0[p1] | lut1[p2]) ---
tbl = ctypes.cast(getattr(common, "_kBrotliContextLookupTable"),
                  ctypes.POINTER(ctypes.c_uint8))
ctx = bytes(tbl[i] for i in range(2048))
with open(f"{OUT}/brotli_context.bin", "wb") as f:
    f.write(ctx)
# sanity: mode 0 = LSB6 (lut0[p1] = p1 & 0x3f, lut1 = 0); mode 1 = MSB6
assert all(ctx[i] == (i & 0x3f) for i in range(256)), "mode0 lut0"
assert all(ctx[256 + i] == 0 for i in range(256)), "mode0 lut1"
assert all(ctx[512 + i] == (i >> 2) for i in range(256)), "mode1 lut0"
print("context table: 2048 bytes, LSB6/MSB6 sanity ok")
