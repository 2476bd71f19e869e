#!/usr/bin/env python3
# Dev-time table extractor for the VP8 intra-frame decoder (Vp8.scala):
# pulls the RFC 6386 constant tables from the SYSTEM libwebp's (public,
# BSD) .rodata section, anchored on rows fixed by the RFC itself, and
# emits Vp8Tables.scala. The tables are published spec constants (RFC
# 6386 §11.5, §13.4-13.5, §14.1); extraction from the reference binary
# just guarantees a typo-free copy. Not used at runtime; re-run only to
# regenerate. The decoder's bit-exact YUV validation against libwebp's
# own decode (Vp8Spec) would catch any extraction slip.

import re, struct

data = open('/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5', 'rb').read()

# -- locate via RFC-pinned anchor rows ---------------------------------
# default coeff probs [4][8][3][11]: type-0 band-1 ctx-0 row (253,136,..)
# sits 33 bytes past the table start (band 0 of type 0 is all-128).
coeff_anchor = bytes([253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
coeff_at = data.index(coeff_anchor) - 33
coeff = data[coeff_at:coeff_at + 1056]
assert coeff[:33] == bytes([128] * 33)

# kf_bmode_prob [10][10][9]: row [0][0] is the RFC's (231,120,48,...)
bmode_anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
bmode_at = data.index(bmode_anchor)
bmode = data[bmode_at:bmode_at + 900]
assert list(bmode[-9:]) == [112, 19, 12, 61, 195, 128, 48, 4, 24]  # RFC row [9][9]

# ac dequant lookup uint16[128]: 4,5,6,..,284; dc uint8[128]: 4,..,157
ac_at = data.index(struct.pack('<9H', 4, 5, 6, 7, 8, 9, 10, 11, 12))
ac = struct.unpack('<128H', data[ac_at:ac_at + 256])
assert ac[-1] == 284 and all(ac[i] <= ac[i + 1] for i in range(127))
dc_at = data.index(bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12]))
dc = list(data[dc_at:dc_at + 128])
assert dc[-1] == 157 and all(dc[i] <= dc[i + 1] for i in range(127))

# coeff UPDATE probs [4][8][3][11]: mostly-255 block; in this binary it
# follows the bands table + 16 pad bytes right after the dc lookup
upd_at = dc_at + 128 + 32
upd = data[upd_at:upd_at + 1056]
assert upd[:33] == bytes([255] * 33) and upd[33] == 176  # RFC [0][1][0] starts 176,246
assert upd.count(255) > 800

def scala_array(name, vals, per_line=16, typ='Byte'):
    body = []
    for i in range(0, len(vals), per_line):
        body.append('    ' + ', '.join(str(v) for v in vals[i:i + per_line]) + ',')
    body[-1] = body[-1].rstrip(',')
    if typ == 'Byte':
        return f'  val {name}: Array[Int] = Array(\n' + '\n'.join(body) + ')\n'
    return f'  val {name}: Array[Int] = Array(\n' + '\n'.join(body) + ')\n'

out = f'''package graft.operators

/** RFC 6386 constant tables for [[Vp8]], extracted at dev time from the
  * system libwebp's data section by `tools/extract_vp8_tables.py`
  * (anchored on rows the RFC prints verbatim; see the tool header).
  * Layouts: coeff probs / update probs are [4 types][8 bands][3 ctx]
  * [11 probas] flattened row-major; kf b-mode probs [10 above][10 left]
  * [9 probas]; dequant lookups indexed by clamped q in [0, 127]. */
object Vp8Tables {{
{scala_array('DefaultCoeffProbs', list(coeff))}
{scala_array('CoeffUpdateProbs', list(upd))}
{scala_array('KfBModeProbs', list(bmode))}
{scala_array('DcQLookup', dc)}
{scala_array('AcQLookup', list(ac))}
}}
'''
path = '/root/repo/src/main/scala/graft/operators/Vp8Tables.scala'
open(path, 'w').write(out)
print('wrote', path, coeff_at, bmode_at, ac_at, dc_at, upd_at)
