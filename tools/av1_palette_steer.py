#!/usr/bin/env python3
"""Dev-time palette-map steering lab (r12 state; see SURVEY addendum 3).

Crafts single-block 16x16 screen-content streams symbol-by-symbol
(av1_steerlib.encode_target over the engine's own msac semantics),
splices them into a real libaom header (NOTE: fh-end abs-bitpos from
AV1_TRACE is an ABSOLUTE file bit position — the frame header is
data[fpj:24], 8 bytes, NOT 24 bytes of payload), and uses dav1d's
decode as the oracle.

Findings pinned by steered variants B/C/D/E:
- prefix order confirmed: partition, skip, y mode, uv mode,
  has_palette_y, size, colors (L(bd), L(2), deltas), then the Y INDEX
  MAP INLINE (before the uv-palette bool), then uv bool, filter-intra
  (suppressed when palette), tx size.
- ns() first sample + the left-only/top-only ctx(0) wavefront rows and
  the [neighbor, ascending] order are bit-exact vs dav1d (variant E
  row 0 decodes fully as crafted).
- the INTERIOR ctx machinery (all-same -> ctx4 assumption) diverges
  from dav1d from the third interior sample on; a 5^6 ctx-class sweep
  plus order variants does not reproduce dav1d's map, so the
  divergence is in window/adaptation state or an unmodeled read — the
  next round's lever.
"""
import sys, struct
sys.path.insert(0, '/root/repo/tools'); sys.path.insert(0, 'tools')
import av1_steerlib as S
import av1_harness as H

def bits_of(v, n):
    return [('bit', (), (v >> (n - 1 - i)) & 1) for i in range(n)]

def build(target, nbytes=48):
    tile = S.encode_target(target, nbytes)
    if isinstance(tile, list): tile = bytes(tile)
    data = open('/tmp/av1sc/mp_r16_0.obu','rb').read()
    def leb(d, i):
        v = 0; sh = 0
        while True:
            b = d[i]; i += 1
            v |= (b & 0x7f) << sh; sh += 7
            if not (b & 0x80): return v, i
    i = 0; pre = b''; frame = None
    while i < len(data):
        hdr = data[i]; typ = (hdr >> 3) & 0xf
        j = i + 1 + ((hdr >> 2) & 1)
        sz, j = leb(data, j)
        if typ == 6: frame = (i, j, sz)
        else:
            if frame is None: pre += data[i:j+sz]
        i = j + sz
    fst, fpj, fsz = frame
    fh = data[fpj:24]
    payload = fh + tile
    def enc_leb(v):
        out = bytearray()
        while True:
            b = v & 0x7f; v >>= 7
            if v: out.append(b | 0x80)
            else: out.append(b); return bytes(out)
    return pre + bytes([data[fst]]) + enc_leb(len(payload)) + payload

def run(name, target, nbytes=48):
    obu = build(target, nbytes)
    open('/tmp/av1sc/%s.obu' % name,'wb').write(obu)
    w, h, layout, bpc, planes = H.dav1d_decode_ex(obu)
    with open('/tmp/av1sc/%s.golden' % name,'wb') as f:
        f.write(struct.pack('<HHB', w, h, layout))
        for p in planes: f.write(struct.pack('<%dB' % len(p), *p))
    return planes

base = [
    ('sym', ('partition', 44, 10), 0),
    ('sym', ('skip', 0, 2), 1),      # skip=1: no residual
    ('sym', ('kf_y_mode', 0, 13), 0),
    ('sym', ('uv_mode', 195, 14), 0),
]
# B: no palette, skip — expect flat 128
tB = base + [
    ('sym', ('palette_y_mode', 18, 2), 0),
    ('sym', ('palette_uv_mode', 0, 2), 0),
    ('sym', ('filter_intra', 18, 2), 0),
    ('sym', ('tx_size', 12, 3), 0),
]
p = run('mp_steerB', tB)
print('B: y uniq', sorted(set(p[0]))[:4], 'u', sorted(set(p[1]))[:3], 'v', sorted(set(p[2]))[:3])

# C: palette on, n=2 colors {0,255}, skip; map symbols all-zero in MY order
tC = base + [
    ('sym', ('palette_y_mode', 18, 2), 1),
    ('sym', ('palette_y_size', 16, 7), 0),
] + bits_of(0, 8) + bits_of(3, 2) + bits_of(254, 8) + [
    ('sym', ('palette_uv_mode', 3, 2), 0),
    ('sym', ('tx_size', 12, 3), 0),
] + bits_of(0, 1) + [
    ('sym', ('palette_y_color', (0*5 + (0 if (r == 0 or c == 0) else 4))*9, 2), 0)
    for i in range(1, 31) for (r, c) in [( i - j, j) for j in range(min(i,15), max(0,i-15)-1, -1)]
]
p = run('mp_steerC', tC, 64)
y = p[0]
print('C: y uniq', sorted(set(y))[:6])
print('C: row0', list(y[:16]))
print('C: row1', list(y[16:32]))
