#!/usr/bin/env python3
"""Force film grain onto a still AV1 stream: flip the seq header's
film_grain_params_present bit and append film_grain_params bits at the
frame-header end. Tile bits untouched; dav1d's decode = golden for the
grain synthesis."""
import os, struct, sys
sys.path.insert(0, '/root/repo/tools')
import av1_harness as H

src, fgbits, fhend, outdir, label = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5]
name = os.path.basename(src)[:-4] + '_' + label
data = bytearray(open(src, 'rb').read())

def leb(d, i):
    v = 0; sh = 0
    while True:
        b = d[i]; i += 1
        v |= (b & 0x7f) << sh; sh += 7
        if not (b & 0x80): return v, i

i = 0
obus = []
while i < len(data):
    hdr = data[i]; typ = (hdr >> 3) & 0xf
    has_ext = (hdr >> 2) & 1
    j = i + 1 + has_ext
    sz, j = leb(data, j)
    obus.append((typ, i, j, sz))
    i = j + sz

seq = [o for o in obus if o[0] == 1][0]
payload = data[seq[2]:seq[2] + seq[3]]
pos = [0]
bits = []
for b in payload:
    for k in range(8): bits.append((b >> (7 - k)) & 1)
def f(n):
    v = 0
    for _ in range(n):
        v = (v << 1) | bits[pos[0]]; pos[0] += 1
    return v
prof = f(3); still = f(1); reduced = f(1)
if reduced: f(5)
else:
    assert f(1) == 0
    f(1)
    n_ops = f(5) + 1
    for _ in range(n_ops):
        f(12)
        if f(5) > 7: f(1)
wb = f(4) + 1; hb = f(4) + 1; f(wb); f(hb)
if not reduced:
    if f(1): f(7)
f(3)
if not reduced:
    f(4)
    oh = f(1)
    if oh: f(2)
    fsc = 2 if f(1) else f(1)
    if fsc > 0:
        if f(1) == 0: f(1)
    if oh: f(3)
f(3)  # superres, cdef, restoration
# color_config (mirrors the engine's Av1Headers parse; 8/10-bit)
hbd = f(1)
bd = 8
if prof == 2 and hbd:
    bd = 12 if f(1) else 10
elif hbd:
    bd = 10
mono = f(1) if prof != 1 else 0
if f(1):  # color_description_present
    cp = f(8); tc = f(8); mc = f(8)
    if not mono and cp == 1 and tc == 13 and mc == 0:
        pass
    else:
        f(1)  # color_range
        if prof == 2 and bd == 12 and not mono:
            if f(1): f(1)  # coded subsampling
        if not mono and prof == 0: f(2)  # chroma_sample_position (4:2:0)
else:
    f(1)
    if prof == 2 and bd == 12 and not mono:
        if f(1): f(1)
    if not mono and prof == 0: f(2)
if not mono: f(1)  # separate_uv_delta_q
fg_bitpos = pos[0]
assert f(1) == 0, "film grain already on"
bi = seq[2] + (fg_bitpos >> 3)
data[bi] |= (1 << (7 - (fg_bitpos & 7)))

fr = [o for o in obus if o[0] == 6][0]
ostart, pstart, psz = fr[1], fr[2], fr[3]
fpayload = bytes(data[pstart:pstart + psz])
fbits = []
for b in fpayload:
    for k in range(8): fbits.append((b >> (7 - k)) & 1)
hend = fhend - pstart * 8
hdr_bits = fbits[:hend] + [int(c) for c in fgbits]
while len(hdr_bits) % 8: hdr_bits.append(0)
tiles = fpayload[(hend + 7) // 8:]
np_ = bytearray()
for k in range(0, len(hdr_bits), 8):
    np_.append(int(''.join(map(str, hdr_bits[k:k+8])), 2))
np_ += tiles

def enc_leb(v):
    out = bytearray()
    while True:
        b = v & 0x7f; v >>= 7
        if v: out.append(b | 0x80)
        else: out.append(b); return bytes(out)

new = bytes(data[:ostart]) + bytes([data[ostart]]) + \
      (bytes([data[ostart+1]]) if (data[ostart]>>2)&1 else b'') + \
      enc_leb(len(np_)) + bytes(np_) + bytes(data[pstart+psz:])
try:
    w, h, layout, bpc, planes = H.dav1d_decode_ex(new)
except Exception as e:
    print('DAV1D-REFUSED:', name, e)
    sys.exit(1)
os.makedirs(outdir, exist_ok=True)
open(os.path.join(outdir, name + '.obu'), 'wb').write(new)
with open(os.path.join(outdir, name + '.golden'), 'wb') as f2:
    if bpc == 8:
        f2.write(struct.pack('<HHB', w, h, layout))
        for pl in planes: f2.write(struct.pack('<%dB' % len(pl), *pl))
    else:
        f2.write(struct.pack('<HHB', w, h, layout | 0x80))
        for pl in planes: f2.write(struct.pack('<%dH' % len(pl), *pl))
print('patched %s -> %s %dx%d bpc=%d' % (name, outdir, w, h, bpc))

# ---------------------------------------------------------------------
# Committed fixture configs (invoked when run without args): film grain
# forced onto committed lossy fixtures via header surgery — grain is a
# pure output transform, so the tile decode is untouched and dav1d's
# output is a direct golden for the synthesis. Bit layouts follow spec
# 5.9.30 (apply_grain, seed, y/cb/cr point sets, scaling shift, AR lag
# + coeffs, shifts, mults, overlap, clip).
def _fb(v, n): return format(v, '0%db' % n)

def _flat(s): return _fb(0, 8) + _fb(s, 8) + _fb(255, 8) + _fb(s, 8)

FIXTURE_CONFIGS = [
    # (base fixture, fhend bitpos, label, film_grain_params bits)
    ('q20_grad64', 198, 'fg_ar_ovl',   # lag1 AR + overlap + sloped lut, shift 9
     '1' + _fb(0x0abc, 16) + _fb(2, 4) + _fb(0, 8) + _fb(40, 8) + _fb(255, 8) + _fb(90, 8) +
     '0' + _fb(0, 4) + _fb(0, 4) + '01' + '01' +
     ''.join(_fb(c, 8) for c in (148, 118, 158, 133)) + '00' + '00' + '1' + '0'),
    ('q20_grad64', 198, 'fg_csfl',     # chroma scaling from luma
     '1' + _fb(0x7777, 16) + _fb(2, 4) + _flat(64) + '1' + '00' + '00' +
     _fb(128, 8) + _fb(128, 8) + '00' + '00' + '0' + '0'),
    ('q50_noise64', 198, 'fg_full',    # lag2 + cb/cr points + mults + overlap + clip
     '1' + _fb(0x5a5a, 16) + _fb(2, 4) + _flat(50) + '0' +
     _fb(2, 4) + _flat(70) + _fb(2, 4) + _flat(60) + '00' + '10' +
     ''.join(_fb(c, 8) for c in (140, 122, 132, 137, 125, 135, 117, 130, 133, 120, 131, 134)) +
     ''.join(_fb(c, 8) for c in (132,) * 12 + (148,)) +
     ''.join(_fb(c, 8) for c in (123,) * 12 + (103,)) + '00' + '00' +
     _fb(128, 8) + _fb(192, 8) + _fb(256, 9) + _fb(128, 8) + _fb(64, 8) + _fb(256, 9) + '1' + '1'),
    ('q32_odd65x40', 199, 'fg_odd',    # odd dims, minimal grain
     '1' + _fb(0x1234, 16) + _fb(2, 4) + _flat(64) + '0' + _fb(0, 4) + _fb(0, 4) +
     '00' + '00' + '00' + '00' + '0' + '0'),
]

def gen_fixtures():
    import subprocess
    base = os.path.dirname(__file__)
    outdir = os.path.join(base, '..', 'src', 'test', 'resources', 'av1')
    for fixture, fhend, label, bits in FIXTURE_CONFIGS:
        srcp = os.path.join(outdir, fixture + '.obu')
        subprocess.run([sys.executable, __file__, srcp, bits, str(fhend), outdir, label],
                       check=True)
