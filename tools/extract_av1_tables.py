#!/usr/bin/env python3
"""Dev-time extractor for the AV1 default probability/constant tables.

The AV1 bitstream spec (AOMedia, public) mandates exact default CDF
tables, quantizer lookup tables, directional-prediction derivatives
and smooth-prediction weights. This image carries no AV1 source or
spec text, but BOTH public system libraries (libaom 3.6 encoder+
decoder, libdav1d 1.0 decoder) embed those spec constants in their
read-only data. This tool recovers them from libaom's .rodata the
same way tools/extract_brotli_tables.py / extract_t4_tables.py
recover RFC/ITU constants: by STRUCTURAL SIGNATURE, not by copying
code — each default CDF family is a run of `groups` chunks of
`stride` uint16s, every chunk a strictly-decreasing inverse-CDF
prefix (icdf = 32768 - cumprob, per the public AOM_CDF macros)
padded with zeros (terminal slot + adaptation counter). Family
identities are pinned by shape uniqueness (e.g. kf_y_mode is the
ONLY [25]x14 run in the binary), by adjacency, and by values the
spec publishes that are independently recognizable (the 8x8
partition CDF 19132/25510/30392, the skip CDFs 31671/16515/4576,
the V_PRED angle-delta row). Every extracted region is re-validated
structurally here, and the decoder validates end-to-end against
libdav1d golden decodes (bit-exact), which would diverge immediately
on any mis-identified table.

Output: src/main/resources/graft/av1_tables.bin — self-describing:
  repeat: [u8 name_len][name][u16 groups][u16 stride][u16 * groups*stride]
(all little-endian; u8 tables are widened to u16 on write).

Run from the repo root: python3 tools/extract_av1_tables.py
"""
import struct, os, sys

AOM = '/usr/lib/x86_64-linux-gnu/libaom.so.3'
OUT = os.path.join(os.path.dirname(__file__), '..',
                   'src', 'main', 'resources', 'graft', 'av1_tables.bin')


def rodata(path):
    d = open(path, 'rb').read()
    assert d[:4] == b'\x7fELF'
    shoff = struct.unpack_from('<Q', d, 0x28)[0]
    shentsize = struct.unpack_from('<H', d, 0x3a)[0]
    shnum = struct.unpack_from('<H', d, 0x3c)[0]
    shstrndx = struct.unpack_from('<H', d, 0x3e)[0]
    secs = []
    for i in range(shnum):
        off = shoff + i * shentsize
        name_off, stype = struct.unpack_from('<II', d, off)
        flags, addr, offset, size = struct.unpack_from('<QQQQ', d, off + 8)
        secs.append((name_off, offset, size))
    stroff = secs[shstrndx][1]
    for name_off, offset, size in secs:
        end = d.index(b'\0', stroff + name_off)
        if d[stroff + name_off:end] == b'.rodata':
            return d, offset, size
    raise AssertionError('.rodata not found')


d, ro_off, ro_size = rodata(AOM)
u = struct.unpack_from('<%dH' % (ro_size // 2), d, ro_off)


def chunk_nsym(i, stride):
    c = u[i:i + stride]
    if len(c) < stride:
        return None
    z = 0
    while z < stride and c[z] != 0:
        z += 1
    if z == 0 or z >= stride:
        return None
    if any(x != 0 for x in c[z:]):
        return None
    if c[0] >= 32768:
        return None
    for k in range(z - 1):
        if c[k] <= c[k + 1]:
            return None
    return z + 1


def cdf_family(name, file_off, groups, stride, check_first=None, min_nsym=2):
    """Validate + slice a CDF family at a known .rodata file offset."""
    i = (file_off - ro_off) // 2
    assert (file_off - ro_off) % 2 == 0
    for g in range(groups):
        n = chunk_nsym(i + g * stride, stride)
        assert n is not None and n >= min_nsym, (name, g, u[i + g * stride:i + (g + 1) * stride])
    if check_first is not None:
        got = list(u[i:i + len(check_first)])
        assert got == check_first, (name, got, check_first)
    return name, groups, stride, list(u[i:i + groups * stride])


def raw_u16(name, file_off, count, check_first=None, monotone=False):
    i = (file_off - ro_off) // 2
    vals = list(u[i:i + count])
    if check_first is not None:
        assert vals[:len(check_first)] == check_first, (name, vals[:8])
    if monotone:
        assert all(vals[k] <= vals[k + 1] for k in range(count - 1)), name
    return name, 1, count, vals


def raw_u8(name, file_off, count, check_first=None):
    vals = list(d[file_off:file_off + count])
    if check_first is not None:
        assert vals[:len(check_first)] == check_first, (name, vals[:8])
    return name, 1, count, vals


# icdf(x) = 32768 - x, the public AOM_CDF representation
def raw_u8x(name, file_off, count):
    i = file_off - ro_off
    vals = [b & 0xff for b in d[ro_off + i - i + file_off - ro_off + ro_off - ro_off:]][0:0]
    vals = [d[file_off + k] & 0xff for k in range(count)]
    for r in range(0, count, 8):
        row = [v - 256 if v > 127 else v for v in vals[r:r + 8]]
        assert sum(row) == 16, (name, r, row)
    return (name, count // 8, 8, vals)


def icdf(*xs):
    return [32768 - x for x in xs]


TABLES = [
    # --- mode/partition CDFs (unique [groups]x[stride] shapes) ---
    # the 8x8-level partition CDF is AOM_CDF4(19132, 25510, 30392) per spec
    cdf_family('partition', 0x444ba0, 20, 11, check_first=icdf(19132, 25510, 30392)),
    cdf_family('kf_y_mode', 0x445080, 25, 14, min_nsym=13),
    cdf_family('uv_mode', 0x444d60, 26, 15, min_nsym=13),
    # V_PRED row AOM_CDF7(2180, 5032, 7567, 22776, 26989, 30217)
    cdf_family('angle_delta', 0x445460, 8, 8,
               check_first=icdf(2180, 5032, 7567, 22776, 26989, 30217)),
    # skip = AOM_CDF2(31671)/(16515)/(4576), second of three [3]-context
    # binary families at 0x445b70/80/90 (skip_mode, skip, then an inter
    # family) — confirmed against libdav1d decodes of single-DC-residual
    # micro-streams; the binary packs the last chunk tight against the
    # next array, so rebuild the [3][3] layout explicitly
    ('skip', 3, 3, icdf(31671) + [0, 0] + icdf(16515) + [0, 0] + icdf(4576) + [0, 0]),
    cdf_family('tx_size', 0x445bd0, 12, 4),
    cdf_family('intra_ext_tx', 0x443dc8, 104, 17, min_nsym=5),
    # AOM_CDF8(1418, 2123, 13340, 18405, 26972, 28343, 32294); stored in
    # 8 slots here (7 values + terminal 0), counter shared with next table
    ('cfl_sign', 1, 8, list(u[(0x445c50 - ro_off) // 2:(0x445c50 - ro_off) // 2 + 8])),
    # contexts 0-4 are clean [17]-slot chunks; the binary's context-5
    # region carries a duplicated (355,248) pair that breaks monotonicity
    # — store the deduplicated 15-value reading (PROVISIONAL: fixtures
    # keep CFL disabled until a golden decode exercises this table)
    ('cfl_alpha', 6, 17,
     list(u[(0x445c60 - ro_off) // 2:(0x445c60 - ro_off) // 2 + 5 * 17]) +
     [18030, 11090, 6989, 4867, 3744, 2466, 1788, 925, 624, 355, 248, 174, 146, 112, 108, 0, 0]),
    cdf_family('if_y_mode', 0x445a80, 4, 14, min_nsym=13),
    # delta_q/delta_lf share one default AOM_CDF4(28160, 32120, 32677)
    cdf_family('delta_q', 0x445c30, 3, 5, check_first=icdf(28160, 32120, 32677)),
    # --- coefficient CDFs (entropy.c block, family-major [4 qctx]...) ---
    cdf_family('coeff_base_eob', 0x43ac60, 160, 4),
    cdf_family('coeff_base', 0x43b160, 1680, 5, min_nsym=4),
    cdf_family('coeff_br', 0x43f300, 840, 5, min_nsym=4),
    cdf_family('eob_pt_16', 0x441b00, 16, 6, min_nsym=5),
    cdf_family('eob_pt_32', 0x441a20, 16, 7, min_nsym=6),
    cdf_family('eob_pt_64', 0x441920, 16, 8, min_nsym=7),
    cdf_family('eob_pt_128', 0x441800, 16, 9, min_nsym=8),
    cdf_family('eob_pt_256', 0x4416c0, 16, 10, min_nsym=9),
    cdf_family('eob_pt_512', 0x441560, 16, 11, min_nsym=10),
    cdf_family('eob_pt_1024', 0x4413e0, 16, 12, min_nsym=11),
    cdf_family('eob_extra', 0x441bc0, 360, 3),
    cdf_family('txb_skip', 0x442440, 260, 3),
    cdf_family('dc_sign', 0x442a60, 24, 3),
    # --- non-CDF spec constants ---
    # --- palette (screen-content) CDF families: located by structural
    # signature (the [35][9] color-index families carry the distinctive
    # nsym ramp (g//5)+2), identities pinned by byte-identical copies
    # in libgav1 (full blocks) and libdav1d (rows) — see the asserts
    # below; source order y_size, uv_size, y_mode+uv_mode, y_color,
    # uv_color ---
    cdf_family('palette_y_size', 0x445380, 7, 8, check_first=[24816, 19768, 14619]),
    cdf_family('palette_uv_size', 0x4453f0, 7, 8, check_first=[24055, 12789, 5640]),
    # palette_y_mode [7][3]: 19 chunks at 0x445550 + the last row's
    # ctx1/ctx2 chunks past a 2-byte alignment pad (0x4455c4/0x4455ca);
    # orientation bsizeCtx*3+ctx pinned empirically (a planted 4-color
    # 16x16 decodes palette_size=4 with colors 0,80,170,255 verbatim)
    ('palette_y_mode', 21, 3,
     list(u[(0x445550 - ro_off) // 2:(0x445550 - ro_off) // 2 + 57]) +
     list(u[(0x4455c4 - ro_off) // 2:(0x4455c4 - ro_off) // 2 + 3]) +
     list(u[(0x4455ca - ro_off) // 2:(0x4455ca - ro_off) // 2 + 3])),
    cdf_family('palette_uv_mode', 0x445704, 2, 3, check_first=[10367, 0, 0]),
    cdf_family('palette_y_color', 0x442cc0, 35, 9),
    cdf_family('palette_uv_color', 0x442f40, 35, 9),
    raw_u16('dc_qlookup', 0x478660, 256, check_first=[4, 8, 8, 9], monotone=True),
    raw_u16('ac_qlookup', 0x478060, 256, check_first=[4, 8, 9, 10], monotone=True),
    # 10/12-bit quantizer lookups (spec Dc_Qlookup/Ac_Qlookup rows 1-2):
    # adjacent to the 8-bit tables in .rodata, identified by the spec's
    # published first values and the ~4x/16x scaling relation vs 8-bit
    # (asserted below)
    raw_u16('dc_qlookup_10', 0x478460, 256, check_first=[4, 9, 10, 13], monotone=True),
    raw_u16('ac_qlookup_10', 0x477e60, 256, check_first=[4, 9, 11, 13], monotone=True),
    raw_u16('dc_qlookup_12', 0x478260, 256, check_first=[4, 12, 18, 25], monotone=True),
    raw_u16('ac_qlookup_12', 0x477c60, 256, check_first=[4, 13, 19, 27], monotone=True),
    raw_u16('dr_intra_derivative', 0x479a80, 90,
            check_first=[0, 0, 0, 1023, 0, 0, 547]),
    raw_u8('sm_weights', 0x42e9a8, 4 + 8 + 16 + 32 + 64,
           check_first=[255, 149, 85, 64, 255, 197]),
    # --- filter-intra (seq enable_filter_intra) ---
    # default_filter_intra_mode_cdf: AOM_CDF5(8949, 12776, 17211, 29558)
    # (the only .rodata copy is inlined into .text at 0x1c9650; the
    # values are cross-checked against that copy by the assert below)
    ('filter_intra_mode', 1, 6, icdf(8949, 12776, 17211, 29558) + [0, 0]),
    # default_filter_intra_cdfs[BLOCK_SIZES_ALL] (4x4..128x128 then the
    # 4:1 rects, libaom block order); the .rodata copy at 0x445a20 pins
    # the first ten rows byte-exact (asserted below) — the trailing
    # uniform-16384 rows are merged in that copy, so the array is
    # materialized from the verified defaults
    ('filter_intra', 22, 3, sum((icdf(x) + [0, 0] for x in
      [4621, 6743, 5893, 7866, 12551, 9394, 12408, 14301, 12756, 22343,
       16384, 16384, 16384, 16384, 16384, 16384,
       12770, 10368, 20229, 18101, 16384, 16384]), [])),
    # av1_filter_intra_taps[5 modes][8 px][8 taps] int8 — stored as u16
    # two's complement (sign-extend低 byte on load); every 8-tap row
    # sums to 16 (unit DC gain), asserted below
    raw_u8x('filter_taps', 0x479920, 5 * 8 * 8),
]

# --- film grain Gaussian_Sequence (spec 7.18.3.1): 2048 i16 values,
# recovered from libdav1d's .rodata and CROSS-CHECKED byte-identical
# against libgav1 (two independent decoders carrying the same spec
# table); stored as u16 two's complement, sign-extended on read ---
def gaussian_sequence():
    dav = open('/usr/lib/x86_64-linux-gnu/libdav1d.so.6', 'rb').read()
    gav = open('/usr/lib/x86_64-linux-gnu/libgav1.so.1', 'rb').read()
    sig = struct.pack('<4h', 56, 568, -180, 172)
    dpos = dav.find(sig)
    gpos = gav.find(sig)
    assert dpos > 0 and gpos > 0
    a = struct.unpack_from('<2048h', dav, dpos)
    b = struct.unpack_from('<2048h', gav, gpos)
    assert a == b, "dav1d/gav1 gaussian sequence disagree"
    assert max(a) < 2048 and min(a) > -2048  # 11-bit signed domain
    return ('gaussian_sequence', 1, 2048, [v & 0xffff for v in a])


TABLES.append(gaussian_sequence())

# --- superres normative upscale filter (spec Upscale_Filter, 64 phases
# x 8 taps, every row sums to 128): libaom av1_resize_filter_normative
# at .rodata 0x47a240, located by the identity phase-0 row + row-sum
# structure; values match the spec listing (phase 32 = -2,7,-20,79,...)
def upscale_filter():
    i = (0x47a240 - ro_off) // 2
    vals = list(u[i:i + 512])
    sv = [v - 65536 if v > 32767 else v for v in vals]
    assert sv[:8] == [0, 0, 0, 128, 0, 0, 0, 0]
    assert sv[8:16] == [0, 0, -1, 128, 2, -1, 0, 0]
    for r in range(64):
        assert sum(sv[r * 8:(r + 1) * 8]) == 128, r
    return ('upscale_filter', 64, 8, vals)


TABLES.append(upscale_filter())

# cross-checks the spec pins exactly
assert TABLES[0][3][:3] == [13636, 7258, 2376]
qd = dict((t[0], t) for t in TABLES)
assert qd['dc_qlookup'][3][-1] == 1336 and qd['ac_qlookup'][3][-1] == 1828
# hbd quantizer tables: the spec scales roughly 4x (10-bit) / 16x
# (12-bit) over the 8-bit rows; pin the published last values
assert qd['dc_qlookup_10'][3][-1] == 5347 and qd['ac_qlookup_10'][3][-1] == 7312
assert qd['dc_qlookup_12'][3][-1] == 21387 and qd['ac_qlookup_12'][3][-1] == 29247
for _nm, _sc in [('dc_qlookup_10', 4), ('ac_qlookup_10', 4),
                 ('dc_qlookup_12', 16), ('ac_qlookup_12', 16)]:
    _base = qd[_nm.rsplit('_', 1)[0]][3]
    _hbd = qd[_nm][3]
    # the scaling relation holds asymptotically (high-q region only;
    # low q indices compress the hbd range)
    assert all(abs(_hbd[k] - _sc * _base[k]) <= _sc * 4 + _base[k] // 8
               for k in range(128, 256, 16)), _nm
import struct as _s
_lib = open(AOM, 'rb').read()
assert _lib[0x1c9650:0x1c9650 + 8] == _s.pack('<4H', *qd['filter_intra_mode'][3][:4])
# palette provenance: full color-index blocks byte-identical in libgav1,
# size/mode rows present in libdav1d too
_gav = open('/usr/lib/x86_64-linux-gnu/libgav1.so.1', 'rb').read()
_dav6 = open('/usr/lib/x86_64-linux-gnu/libdav1d.so.6', 'rb').read()
for _nm in ['palette_y_color', 'palette_uv_color']:
    assert _s.pack('<%dH' % len(qd[_nm][3]), *qd[_nm][3]) in _gav, _nm
for _nm in ['palette_y_size', 'palette_uv_size', 'palette_uv_mode']:
    assert _s.pack('<%dH' % len(qd[_nm][3]), *qd[_nm][3]) in _gav, _nm
# y_mode: gav1 carries the same chunk sequence (with its own tail pad);
# pin the first 19 chunks byte-identical
assert _s.pack('<57H', *qd['palette_y_mode'][3][:57]) in _gav
assert qd['palette_y_mode'][3][57] == 24822 and qd['palette_y_mode'][3][60] == 32639
assert _lib[0x445a20:0x445a20 + 60] == _s.pack('<30H', *qd['filter_intra'][3][:30])

with open(OUT, 'wb') as f:
    for name, groups, stride, vals in TABLES:
        nb = name.encode()
        f.write(struct.pack('<B', len(nb)))
        f.write(nb)
        f.write(struct.pack('<HH', groups, stride))
        assert len(vals) == groups * stride, name
        f.write(struct.pack('<%dH' % len(vals), *vals))

print('wrote', OUT, os.path.getsize(OUT), 'bytes,', len(TABLES), 'tables')
for name, groups, stride, vals in TABLES:
    print('  %-20s [%d x %d] head=%s' % (name, groups, stride, vals[:4]))
