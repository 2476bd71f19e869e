#!/usr/bin/env python3
"""Dev-time generator for the AV1/AVIF decoder fixtures.

Encodes deterministic images with the SYSTEM libaom (public) at
surgical settings (true lossless via min_q=max_q=0, then fixed-q
lossy tiers), and pins the golden YUV planes from libdav1d — the
industry reference decoder — decoding the exact same bytes. Only the
encoded .obu streams + .golden planes are committed; the Scala
decoder (operators/Av1*.scala) must reproduce every golden
bit-exactly.

Run from the repo root:  python3 tools/gen_av1_fixtures.py
"""
import hashlib, os, struct, sys

sys.path.insert(0, os.path.dirname(__file__))
import av1_harness as H

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'av1')
os.makedirs(OUT, exist_ok=True)


def planes_i420(w, h, kind, seed=42):
    cw, ch = (w + 1) // 2, (h + 1) // 2
    if kind == 'flat':
        return bytes([128] * (w * h)), bytes([100] * (cw * ch)), bytes([200] * (cw * ch))
    if kind == 'grad':
        y = bytes(((2 * r + 3 * c) & 0xff) for r in range(h) for c in range(w))
        u = bytes((128 + r) & 0xff for r in range(ch) for _ in range(cw))
        v = bytes((120 + c // 2) & 0xff for _ in range(ch) for c in range(cw))
        return y, u, v
    if kind == 'noise':
        b = H.lcg_bytes(w * h + 2 * cw * ch, seed)
        return b[:w * h], b[w * h:w * h + cw * ch], b[w * h + cw * ch:]
    if kind == 'photo':
        # smooth ramps + soft disc + mild texture: exercises DC/smooth/
        # directional modes and real coefficient distributions
        y = bytearray(w * h)
        for r in range(h):
            for c in range(w):
                base = (120 + 60 * r // h - 40 * c // w)
                d2 = (r - h // 3) ** 2 + (c - w // 2) ** 2
                disc = 70 if d2 < (min(w, h) // 4) ** 2 else 0
                tex = ((r * 7 + c * 13) % 5) - 2
                y[r * w + c] = max(0, min(255, base + disc + tex))
        u = bytes(max(0, min(255, 110 + (30 * r // ch))) for r in range(ch) for _ in range(cw))
        v = bytes(max(0, min(255, 140 - (25 * c // cw))) for _ in range(ch) for c in range(cw))
        return bytes(y), u, v
    raise AssertionError(kind)


def write_fixture(name, w, h, kind, controls, min_q, max_q, seed=42,
                  usage=H.AOM_USAGE_ALL_INTRA):
    planes = planes_i420(w, h, kind, seed)
    obu = H.encode_av1(w, h, planes, controls, min_q=min_q, max_q=max_q, usage=usage)
    dw, dh, layout, golden = H.dav1d_decode(obu)
    assert (dw, dh) == (w, h), (name, dw, dh)
    assert layout == 1, (name, layout)  # I420
    if min_q == 0 and max_q == 0:
        assert tuple(golden) == tuple(planes), name + ": lossless round-trip broke"
    with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
        f.write(obu)
    with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
        f.write(struct.pack('<HHB', w, h, layout))
        for p in golden:
            f.write(p)
    md = hashlib.md5(b''.join(golden)).hexdigest()
    print('%-22s %4dx%-4d obu=%6dB golden md5=%s' % (name, w, h, len(obu), md))
    return obu


CPU = H.AOME_SET_CPUUSED
# Bring-up envelope: features the Scala decoder stages in later. Each
# control's effect is verified by the decoder's own header parse (a
# wrong control id would leave the seq-header bit set and the decode
# would refuse/diverge, failing Av1DecoderSpec).
# 98 = enable_filter_intra, VERIFIED by header-bit probe (tools note:
# the aomcx.h ids in av1_harness were guesses; 98 is the one id whose
# effect is proven by the seq-header bit flipping; the ALL_INTRA usage
# already defaults cdef/restoration/superres off at the seq level)
BASE = [(98, 0)]

fixtures = []
# --- stage B: true lossless (qindex 0 -> WHT4x4, no loop filters) ---
for nm, w, h, kind, cpu in [
    ('ll_flat16', 16, 16, 'flat', 6),
    ('ll_grad64', 64, 64, 'grad', 6),
    ('ll_noise64', 64, 64, 'noise', 6),
    ('ll_grad64_cpu3', 64, 64, 'grad', 3),
    ('ll_odd65x40', 65, 40, 'grad', 6),
    ('ll_photo128', 128, 128, 'photo', 5),
]:
    fixtures.append(write_fixture(nm, w, h, kind, BASE + [(CPU, cpu)], 0, 0))

# --- stage C: fixed-q lossy (DCT/ADST path, deblock + CDEF live) ---
for nm, w, h, kind, q, cpu in [
    ('q20_grad64', 64, 64, 'grad', 20, 6),
    ('q32_photo128', 128, 128, 'photo', 32, 5),
    ('q50_noise64', 64, 64, 'noise', 50, 6),
    ('q32_odd65x40', 65, 40, 'photo', 32, 6),
    ('q32_photo256', 256, 192, 'photo', 32, 6),
]:
    fixtures.append(write_fixture(nm, w, h, kind, BASE + [(CPU, cpu)], q, q))

# --- stage D: GOOD-usage encodes — aom speed-0 (slow preset, intra
# edge filter + z-order AR/BL availability live) and CDEF on
# non-64-aligned / non-8-aligned dims (partial CDEF units + the
# visible-frame deblock bound over the coded-but-cropped band) ---
CDEF = 58  # enable_cdef: behaviorally verified (seq-header bit probe)
for nm, w, h, kind, q, controls in [
    ('s0_noise64_q50', 64, 64, 'noise', 50, [(CPU, 0)]),
    ('cd_grad100x36_q50', 100, 36, 'grad', 50, [(CPU, 6), (CDEF, 1)]),
    ('cd_photo65x40_q50', 65, 40, 'photo', 50, [(CPU, 6), (CDEF, 1)]),
    ('nc_photo52x36_q50', 52, 36, 'photo', 50, [(CPU, 6), (CDEF, 0)]),
]:
    fixtures.append(write_fixture(nm, w, h, kind, controls, q, q,
                                  usage=H.AOM_USAGE_GOOD_QUALITY))

# --- stage F: superres (encoder cfg rc_superres_mode/denominator —
# fields located empirically in aom_codec_enc_cfg_t after the resize
# block; frames DECODE at the downscaled width and the normative 7.16
# upscale restores them; LR runs on the upscaled axis) ---
_orig_setup = H.EncCfg.setup
_SR_DEN = [8]


def _setup_sr(self, w, h, min_q, max_q, threads=1):
    _orig_setup(self, w, h, min_q, max_q, threads)
    if _SR_DEN[0] != 8:
        self.set_u32(19 * 4, 1)          # rc_superres_mode = FIXED
        self.set_u32(20 * 4, _SR_DEN[0])  # rc_superres_denominator
        self.set_u32(21 * 4, _SR_DEN[0])  # rc_superres_kf_denominator


H.EncCfg.setup = _setup_sr

for nm, w, h, kind, q, cpu, den, seed in [
    ('sr_photo64_d16', 64, 64, 'photo', 40, 4, 16, 42),   # 2x upscale + SGR LR
    ('sr_noise64_d12', 64, 64, 'noise', 50, 4, 12, 7),    # odd coded width, wiener y+u+v
    ('sr_photo100x36_d14', 100, 36, 'photo', 50, 6, 14, 42),  # non-8-aligned + CDEF
]:
    _SR_DEN[0] = den
    fixtures.append(write_fixture(nm, w, h, kind, [(CPU, cpu)], q, q, seed=seed,
                                  usage=H.AOM_USAGE_GOOD_QUALITY))
_SR_DEN[0] = 8

# --- stage E: loop restoration (GOOD usage cpu<=4 sets
# enable_restoration; frames large enough get WIENER/SGRPROJ units) ---
for nm, w, h, kind, q, cpu, seed in [
    ('lr_grad128_q40', 128, 128, 'grad', 40, 4, 42),       # wiener luma
    ('lr_noise128_q50', 128, 128, 'noise', 50, 4, 42),     # wiener y+u+v
    ('lr_photo256_q40', 256, 256, 'photo', 40, 4, 42),     # sgr multi-unit
    ('lr_photo320_q45', 320, 192, 'photo', 45, 4, 42),     # sgr 3x2 units
]:
    fixtures.append(write_fixture(nm, w, h, kind, [(CPU, cpu)], q, q, seed=seed,
                                  usage=H.AOM_USAGE_GOOD_QUALITY))

# --- stage G: 10-bit (profile 0 high_bitdepth). Same planes scaled to
# the 10-bit domain via the hbd lab's generators; goldens written with
# the wide format (layout bit 7, LE u16 planes). Covers lossless, the
# lossy intra chain, CDEF, real coded LR units (cpu 0 slow preset
# codes WIENER+SGR at these dims), superres, and forced film grain
# (the grain configs live in gen_av1_grain_fixtures-style surgery in
# tools/av1_hbd_lab.py runs; committed here as encoder streams only).
import importlib.util as _ilu
_spec = _ilu.spec_from_file_location('hbdlab', os.path.join(os.path.dirname(__file__), 'av1_hbd_lab.py'))
# av1_hbd_lab reads sys.argv at import; shield it
_argv = sys.argv
sys.argv = ['x', OUT]
_lab = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_lab)
sys.argv = _argv


def write_fixture_hbd(name, w, h, kind, controls, min_q, max_q, seed=42,
                      usage=H.AOM_USAGE_ALL_INTRA, sr_den=8):
    pl = _lab.planes10(w, h, kind, seed)
    if sr_den != 8:
        _SR_DEN[0] = sr_den
    try:
        obu = H.encode_av1_hbd(w, h, pl, controls, min_q=min_q, max_q=max_q, usage=usage)
    finally:
        _SR_DEN[0] = 8
    dw, dh, layout, bpc, golden = H.dav1d_decode_ex(obu)
    assert (dw, dh, bpc) == (w, h, 10), (name, dw, dh, bpc)
    if min_q == 0 and max_q == 0:
        assert all(list(golden[i]) == list(pl[i]) for i in range(3)), \
            name + ": hbd lossless round-trip broke"
    with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
        f.write(obu)
    with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
        f.write(struct.pack('<HHB', w, h, layout | 0x80))
        for p2 in golden:
            f.write(struct.pack('<%dH' % len(p2), *p2))
    md = hashlib.md5(b''.join(struct.pack('<%dH' % len(p2), *p2) for p2 in golden)).hexdigest()
    print('%-22s %4dx%-4d obu=%6dB golden md5=%s (10-bit)' % (name, w, h, len(obu), md))


# patched setup (stage F) is still installed; reuse _SR_DEN for hbd superres
write_fixture_hbd('hb_ll_grad64', 64, 64, 'grad', [(CPU, 6)], 0, 0)
write_fixture_hbd('hb_q32_photo128', 128, 128, 'photo',
                  [(CPU, 5), (H.AOME_SET_CQ_LEVEL, 32)], 32, 32)
write_fixture_hbd('hb_q50_noise64', 64, 64, 'noise',
                  [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 50)], 50, 50)
write_fixture_hbd('hb_lr_photo64_c0', 64, 64, 'photo',
                  [(CPU, 0), (H.AOME_SET_CQ_LEVEL, 5)], 5, 5)  # coded SGR+WIENER units
write_fixture_hbd('hb_odd65x40_c0', 65, 40, 'photo',
                  [(CPU, 0), (H.AOME_SET_CQ_LEVEL, 20)], 20, 20)
write_fixture_hbd('hb_sr_noise64_d12', 64, 64, 'noise',
                  [(CPU, 4), (H.AOME_SET_CQ_LEVEL, 50)], 50, 50, seed=7,
                  usage=H.AOM_USAGE_GOOD_QUALITY, sr_den=12)

# --- stage H: 4:4:4 (profile 1) and 4:2:2 (profile 2), 8- and 10-bit.
# Payloads via encode_av1_gen (g_profile + I444/I422 img formats);
# goldens from dav1d (wide format when 10-bit). cd422 pins the CDEF
# 4:2:2 direction remap; grain fixtures come from header surgery in
# gen_av1_grain_fixtures.py (see spec comments).
import importlib.util as _ilu2
_spec2 = _ilu2.spec_from_file_location('chromalab', os.path.join(os.path.dirname(__file__), 'av1_chroma_lab.py'))
_argv2 = sys.argv
sys.argv = ['x', OUT]
_chroma = _ilu2.module_from_spec(_spec2)
_spec2.loader.exec_module(_chroma)
sys.argv = _argv2
_chroma.OUT = OUT

_chroma.probe('c444_ll_grad64', 64, 64, 'grad', [(CPU, 6)], 0, 0, (0, 0))
_chroma.probe('c444_q32_photo64', 64, 64, 'photo', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 32)],
              32, 32, (0, 0))
_chroma.probe('c422_q50_noise64', 64, 64, 'noise', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 50)],
              50, 50, (1, 0))
_chroma.probe('c422_q32_odd65x40', 65, 40, 'photo', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 32)],
              32, 32, (1, 0))
_chroma.probe('cd422_n48_b8', 64, 64, 'noise',
              [(CPU, 5), (H.AOME_SET_CQ_LEVEL, 48), (H.AV1E_SET_ENABLE_RESTORATION, 0)],
              48, 48, (1, 0), usage=H.AOM_USAGE_GOOD_QUALITY)
_chroma.probe('c444_q32_photo64_b10', 64, 64, 'photo', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 32)],
              32, 32, (0, 0), bits=10)
_chroma.probe('c422_q32_photo64_b10', 64, 64, 'photo', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 32)],
              32, 32, (1, 0), bits=10)

# --- stage I: 12-bit (profile 2 twelve_bit, coded subsampling) ---
_chroma.probe('b12_420_ll_grad64', 64, 64, 'grad', [(CPU, 6)], 0, 0, (1, 1), bits=12)
_chroma.probe('b12_422_q50_noise64', 64, 64, 'noise', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 50)],
              50, 50, (1, 0), bits=12)
_chroma.probe('b12_444_q32_photo64', 64, 64, 'photo', [(CPU, 6), (H.AOME_SET_CQ_LEVEL, 32)],
              32, 32, (0, 0), bits=12)

# --- stage J: monochrome (mono_chrome=1 via the empirically-located
# cfg field at kf_max_dist+16; verified behaviorally: layout flips to
# 400 and dav1d round-trips lossless) at 8/10/12-bit ---
_cfg_probe = H.EncCfg()
_MONO_OFF = _cfg_probe.off_kf_max_dist + 16
_orig_setup2 = H.EncCfg.setup
def _setup_mono(self, w, h, min_q, max_q, threads=1):
    _orig_setup2(self, w, h, min_q, max_q, threads)
    self.set_u32(_MONO_OFF, 1)


def write_fixture_mono(name, w, h, kind, q, bits):
    H.EncCfg.setup = _setup_mono
    try:
        mx = (1 << bits) - 1
        yv = [v for v in _chroma.mkplanes(w, h, kind, (1, 1), bits)[0]]
        cw, ch = (w + 1) >> 1, (h + 1) >> 1
        dummy = [(1 << bits) >> 1] * (cw * ch)
        ctl = [(CPU, 6)] + ([(H.AOME_SET_CQ_LEVEL, q)] if q else [])
        obu = H.encode_av1_gen(w, h, (yv, dummy, dummy), ctl, q, q,
                               bit_depth=bits, sub=(1, 1))
    finally:
        H.EncCfg.setup = _orig_setup2
    dw, dh, layout, bpc, golden = H.dav1d_decode_ex(obu)
    assert (dw, dh, bpc, layout) == (w, h, bits, 0), (name, dw, dh, bpc, layout)
    if q == 0:
        assert list(golden[0]) == yv, name + ': mono lossless broke'
    wide = bits > 8
    with open(os.path.join(OUT, name + '.obu'), 'wb') as f:
        f.write(obu)
    with open(os.path.join(OUT, name + '.golden'), 'wb') as f:
        f.write(struct.pack('<HHB', w, h, 0 | (0x80 if wide else 0)))
        f.write(struct.pack('<%d%s' % (len(golden[0]), 'H' if wide else 'B'), *golden[0]))
    print('%-22s %4dx%-4d mono bits=%d obu=%dB' % (name, w, h, bits, len(obu)))


write_fixture_mono('mono8_ll_grad64', 64, 64, 'grad', 0, 8)
write_fixture_mono('mono10_q50_noise64', 64, 64, 'noise', 50, 10)
write_fixture_mono('mono12_q32_photo64', 64, 64, 'photo', 32, 12)

print('fixtures at', OUT)
