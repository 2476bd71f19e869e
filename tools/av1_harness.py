#!/usr/bin/env python3
"""Dev-time AV1 encode/decode harness over the SYSTEM libaom + libdav1d.

Used by gen_av1_fixtures.py to produce the AVIF-decoder bring-up
bitstreams (libaom encodes with surgical feature control) and their
golden YUV planes (libdav1d's own decode — the reference decoder).
Only encoded fixtures + printed pins are committed; this harness runs
at dev time only.

ABI discipline: libaom's aom_codec_enc_cfg_t is a large struct whose
layout we do NOT hardcode. Field offsets are discovered EMPIRICALLY:
aom_codec_enc_config_default() fills known default values (g_w=320,
g_h=240, timebase 1/30, rc_min/max_quantizer 0/63 ...) whose
positions we locate by signature, then verify by re-reading after a
set. Control-knob effects (lossless, monochrome, cdef ...) are each
verified behaviorally (e.g. lossless must round-trip bit-exact
through dav1d) before any fixture is trusted.
"""
import ctypes, struct, sys

aom = ctypes.CDLL("libaom.so.3")
dav = ctypes.CDLL("libdav1d.so.6")

# ---------------------------------------------------------------- aom

AOM_IMG_FMT_I420 = 0x102          # planar 4:2:0 (AOM_IMG_FMT_PLANAR|2)
AOM_USAGE_GOOD_QUALITY = 0
AOM_USAGE_ALL_INTRA = 2

aom.aom_codec_av1_cx.restype = ctypes.c_void_p
aom.aom_codec_err_to_string.restype = ctypes.c_char_p
aom.aom_codec_enc_config_default.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint]
aom.aom_codec_enc_init_ver.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_long, ctypes.c_int]
aom.aom_codec_encode.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                                 ctypes.c_ulong, ctypes.c_long]
aom.aom_codec_get_cx_data.restype = ctypes.c_void_p
aom.aom_codec_get_cx_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
aom.aom_img_alloc.restype = ctypes.c_void_p
aom.aom_img_alloc.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint,
                              ctypes.c_uint, ctypes.c_uint]
aom.aom_codec_version.restype = ctypes.c_int
aom.aom_codec_control.argtypes = [ctypes.c_void_p, ctypes.c_int]

CFG_BYTES = 8192   # generous; real struct is ~3KB

def _u32s(buf):
    return struct.unpack_from('<%dI' % (len(buf) // 4), buf, 0)

class EncCfg:
    """Empirically-located fields of aom_codec_enc_cfg_t."""
    def __init__(self):
        iface = aom.aom_codec_av1_cx()
        buf = ctypes.create_string_buffer(CFG_BYTES)
        rc = aom.aom_codec_enc_config_default(iface, buf, AOM_USAGE_GOOD_QUALITY)
        assert rc == 0, rc
        u = _u32s(buf.raw)
        # g_w=320, g_h=240 adjacent
        cand = [i for i in range(len(u) - 1) if u[i] == 320 and u[i + 1] == 240]
        assert len(cand) == 1, cand
        self.off_w = cand[0] * 4
        # g_usage is field 0; g_profile two before g_w (g_usage,g_threads,g_profile,g_w)
        assert u[cand[0] - 1] == 0  # g_profile default 0
        # timebase num=1 den=30 adjacent, after g_h
        tb = [i for i in range(cand[0], len(u) - 1) if u[i] == 1 and u[i + 1] == 30]
        assert tb, "timebase not found"
        self.off_timebase = tb[0] * 4
        # rc_min_quantizer=0 rc_max_quantizer=63 adjacent... locate 63 after
        # rc_target_bitrate=256 region: find ... 256, x, 63 pattern
        q = [i for i in range(tb[0], len(u) - 2)
             if u[i] == 256 and u[i + 2] == 63]
        assert len(q) >= 1, "rc quantizer block not found"
        self.off_target_bitrate = q[0] * 4
        self.off_min_q = (q[0] + 1) * 4
        self.off_max_q = (q[0] + 2) * 4
        # usage ALL_INTRA differs from GOOD in g_usage (field 0) and a few rc
        # fields; locate g_lag_in_frames: GOOD default 19, ALL_INTRA 0
        buf2 = ctypes.create_string_buffer(CFG_BYTES)
        assert aom.aom_codec_enc_config_default(iface, buf2, AOM_USAGE_ALL_INTRA) == 0
        u2 = _u32s(buf2.raw)
        diffs = [i for i in range(min(len(u), len(u2))) if u[i] != u2[i]]
        lag = [i for i in diffs if u[i] == 35 and u2[i] == 0]
        assert len(lag) == 1, (diffs[:20], lag)
        self.off_lag = lag[0] * 4
        # kf_max_dist: GOOD 9999, ALL_INTRA 0
        kf = [i for i in diffs if u[i] == 9999 and u2[i] == 0]
        assert len(kf) >= 1
        self.off_kf_max_dist = kf[0] * 4
        self.off_kf_min_dist = self.off_kf_max_dist - 4
        # kf_mode: AOM_KF_AUTO=1 GOOD, DISABLED=0 ALL_INTRA, just before kf_min_dist
        self.off_kf_mode = self.off_kf_min_dist - 4
        assert u[self.off_kf_mode // 4] == 1 and u2[self.off_kf_mode // 4] == 0
        self.iface = iface
        self.buf = buf2  # ALL_INTRA base
        # monochrome: a zero u32 we can only locate via aomenc source order —
        # instead of guessing, we leave monochrome to the encoder default (0)
        # and synthesize monochrome streams via usage flags when needed.

    def set_u32(self, off, v):
        struct.pack_into('<I', self.buf, off, v)

    def setup(self, w, h, min_q, max_q, threads=1):
        self.set_u32(self.off_w, w)
        self.set_u32(self.off_w + 4, h)
        self.set_u32(self.off_min_q, min_q)
        self.set_u32(self.off_max_q, max_q)
        self.set_u32(self.off_lag, 0)
        self.set_u32(4, threads)   # g_threads is field 1 (g_usage, g_threads)
        self.set_u32(self.off_target_bitrate, 0)  # 0 + CQ → constant quality

# aome_enc_control_id values (public aomcx.h, stable since libaom 1.0):
AOME_SET_CPUUSED = 13
AOME_SET_CQ_LEVEL = 25
AV1E_SET_LOSSLESS = 91
AV1E_SET_ENABLE_CDEF = 92
AV1E_SET_ENABLE_RESTORATION = 93
AV1E_SET_ENABLE_RECT_PARTITIONS = 96
AV1E_SET_ENABLE_AB_PARTITIONS = 97
AV1E_SET_ENABLE_1TO4_PARTITIONS = 98
AV1E_SET_ENABLE_INTRA_EDGE_FILTER = 109
AV1E_SET_ENABLE_TX64 = 106
AV1E_SET_ENABLE_FLIP_IDTX = 107
AV1E_SET_ENABLE_FILTER_INTRA = 118
AV1E_SET_ENABLE_SMOOTH_INTRA = 119
AV1E_SET_ENABLE_PAETH_INTRA = 120
AV1E_SET_ENABLE_CFL_INTRA = 121
AV1E_SET_ENABLE_SUPERRES = 115
AV1E_SET_ENABLE_PALETTE = 123
AV1E_SET_ENABLE_INTRABC = 124
AV1E_SET_ENABLE_ANGLE_DELTA = 125
AV1E_SET_INTRA_DEFAULT_TX_ONLY = 130

def encode_av1(w, h, planes, controls, min_q=0, max_q=63, usage=AOM_USAGE_ALL_INTRA):
    """planes = (y, u, v) bytes at 4:2:0. Returns the raw OBU TU bytes."""
    cfg = EncCfg()
    cfg.set_u32(0, usage)
    cfg.setup(w, h, min_q, max_q)
    ctx = ctypes.create_string_buffer(256)   # aom_codec_ctx_t is ~60 bytes
    # AOM_ENCODER_ABI_VERSION for 3.6: not needed if we pass the one the lib
    # expects; probe 固定 candidates until init succeeds.
    ok = False
    for abi in [25] + list(range(3, 40)):
        rc = aom.aom_codec_enc_init_ver(ctx, cfg.iface, cfg.buf, 0, abi)
        if rc == 0:
            ok = True
            break
    assert ok, "enc init failed for all ABI candidates"
    for cid, val in controls:
        rc = aom.aom_codec_control(ctx, cid, ctypes.c_int(val))
        assert rc == 0, ("control", cid, val, rc)
    img = aom.aom_img_alloc(None, AOM_IMG_FMT_I420, w, h, 32)
    assert img
    # aom_image_t: fmt(u32) cs(u32) range(u32) w h bit_depth d_w d_h x_chroma_shift
    # y_chroma_shift planes[3](ptr) stride[3](int) ... locate planes by probing:
    # aom_img_alloc sets planes to inside the allocated buffer. We read the
    # struct as u64s and take the first 3 plausible pointers.
    raw = ctypes.string_at(img, 160)
    qw = struct.unpack('<20Q', raw)
    ptrs = [(i, v) for i, v in enumerate(qw) if v > 0x7f0000000000 or (v > 0x500000000000 and v % 16 == 0)]
    # more robust: planes[] are 3 consecutive non-null qwords with ascending values
    pi = None
    for i in range(len(qw) - 2):
        a, b, c = qw[i], qw[i + 1], qw[i + 2]
        if a and b and c and a < b < c and (b - a) < (1 << 32) and (c - b) < (1 << 32):
            pi = i
            break
    assert pi is not None, [hex(x) for x in qw]
    py, pu, pv = qw[pi], qw[pi + 1], qw[pi + 2]
    st = struct.unpack_from('<4i', raw, (pi + 3) * 8)
    sy, su = st[0], st[1]
    assert sy >= w and su >= (w + 1) // 2, (sy, su)
    y, u, v = planes
    ch, cw = (h + 1) // 2, (w + 1) // 2
    for r in range(h):
        ctypes.memmove(py + r * sy, bytes(y[r * w:(r + 1) * w]), w)
    for r in range(ch):
        ctypes.memmove(pu + r * su, bytes(u[r * cw:(r + 1) * cw]), cw)
        ctypes.memmove(pv + r * su, bytes(v[r * cw:(r + 1) * cw]), cw)
    rc = aom.aom_codec_encode(ctx, img, 0, 1, 0)
    assert rc == 0, rc
    out = b''
    it = ctypes.c_void_p(None)
    while True:
        pkt = aom.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind, = struct.unpack_from('<i', ctypes.string_at(pkt, 24), 0)
        if kind == 0:  # AOM_CODEC_CX_FRAME_PKT
            buf_ptr, sz = struct.unpack_from('<QQ', ctypes.string_at(pkt, 24), 8)
            out += ctypes.string_at(buf_ptr, sz)
    # flush
    rc = aom.aom_codec_encode(ctx, None, 0, 1, 0)
    it = ctypes.c_void_p(None)
    while True:
        pkt = aom.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind, = struct.unpack_from('<i', ctypes.string_at(pkt, 24), 0)
        if kind == 0:
            buf_ptr, sz = struct.unpack_from('<QQ', ctypes.string_at(pkt, 24), 8)
            out += ctypes.string_at(buf_ptr, sz)
    aom.aom_codec_destroy(ctx)
    aom.aom_img_free(ctypes.c_void_p(img))
    assert out, "no encoded output"
    return out

# -------------------------------------------------------------- dav1d

dav.dav1d_version.restype = ctypes.c_char_p
dav.dav1d_default_settings.argtypes = [ctypes.c_void_p]
dav.dav1d_open.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
dav.dav1d_data_create.restype = ctypes.c_void_p
dav.dav1d_data_create.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
dav.dav1d_send_data.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
dav.dav1d_get_picture.argtypes = [ctypes.c_void_p, ctypes.c_void_p]

def dav1d_decode(obu_bytes):
    """Decode one still AV1 stream; returns (w, h, layout, [plane bytes])."""
    st = ctypes.create_string_buffer(512)
    dav.dav1d_default_settings(st)
    ctxp = ctypes.c_void_p(None)
    rc = dav.dav1d_open(ctypes.byref(ctxp), st)
    assert rc == 0, rc
    data = ctypes.create_string_buffer(128)  # Dav1dData
    ptr = dav.dav1d_data_create(data, len(obu_bytes))
    assert ptr
    ctypes.memmove(ptr, obu_bytes, len(obu_bytes))
    rc = dav.dav1d_send_data(ctxp, data)
    assert rc == 0, rc
    pic = ctypes.create_string_buffer(512)   # Dav1dPicture
    rc = dav.dav1d_get_picture(ctxp, pic)
    if rc == -11:  # EAGAIN: send a flush by sending nothing and retry
        rc = dav.dav1d_get_picture(ctxp, pic)
    assert rc == 0, rc
    raw = pic.raw
    # layout: seq_hdr*, frame_hdr*, data[3], stride[2], p{layout,w,h,bpc}
    d0, d1, d2 = struct.unpack_from('<3Q', raw, 16)
    s0, s1 = struct.unpack_from('<2q', raw, 40)
    w, h, layout, bpc = struct.unpack_from('<4i', raw, 56)
    assert 0 < w <= 1 << 16 and 0 < h <= 1 << 16 and bpc == 8, (w, h, bpc)
    planes = []
    sub = {0: None, 1: (1, 1), 2: (1, 0), 3: (0, 0)}[layout]  # 400,420,422,444 → (sx,sy)
    ybytes = b''.join(ctypes.string_at(d0 + r * s0, w) for r in range(h))
    planes.append(ybytes)
    if layout != 0:
        sx, sy = sub
        cw, chh = (w + sx) >> sx, (h + sy) >> sy
        for dptr in (d1, d2):
            planes.append(b''.join(ctypes.string_at(dptr + r * s1, cw) for r in range(chh)))
    dav.dav1d_picture_unref(pic)
    dav.dav1d_close(ctypes.byref(ctxp))
    return w, h, layout, planes

def lcg_bytes(n, seed=42):
    x = seed
    out = bytearray()
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        out.append((x >> 33) & 0xff)
    return bytes(out)

def gradient_planes(w, h):
    y = bytearray(w * h)
    for r in range(h):
        for c in range(w):
            y[r * w + c] = (2 * r + 3 * c) & 0xff
    cw, ch = (w + 1) // 2, (h + 1) // 2
    u = bytes((128 + r) & 0xff for r in range(ch) for _ in range(cw))
    v = bytes((120 + c // 2) & 0xff for _ in range(ch) for c in range(cw))
    return bytes(y), u, v

if __name__ == '__main__':
    print("aom version: %x" % aom.aom_codec_version())
    print("dav1d:", dav.dav1d_version())
    w, h = 64, 64
    y, u, v = gradient_planes(w, h)
    # min_q=max_q=0 → qindex 0 → CodedLossless per spec (no control-id trust)
    obu = encode_av1(w, h, (y, u, v), [(AOME_SET_CPUUSED, 6)], min_q=0, max_q=0)
    print("lossless obu bytes:", len(obu))
    dw, dh, layout, planes = dav1d_decode(obu)
    print("decoded %dx%d layout=%d planes=%s" % (dw, dh, layout, [len(p) for p in planes]))
    assert (dw, dh) == (w, h)
    assert planes[0] == y and planes[1] == u and planes[2] == v, \
        "LOSSLESS ROUND-TRIP FAILED (control id wrong?)"
    print("lossless round-trip EXACT — AV1E_SET_LOSSLESS verified")

# ----------------------------------------------------- high bitdepth

AOM_IMG_FMT_HIGHBITDEPTH = 0x800
AOM_IMG_FMT_I42016 = AOM_IMG_FMT_I420 | AOM_IMG_FMT_HIGHBITDEPTH
AOM_CODEC_USE_HIGHBITDEPTH = 0x40000

def encode_av1_hbd(w, h, planes16, controls, min_q=0, max_q=63,
                   usage=AOM_USAGE_ALL_INTRA, bit_depth=10):
    """planes16 = (y, u, v) as flat lists/arrays of ints (< 1<<bit_depth)
    at 4:2:0. Returns the raw OBU TU bytes (profile 0, 10-bit)."""
    assert bit_depth in (10, 12)
    cfg = EncCfg()
    cfg.set_u32(0, usage)
    cfg.setup(w, h, min_q, max_q)
    # g_bit_depth / g_input_bit_depth are the two u32s directly before
    # g_timebase (aom_encoder.h order: ... g_forced_max_frame_height,
    # g_bit_depth, g_input_bit_depth, g_timebase), defaults (8, 8).
    u = _u32s(cfg.buf.raw)
    bd_off = cfg.off_timebase - 8
    assert u[bd_off // 4] == 8 and u[bd_off // 4 + 1] == 8, \
        "g_bit_depth defaults not found"
    cfg.set_u32(bd_off, bit_depth)
    cfg.set_u32(bd_off + 4, bit_depth)
    ctx = ctypes.create_string_buffer(256)
    ok = False
    for abi in [25] + list(range(3, 40)):
        rc = aom.aom_codec_enc_init_ver(ctx, cfg.iface, cfg.buf,
                                        AOM_CODEC_USE_HIGHBITDEPTH, abi)
        if rc == 0:
            ok = True
            break
    assert ok, "hbd enc init failed for all ABI candidates"
    for cid, val in controls:
        rc = aom.aom_codec_control(ctx, cid, ctypes.c_int(val))
        assert rc == 0, ("control", cid, val, rc)
    img = aom.aom_img_alloc(None, AOM_IMG_FMT_I42016, w, h, 32)
    assert img
    raw = ctypes.string_at(img, 160)
    qw = struct.unpack('<20Q', raw)
    pi = None
    for i in range(len(qw) - 2):
        a, b, c = qw[i], qw[i + 1], qw[i + 2]
        if a and b and c and a < b < c and (b - a) < (1 << 32) and (c - b) < (1 << 32):
            pi = i
            break
    assert pi is not None, [hex(x) for x in qw]
    py, pu, pv = qw[pi], qw[pi + 1], qw[pi + 2]
    st = struct.unpack_from('<4i', raw, (pi + 3) * 8)
    sy, su = st[0], st[1]   # strides in BYTES
    ch, cw = (h + 1) // 2, (w + 1) // 2
    assert sy >= 2 * w and su >= 2 * cw, (sy, su)
    y, uu, vv = planes16
    for r in range(h):
        ctypes.memmove(py + r * sy, struct.pack('<%dH' % w, *y[r * w:(r + 1) * w]), 2 * w)
    for r in range(ch):
        ctypes.memmove(pu + r * su, struct.pack('<%dH' % cw, *uu[r * cw:(r + 1) * cw]), 2 * cw)
        ctypes.memmove(pv + r * su, struct.pack('<%dH' % cw, *vv[r * cw:(r + 1) * cw]), 2 * cw)
    out = b''
    rc = aom.aom_codec_encode(ctx, img, 0, 1, 0)
    assert rc == 0, rc
    it = ctypes.c_void_p(None)
    while True:
        pkt = aom.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind, = struct.unpack_from('<i', ctypes.string_at(pkt, 24), 0)
        if kind == 0:
            buf_ptr, sz = struct.unpack_from('<QQ', ctypes.string_at(pkt, 24), 8)
            out += ctypes.string_at(buf_ptr, sz)
    rc = aom.aom_codec_encode(ctx, None, 0, 1, 0)
    it = ctypes.c_void_p(None)
    while True:
        pkt = aom.aom_codec_get_cx_data(ctx, ctypes.byref(it))
        if not pkt:
            break
        kind, = struct.unpack_from('<i', ctypes.string_at(pkt, 24), 0)
        if kind == 0:
            buf_ptr, sz = struct.unpack_from('<QQ', ctypes.string_at(pkt, 24), 8)
            out += ctypes.string_at(buf_ptr, sz)
    aom.aom_codec_destroy(ctx)
    aom.aom_img_free(ctypes.c_void_p(img))
    assert out, "no encoded output"
    return out

def dav1d_decode_ex(obu_bytes):
    """Decode one still AV1 stream at any bpc; returns
    (w, h, layout, bpc, [plane int tuples])."""
    st = ctypes.create_string_buffer(512)
    dav.dav1d_default_settings(st)
    ctxp = ctypes.c_void_p(None)
    rc = dav.dav1d_open(ctypes.byref(ctxp), st)
    assert rc == 0, rc
    data = ctypes.create_string_buffer(128)
    ptr = dav.dav1d_data_create(data, len(obu_bytes))
    assert ptr
    ctypes.memmove(ptr, obu_bytes, len(obu_bytes))
    rc = dav.dav1d_send_data(ctxp, data)
    assert rc == 0, rc
    pic = ctypes.create_string_buffer(512)
    rc = dav.dav1d_get_picture(ctxp, pic)
    if rc == -11:
        rc = dav.dav1d_get_picture(ctxp, pic)
    assert rc == 0, rc
    raw = pic.raw
    d0, d1, d2 = struct.unpack_from('<3Q', raw, 16)
    s0, s1 = struct.unpack_from('<2q', raw, 40)
    w, h, layout, bpc = struct.unpack_from('<4i', raw, 56)
    assert 0 < w <= 1 << 16 and 0 < h <= 1 << 16 and bpc in (8, 10, 12), (w, h, bpc)
    nb = 1 if bpc == 8 else 2
    def rows(dptr, stride, ww, hh):
        out = []
        for r in range(hh):
            b = ctypes.string_at(dptr + r * stride, ww * nb)
            out.extend(struct.unpack('<%d%s' % (ww, 'B' if nb == 1 else 'H'), b))
        return tuple(out)
    planes = [rows(d0, s0, w, h)]
    if layout != 0:
        sx, sy = {1: (1, 1), 2: (1, 0), 3: (0, 0)}[layout]
        cw, chh = (w + sx) >> sx, (h + sy) >> sy
        for dptr in (d1, d2):
            planes.append(rows(dptr, s1, cw, chh))
    dav.dav1d_picture_unref(pic)
    dav.dav1d_close(ctypes.byref(ctxp))
    return w, h, layout, bpc, planes

def lcg_words(n, bits=10, seed=42):
    x = seed
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        out.append((x >> 33) & ((1 << bits) - 1))
    return out

# ------------------------------------------- arbitrary chroma formats

AOM_IMG_FMT_I422 = 0x105
AOM_IMG_FMT_I444 = 0x106

def encode_av1_gen(w, h, planes, controls, min_q=0, max_q=63,
                   usage=AOM_USAGE_ALL_INTRA, bit_depth=8, sub=(1, 1)):
    """General encode: sub=(sx,sy) chooses 4:2:0/(1,1), 4:2:2/(1,0) or
    4:4:4/(0,0); profile is derived (0 for 420, 1 for 444 8/10-bit,
    2 for 422). planes are flat int lists at the chosen subsampling."""
    sx, sy = sub
    if (sx, sy) == (1, 1):
        profile, base_fmt = 0, AOM_IMG_FMT_I420
    elif (sx, sy) == (0, 0):
        profile, base_fmt = 1, AOM_IMG_FMT_I444
    elif (sx, sy) == (1, 0):
        profile, base_fmt = 2, AOM_IMG_FMT_I422
    else:
        raise AssertionError(sub)
    if bit_depth == 12:
        profile = 2  # profile 2 carries 12-bit at every subsampling
    hbd = bit_depth > 8
    fmt = base_fmt | (AOM_IMG_FMT_HIGHBITDEPTH if hbd else 0)
    cfg = EncCfg()
    cfg.set_u32(0, usage)
    cfg.setup(w, h, min_q, max_q)
    cfg.set_u32(cfg.off_w - 4, profile)  # g_profile directly before g_w
    if hbd:
        u = _u32s(cfg.buf.raw)
        bd_off = cfg.off_timebase - 8
        assert u[bd_off // 4] == 8 and u[bd_off // 4 + 1] == 8
        cfg.set_u32(bd_off, bit_depth)
        cfg.set_u32(bd_off + 4, bit_depth)
    ctx = ctypes.create_string_buffer(256)
    ok = False
    for abi in [25] + list(range(3, 40)):
        rc = aom.aom_codec_enc_init_ver(ctx, cfg.iface, cfg.buf,
                                        AOM_CODEC_USE_HIGHBITDEPTH if hbd else 0, abi)
        if rc == 0:
            ok = True
            break
    assert ok, "gen enc init failed"
    for cid, val in controls:
        rc = aom.aom_codec_control(ctx, cid, ctypes.c_int(val))
        assert rc == 0, ("control", cid, val, rc)
    img = aom.aom_img_alloc(None, fmt, w, h, 32)
    assert img
    raw = ctypes.string_at(img, 160)
    qw = struct.unpack('<20Q', raw)
    pi = None
    for i in range(len(qw) - 2):
        a, b, c = qw[i], qw[i + 1], qw[i + 2]
        if a and b and c and a < b < c and (b - a) < (1 << 32) and (c - b) < (1 << 32):
            pi = i
            break
    assert pi is not None
    py, pu, pv = qw[pi], qw[pi + 1], qw[pi + 2]
    st = struct.unpack_from('<4i', raw, (pi + 3) * 8)
    sy_b, su_b = st[0], st[1]
    cw, ch = (w + sx) >> sx, (h + sy) >> sy
    nb = 2 if hbd else 1
    assert sy_b >= nb * w and su_b >= nb * cw, (sy_b, su_b)
    def put(ptr, stride, vals, ww, hh):
        fmtch = 'H' if hbd else 'B'
        for r in range(hh):
            ctypes.memmove(ptr + r * stride,
                           struct.pack('<%d%s' % (ww, fmtch), *vals[r * ww:(r + 1) * ww]), nb * ww)
    y, uu, vv = planes
    put(py, sy_b, y, w, h)
    put(pu, su_b, uu, cw, ch)
    put(pv, su_b, vv, cw, ch)
    out = b''
    for img_arg in (img, None):
        rc = aom.aom_codec_encode(ctx, img_arg, 0, 1, 0)
        assert rc == 0, rc
        it = ctypes.c_void_p(None)
        while True:
            pkt = aom.aom_codec_get_cx_data(ctx, ctypes.byref(it))
            if not pkt:
                break
            kind, = struct.unpack_from('<i', ctypes.string_at(pkt, 24), 0)
            if kind == 0:
                buf_ptr, sz = struct.unpack_from('<QQ', ctypes.string_at(pkt, 24), 8)
                out += ctypes.string_at(buf_ptr, sz)
    aom.aom_codec_destroy(ctx)
    aom.aom_img_free(ctypes.c_void_p(img))
    assert out, "no encoded output"
    return out
