#!/usr/bin/env python3
"""Dev-time AV1 sequence-header bit probe.

Parses the OBU stream's sequence header (public AV1 spec 5.5) just far
enough to report the feature bits we steer with libaom control ids:
use_128x128_superblock, enable_filter_intra, enable_intra_edge_filter,
enable_superres, enable_cdef, enable_restoration. Used to DISCOVER
control ids behaviorally: set a candidate id, re-encode, and check the
corresponding seq bit flipped (the aomcx.h numbers drift between
releases, so every id is proven by its observable effect before use).
"""
import sys


class Bits:
    def __init__(self, b):
        self.b = b
        self.at = 0

    def f(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | ((self.b[self.at >> 3] >> (7 - (self.at & 7))) & 1)
            self.at += 1
        return v


def leb128(b, at):
    v = 0
    for i in range(8):
        byte = b[at]
        at += 1
        v |= (byte & 0x7F) << (7 * i)
        if not (byte & 0x80):
            break
    return v, at


def obus(data):
    at = 0
    while at < len(data):
        hdr = data[at]
        typ = (hdr >> 3) & 0xF
        ext = (hdr >> 2) & 1
        has_size = (hdr >> 1) & 1
        at += 1
        if ext:
            at += 1
        assert has_size, "obu without size field"
        size, at = leb128(data, at)
        yield typ, data[at:at + size]
        at += size


def parse_seq(payload):
    r = Bits(payload)
    out = {}
    out['seq_profile'] = r.f(3)
    out['still_picture'] = r.f(1)
    reduced = r.f(1)
    out['reduced_still_picture'] = reduced
    if reduced:
        r.f(5)  # seq_level_idx
    else:
        if r.f(1):  # timing_info_present
            raise NotImplementedError("timing_info")
        r.f(1)  # initial_display_delay_present (assume 0-delay fields absent)
        n_ops = r.f(5) + 1
        for _ in range(n_ops):
            r.f(12)  # operating_point_idc
            lvl = r.f(5)
            if lvl > 7:
                r.f(1)  # seq_tier
    wbits = r.f(4) + 1
    hbits = r.f(4) + 1
    out['max_w'] = r.f(wbits) + 1
    out['max_h'] = r.f(hbits) + 1
    if not reduced:
        if r.f(1):  # frame_id_numbers_present
            r.f(4)
            r.f(3)
    out['use_128x128_superblock'] = r.f(1)
    out['enable_filter_intra'] = r.f(1)
    out['enable_intra_edge_filter'] = r.f(1)
    if not reduced:
        r.f(1)  # enable_interintra_compound
        r.f(1)  # enable_masked_compound
        r.f(1)  # enable_warped_motion
        r.f(1)  # enable_dual_filter
        order_hint = r.f(1)
        if order_hint:
            r.f(1)  # enable_jnt_comp
            r.f(1)  # enable_ref_frame_mvs
        force_sc = 2 if r.f(1) else r.f(1)  # seq_choose_screen_content_tools
        if force_sc > 0:
            if r.f(1) == 0:  # seq_choose_integer_mv
                r.f(1)  # seq_force_integer_mv
        if order_hint:
            r.f(3)  # order_hint_bits_minus_1
    out['enable_superres'] = r.f(1)
    out['enable_cdef'] = r.f(1)
    out['enable_restoration'] = r.f(1)
    return out


def main():
    for path in sys.argv[1:]:
        data = open(path, 'rb').read()
        for typ, payload in obus(data):
            if typ == 1:  # OBU_SEQUENCE_HEADER
                print(path, parse_seq(payload))
                break


if __name__ == '__main__':
    main()
