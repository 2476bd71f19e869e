#!/usr/bin/env python3
"""Dev-time generator for the HEIF/AVIF triage fixtures.

Encodes deterministic images with the SYSTEM libheif (public, LGPL;
AV1 via libaom, HEVC via its bundled encoder) as .avif and .heic,
then reads each file back through libheif's own API to pin the golden
triage fields (width, height, alpha, luma-bit-depth) that
`sources/Heif.scala` must reproduce from its independent ISOBMFF box
walk. Only the encoded files + printed pins are committed.

Run from the repo root:  python3 tools/gen_heif_fixtures.py
"""
import ctypes, os

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'heif')

h = ctypes.CDLL("libheif.so.1")


class heif_error(ctypes.Structure):
    _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                ("message", ctypes.c_char_p)]


def setup():
    h.heif_context_alloc.restype = ctypes.c_void_p
    h.heif_context_get_encoder_for_format.restype = heif_error
    h.heif_context_get_encoder_for_format.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
    h.heif_image_create.restype = heif_error
    h.heif_image_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
    h.heif_image_add_plane.restype = heif_error
    h.heif_image_add_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int, ctypes.c_int]
    h.heif_image_get_plane.restype = ctypes.POINTER(ctypes.c_uint8)
    h.heif_image_get_plane.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                       ctypes.POINTER(ctypes.c_int)]
    h.heif_context_encode_image.restype = heif_error
    h.heif_context_encode_image.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.POINTER(ctypes.c_void_p)]
    h.heif_context_write_to_file.restype = heif_error
    h.heif_context_write_to_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    h.heif_context_read_from_file.restype = heif_error
    h.heif_context_read_from_file.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                              ctypes.c_void_p]
    h.heif_context_get_primary_image_handle.restype = heif_error
    h.heif_context_get_primary_image_handle.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)]
    h.heif_image_handle_get_width.restype = ctypes.c_int
    h.heif_image_handle_get_width.argtypes = [ctypes.c_void_p]
    h.heif_image_handle_get_height.restype = ctypes.c_int
    h.heif_image_handle_get_height.argtypes = [ctypes.c_void_p]
    h.heif_image_handle_has_alpha_channel.restype = ctypes.c_int
    h.heif_image_handle_has_alpha_channel.argtypes = [ctypes.c_void_p]
    h.heif_image_handle_get_luma_bits_per_pixel.restype = ctypes.c_int
    h.heif_image_handle_get_luma_bits_per_pixel.argtypes = [ctypes.c_void_p]
    h.heif_encoder_set_lossy_quality.restype = heif_error
    h.heif_encoder_set_lossy_quality.argtypes = [ctypes.c_void_p, ctypes.c_int]


HEIF_COLORSPACE_RGB = 1
HEIF_CHROMA_INTERLEAVED_RGB = 10
HEIF_CHROMA_INTERLEAVED_RGBA = 11
HEIF_CHANNEL_INTERLEAVED = 10
HEVC, AV1 = 1, 4


def lcg_pixels(w, hgt, channels):
    x = 42
    out = bytearray()
    for _ in range(w * hgt * channels):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((x >> 33) % 256)
    return bytes(out)


def encode(name, fmt, w, hgt, alpha, quality=60):
    ctx = h.heif_context_alloc()
    enc = ctypes.c_void_p()
    err = h.heif_context_get_encoder_for_format(ctx, fmt, ctypes.byref(enc))
    assert err.code == 0, err.message
    h.heif_encoder_set_lossy_quality(enc, quality)
    img = ctypes.c_void_p()
    chroma = HEIF_CHROMA_INTERLEAVED_RGBA if alpha else HEIF_CHROMA_INTERLEAVED_RGB
    err = h.heif_image_create(w, hgt, HEIF_COLORSPACE_RGB, chroma, ctypes.byref(img))
    assert err.code == 0, err.message
    nch = 4 if alpha else 3
    err = h.heif_image_add_plane(img, HEIF_CHANNEL_INTERLEAVED, w, hgt, 8 * nch)
    assert err.code == 0, err.message
    stride = ctypes.c_int()
    plane = h.heif_image_get_plane(img, HEIF_CHANNEL_INTERLEAVED, ctypes.byref(stride))
    pix = lcg_pixels(w, hgt, nch)
    for row in range(hgt):
        ctypes.memmove(ctypes.addressof(plane.contents) + row * stride.value,
                       pix[row * w * nch:(row + 1) * w * nch], w * nch)
    err = h.heif_context_encode_image(ctx, img, enc, None, None)
    assert err.code == 0, err.message
    path = os.path.join(OUT, name)
    err = h.heif_context_write_to_file(ctx, path.encode())
    assert err.code == 0, err.message
    return path


def pin(path):
    ctx = h.heif_context_alloc()
    err = h.heif_context_read_from_file(ctx, path.encode(), None)
    assert err.code == 0, err.message
    hd = ctypes.c_void_p()
    err = h.heif_context_get_primary_image_handle(ctx, ctypes.byref(hd))
    assert err.code == 0, err.message
    return (h.heif_image_handle_get_width(hd), h.heif_image_handle_get_height(hd),
            h.heif_image_handle_has_alpha_channel(hd),
            h.heif_image_handle_get_luma_bits_per_pixel(hd))


def main():
    os.makedirs(OUT, exist_ok=True)
    setup()
    cases = [
        ('rgb_64x48.avif', AV1, 64, 48, False),
        ('alpha_32x32.avif', AV1, 32, 32, True),
        ('odd_33x17.avif', AV1, 33, 17, False),
        ('rgb_64x48.heic', HEVC, 64, 48, False),
        ('alpha_32x32.heic', HEVC, 32, 32, True),
    ]
    for name, fmt, w, hgt, alpha in cases:
        path = encode(name, fmt, w, hgt, alpha)
        gw, gh, ga, gb = pin(path)
        size = os.path.getsize(path)
        print(f'{name}: {size}B, libheif pins w={gw} h={gh} alpha={ga} lumabits={gb}')


if __name__ == '__main__':
    main()
