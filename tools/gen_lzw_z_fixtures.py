#!/usr/bin/env python3
"""Dev-time generator for the .Z (Unix compress, LZW) decoder fixtures.

There is no system `compress` binary in the image, so this implements
the LZW writer from the public format description (magic 1f 9d, flags
byte = block-mode bit + maxbits, 9..16-bit codes growing with the
table, and the historical 8-code-group zero padding at every width
change / CLEAR) — and VALIDATES every emitted file through the system
`uncompress` (gzip's unlzw), which must reproduce the payload exactly.
Only then is the .Z committed; the Scala decoder must match the same
payloads byte for byte (LzwZSpec).

Run from the repo root:  python3 tools/gen_lzw_z_fixtures.py
"""
import subprocess, os, hashlib

OUT = os.path.join(os.path.dirname(__file__), '..', 'src', 'test', 'resources', 'lzw_z')


def lcg_stream(n, mod):
    x = 42
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append((x >> 33) % mod)
    return out


WORDS = ['alpha', 'beta', 'gamma', 'delta', 'epsilon',
         'zeta', 'eta', 'theta', 'iota', 'kappa']


def compress_z(data, maxbits=16, block_mode=True, clear_every=None):
    """LZW .Z writer with compress(1)'s group-padding semantics."""
    out = bytearray([0x1f, 0x9d, (0x80 if block_mode else 0) | maxbits])
    CLEAR = 256
    first_free = 257 if block_mode else 256
    bitbuf = 0
    bitcnt = 0
    body = bytearray()
    # group_start: byte offset of the last width-change boundary — the
    # 8-code groups are RELATIVE to it (compress restarts its output
    # buffer at every change; gzip's unlzw mirrors with `goto resetbuf`
    # which zeroes posbits at the change point)
    state = {'nbits': 9, 'group_start': 0}

    def flush_bits():
        nonlocal bitbuf, bitcnt
        while bitcnt >= 8:
            body.append(bitbuf & 0xff)
            bitbuf >>= 8
            bitcnt -= 8

    def pad_group():
        nonlocal bitbuf, bitcnt
        flush_bits()
        if bitcnt > 0:
            body.append(bitbuf & 0xff)
            bitbuf = 0
            bitcnt = 0
        group_bytes = state['nbits']  # nbits*8 bits = nbits bytes
        while ((len(body) - state['group_start']) % group_bytes) != 0:
            body.append(0)
        state['group_start'] = len(body)

    def emit(code):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += state['nbits']
        flush_bits()

    table = {bytes([i]): i for i in range(256)}
    next_code = first_free
    w = b''
    emitted = 0

    def post_emit_check():
        # compress(1)'s output(): AFTER putting the code bits, if
        # free_ent (entry not yet added) exceeds maxcode, pad the OLD
        # width's 8-code group and widen
        while next_code > (1 << state['nbits']) - 1 and state['nbits'] < maxbits:
            pad_group()
            state['nbits'] += 1

    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        post_emit_check()
        emitted += 1
        if next_code < (1 << maxbits):
            table[w + c] = next_code
            next_code += 1
        w = c
        if block_mode and clear_every and emitted % clear_every == 0:
            emit(CLEAR)
            pad_group()
            state['nbits'] = 9
            table = {bytes([i]): i for i in range(256)}
            next_code = first_free
            w = c
    if w:
        emit(table[w])
    flush_bits()
    if bitcnt > 0:
        body.append(bitbuf & 0xff)
    return bytes(out + body)


def payloads():
    text = ('the quick brown fox jumps over the lazy dog. ' * 20).encode()
    big = (' '.join(WORDS[i] for i in lcg_stream(60000, 10))).encode()
    yield 'small_text', text, dict()
    yield 'big_text', big, dict()                      # grows through all widths to 16
    yield 'big_12bit', big, dict(maxbits=12)           # table saturates, fixed-width tail
    yield 'big_clears', big, dict(clear_every=5000)    # CLEAR resets + re-grow
    yield 'nonblock', text, dict(block_mode=False)     # pre-block-mode files (code 256 is data)
    yield 'random_bytes', bytes(lcg_stream(5000, 256)), dict()
    yield 'runs', b'z' * 100000, dict()
    yield 'tiny', b'a', dict()
    yield 'empty', b'', dict()


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, data, kw in payloads():
        z = compress_z(data, **kw)
        back = subprocess.run(['uncompress', '-c'], input=z, check=True,
                              capture_output=True).stdout
        assert back == data, f'{name}: system uncompress disagrees ({len(back)} vs {len(data)})'
        open(os.path.join(OUT, name + '.Z'), 'wb').write(z)
        print(f'{name}: {len(data)} -> {len(z)} bytes, md5 {hashlib.md5(data).hexdigest()} '
              f'(uncompress round-trip ok)')


if __name__ == '__main__':
    main()
