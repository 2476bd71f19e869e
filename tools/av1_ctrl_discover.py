#!/usr/bin/env python3
"""Dev-time behavioral discovery of libaom control ids.

aomcx.h enum values drift between releases, so no id is trusted until
its effect is OBSERVED: encode the same frame with the candidate id
set to two values and diff the sequence-header feature bits (parsed by
av1_seq_probe). Candidates that error out or crash are skipped — each
probe runs in a subprocess.

  python3 tools/av1_ctrl_discover.py scan 30 170   # scan id range
  python3 tools/av1_ctrl_discover.py one 58 0 1    # probe a single id
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(__file__))


def worker(cid, v):
    import av1_harness as H
    import av1_seq_probe as P
    y, u, vv = H.gradient_planes(64, 64)
    controls = [(H.AOME_SET_CPUUSED, int(os.environ.get('CPU', '6')))]
    if cid >= 0:
        controls.append((cid, v))
    obu = H.encode_av1(64, 64, (y, u, vv), controls, min_q=40, max_q=40,
                       usage=H.AOM_USAGE_GOOD_QUALITY)
    for typ, payload in P.obus(obu):
        if typ == 1:
            print(json.dumps(P.parse_seq(payload)))
            return
    print(json.dumps({}))


def probe(cid, v):
    r = subprocess.run([sys.executable, __file__, 'worker', str(cid), str(v)],
                       capture_output=True, text=True, timeout=60)
    if r.returncode != 0:
        return None
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main():
    mode = sys.argv[1]
    if mode == 'worker':
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    if mode == 'one':
        cid, a, b = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        print(cid, 'a:', probe(cid, a))
        print(cid, 'b:', probe(cid, b))
        return
    lo, hi = int(sys.argv[2]), int(sys.argv[3])
    base = probe(-1, 0)
    print('base:', base)
    for cid in range(lo, hi + 1):
        r0 = probe(cid, 0)
        r1 = probe(cid, 1)
        if r0 is None and r1 is None:
            continue
        diffs = []
        for k in (base or {}):
            v0 = (r0 or {}).get(k)
            v1 = (r1 or {}).get(k)
            if v0 != v1 or (v1 is not None and v1 != base.get(k)):
                diffs.append((k, base.get(k), v0, v1))
        if diffs:
            print(cid, diffs)


if __name__ == '__main__':
    main()
