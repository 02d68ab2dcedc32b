"""Aggregate a jax.profiler Chrome trace by device-lane op name.

    python bench.py --device-time          # writes /tmp/dpvo_tpu_profile_vo
    python scripts/agg_trace.py /tmp/dpvo_tpu_profile_vo [n_frames]

Prints per-op totals (ms) from the device lanes, optionally divided by a
frame count. Complements bench.py's single busy-lane number with the
where-does-the-time-go breakdown.
"""
import collections
import glob
import gzip
import json
import sys


def main():
    tracedir = sys.argv[1]
    frames = float(sys.argv[2]) if len(sys.argv) > 2 else None
    paths = sorted(glob.glob(tracedir + '/plugins/profile/*/*.trace.json.gz'))
    if not paths:
        print(f'no trace under {tracedir}')
        return
    tr = json.loads(gzip.open(paths[-1]).read())
    events = tr.get('traceEvents', [])
    names = {}
    for e in events:
        if e.get('ph') == 'M' and e.get('name') == 'thread_name':
            names[(e['pid'], e['tid'])] = e['args']['name']
        if e.get('ph') == 'M' and e.get('name') == 'process_name':
            names[(e['pid'], None)] = e['args']['name']
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get('ph') != 'X':
            continue
        pname = names.get((e['pid'], None), '')
        if 'TPU' not in pname and 'device' not in pname.lower():
            continue
        tname = names.get((e['pid'], e['tid']), '')
        key = e.get('name', '?')
        agg[key] += e.get('dur', 0)
        cnt[key] += 1
        total += e.get('dur', 0)
    unit = 'ms'
    div = 1e3
    if frames:
        unit = 'ms/frame'
        div = 1e3 * frames
    print(f'device busy total: {total / div:.2f} {unit}')
    for name, dur in agg.most_common(45):
        print(f'{dur / div:9.3f} {unit}  x{cnt[name]:<5d} {name[:100]}')


if __name__ == '__main__':
    main()
