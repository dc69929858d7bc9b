"""Summarize a jax.profiler xplane.pb: TPU device time by HLO category/op.

Usage:
  python scripts/parse_xplane.py /tmp/trace/plugins/profile/<ts>/<host>.xplane.pb

Parses the profile directly with TF's xplane proto (the tensorboard
profile plugin's converter is incompatible with the installed TF). Reads
the 'XLA Ops' line of the TPU device plane: per-op durations, the
hlo_category stat, and (for matmul fusions) the achieved FLOP rate.
See docs/PERFORMANCE.md for how to capture a trace on this setup.
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def summarize(path, top=20):
  xspace = xplane_pb2.XSpace()
  with open(path, 'rb') as f:
    xspace.ParseFromString(f.read())
  for plane in xspace.planes:
    if 'TPU' not in plane.name:
      continue
    md = plane.event_metadata
    stat_md = plane.stat_metadata
    for line in plane.lines:
      if line.name != 'XLA Ops':
        continue
      by_cat = collections.Counter()
      by_op = collections.Counter()
      flops = {}
      counts = collections.Counter()
      total = 0.0
      for ev in line.events:
        dur = ev.duration_ps / 1e12
        total += dur
        meta = md[ev.metadata_id]
        cat = ''
        fl = 0
        for st in list(ev.stats) + list(meta.stats):
          name = (stat_md[st.metadata_id].name
                  if st.metadata_id in stat_md else '')
          if name == 'hlo_category':
            cat = st.str_value or (stat_md[st.ref_value].name
                                   if st.ref_value in stat_md else '')
          if name == 'flops':
            fl = st.uint64_value or st.int64_value
        by_cat[cat or 'uncategorized'] += dur
        key = meta.name.split(' = ')[0]
        by_op[key] += dur
        counts[key] += 1
        flops[key] = max(flops.get(key, 0), fl)
      print(f'== {plane.name} / XLA Ops: {total * 1e3:.1f} ms total ==')
      print('-- by category --')
      for cat, dur in by_cat.most_common(12):
        print(f'  {dur * 1e3:9.2f} ms  {100 * dur / total:5.1f}%  {cat}')
      print(f'-- top {top} ops --')
      for key, dur in by_op.most_common(top):
        per_call = dur / counts[key]
        rate = flops[key] / per_call / 1e12 if per_call else 0.0
        print(f'  {dur * 1e3:9.2f} ms  {counts[key]:4d}x  '
              f'{rate:6.1f} TF/s  {key}')


if __name__ == '__main__':
  summarize(sys.argv[1], top=int(sys.argv[2]) if len(sys.argv) > 2 else 20)
