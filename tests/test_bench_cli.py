"""bench.py CLI contract smoke.

The driver runs `python bench.py` at the end of every round and records
its LAST stdout line as the round's benchmark artifact (BENCH_r*.json).
A harness crash there silently costs the whole round's numbers — round 5
caught a missing argparse flag only because it re-ran the sweep by hand —
so this test runs the real CLI (tiny workload, CPU) in a subprocess and
pins the JSON contract the driver and docs/PERFORMANCE.md rely on.
"""

import json
import os
import pathlib
import subprocess
import sys

REPO_ROOT = pathlib.Path(__file__).parent.parent


def test_bench_cli_emits_contract_json():
  env = dict(os.environ)
  env['PALLAS_AXON_POOL_IPS'] = ''  # skip the TPU plugin in subprocesses
  env['JAX_PLATFORMS'] = 'cpu'
  cmd = [
      sys.executable, str(REPO_ROOT / 'bench.py'),
      '--batch_size', '256', '--warmup_steps', '1', '--bench_steps', '2',
      '--skip_data',
      '--render_size', '32', '--render_chunks', '256', '512',
      '--render_reps', '2',
      '--no-fused', '--no-fused_warp',
  ]
  result = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                          env=env, cwd=REPO_ROOT)
  assert result.returncode == 0, result.stderr[-3000:]
  last = result.stdout.strip().splitlines()[-1]
  parsed = json.loads(last)  # the driver parses exactly this line
  for key in ('metric', 'value', 'unit', 'vs_baseline',
              'render_rays_per_sec_per_chip', 'render_headline_path',
              'render_best_chunk', 'render_chunk_sweep',
              'render_camera_rays_per_sec_per_chip'):
    assert key in parsed, f'missing {key} in bench JSON: {sorted(parsed)}'
  assert parsed['metric'] == 'train_rays_per_sec_per_chip'
  assert parsed['value'] > 0
  assert parsed['render_headline_path'] in ('render_camera',
                                            'host_rays_sweep')
  sweep = parsed['render_chunk_sweep']
  assert set(sweep) == {'256', '512'}
  # RFC-8259 clean: the artifact must survive a strict parser.
  json.loads(json.dumps(parsed, allow_nan=False))
