"""One profiling tool for nerfies_tpu: step / render / dispatch / xplane.

Replaces the ad-hoc profile_tpu*.py / profile_render*.py /
profile_dispatch.py scripts with one entry point:

  # Train-step timing at the bench workload (variant flags below):
  python scripts/profile.py step --batch_size 6144 --steps 10
  python scripts/profile.py step --elastic median --no-bfloat16

  # Capture an XLA trace of the steady-state step, then summarize it:
  python scripts/profile.py step --trace_dir /tmp/trace
  python scripts/profile.py xplane /tmp/trace/plugins/profile/*/*.xplane.pb

  # Full-image render throughput / raw dispatch overhead:
  python scripts/profile.py render --render_size 384 --chunk 8192
  python scripts/profile.py dispatch

All modes use the persistent compilation cache (.jax_tpu_cache) so
repeat runs of an already-compiled variant start in seconds.
"""

import argparse
import glob
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def sync(tree):
  # axon's block_until_ready returns early; device_get is the only fence.
  for leaf in jax.tree.leaves(tree):
    np.asarray(jax.device_get(leaf))


# ---------------------------------------------------------------- step

def run_step(args):
  import bench as B
  from nerfies_tpu import configs
  from nerfies_tpu import training
  from nerfies_tpu.models import nerf
  from nerfies_tpu.parallel import mesh as mesh_lib

  model_config = B.model_config(use_bfloat16=args.bfloat16,
                                use_fused_mlp=args.fused)
  if args.preset == 'fullhd':
    # configs/gpu_fullhd.gin: 256+256 samples, 10 point freqs, batch 4096.
    model_config.num_coarse_samples = 256
    model_config.num_fine_samples = 256
    model_config.num_nerf_point_freqs = 10
    if args.batch_size == 6144:
      args.batch_size = 4096
  if args.warp_kwargs:
    kwargs = dict(model_config.warp_kwargs)
    for pair in args.warp_kwargs.split(','):
      k, v = pair.split('=')
      kwargs[k] = {'true': True, 'false': False}.get(v.lower(), v)
    model_config.warp_kwargs = kwargs
  use_elastic = args.elastic != 'off'
  train_config = configs.TrainConfig(
      batch_size=args.batch_size,
      use_elastic_loss=use_elastic,
      elastic_reduce_method=args.elastic if use_elastic else 'weight',
      use_background_loss=args.background)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), model_config, batch_size=args.batch_size,
      appearance_ids=tuple(range(16)), camera_ids=(0, 1),
      warp_ids=tuple(range(16)), near=0.1, far=2.0,
      use_warp_jacobian=use_elastic and args.elastic != 'median',
      use_weights=use_elastic)
  mesh = mesh_lib.create_mesh()
  step_fn = training.compile_train_step(model, train_config, mesh)
  state = jax.device_put(
      training.create_train_state(params, warp_alpha=6.0),
      mesh_lib.replicated_sharding(mesh))
  sp = training.ScalarParams(learning_rate=1e-3, elastic_loss_weight=1e-3,
                             background_loss_weight=1.0)
  rng = jax.random.PRNGKey(0)
  batch = B.fake_batch(args.batch_size)
  if not args.background:
    batch.pop('background_points')

  t0 = time.perf_counter()
  state, stats, _ = step_fn(rng, state, dict(batch), sp)
  sync(stats)
  print(f'first step (compile): {time.perf_counter() - t0:.1f}s', flush=True)

  def run(n, state):
    stats = None
    for i in range(n):
      state, stats, _ = step_fn(jax.random.fold_in(rng, i), state,
                                dict(batch), sp)
    sync(stats)
    return state, stats

  state, _ = run(2, state)  # warm
  if args.trace_dir:
    with jax.profiler.trace(args.trace_dir):
      state, stats = run(args.steps, state)
  else:
    t0 = time.perf_counter()
    state, stats = run(args.steps, state)
    dt = (time.perf_counter() - t0) / args.steps
    print(f'steady: {dt * 1000:.1f} ms/step -> '
          f'{args.batch_size / dt:.0f} rays/s, '
          f'loss={float(jax.device_get(stats["fine"]["loss/rgb"])):.4f}',
          flush=True)
  if args.trace_dir:
    pbs = glob.glob(f'{args.trace_dir}/plugins/profile/*/*.xplane.pb')
    print(f'trace written; summarize with:\n'
          f'  python scripts/profile.py xplane {pbs[0] if pbs else "<pb>"}')


# -------------------------------------------------------------- render

def run_render(args):
  import bench as B
  from nerfies_tpu import evaluation
  from nerfies_tpu import training
  from nerfies_tpu.models import nerf
  from nerfies_tpu.parallel import mesh as mesh_lib

  config = B.model_config(use_bfloat16=args.bfloat16,
                          use_stratified_sampling=False)
  model, params = nerf.construct_nerf(
      jax.random.PRNGKey(0), config, batch_size=8192,
      appearance_ids=tuple(range(16)), camera_ids=(0, 1),
      warp_ids=tuple(range(16)), near=0.1, far=2.0)
  state = training.create_train_state(params, warp_alpha=6.0)
  mesh = mesh_lib.create_mesh()
  h = w = args.render_size
  rng = np.random.RandomState(0)
  d = rng.randn(h, w, 3).astype(np.float32)
  d /= np.linalg.norm(d, axis=-1, keepdims=True)
  rays = {
      'origins': np.zeros((h, w, 3), np.float32),
      'directions': d,
      'metadata': {
          'warp': np.zeros((h, w, 1), np.uint32),
          'camera': np.zeros((h, w, 1), np.uint32),
          'appearance': np.zeros((h, w, 1), np.uint32),
          'time': np.zeros((h, w, 1), np.float32),
      },
  }
  render_fn = evaluation.make_render_fn(model, mesh)
  t0 = time.perf_counter()
  evaluation.render_image(state, rays, render_fn, chunk=args.chunk)
  print(f'first render (compile): {time.perf_counter() - t0:.1f}s',
        flush=True)
  if args.trace_dir:
    with jax.profiler.trace(args.trace_dir):
      out = evaluation.render_image(state, rays, render_fn,
                                    chunk=args.chunk)
  else:
    out = evaluation.render_image(state, rays, render_fn, chunk=args.chunk)
  print(f'render {h}x{w}: {out["render_time"]:.2f}s = '
        f'{out["rays_per_sec"]:.0f} rays/s', flush=True)


# -------------------------------------------------------------- layout

def run_layout(args):
  """Micro-bench: posenc -> warp-trunk-like matmul stack, layout variants.

  Isolates the slow (16-29 TF/s in the round-2 profile) warp/skip
  matmuls: is the cost the posenc producer's layout, the narrow K, or
  the 3-D dot shape? Times forward+backward of a 6-layer trunk stack.
  """
  from nerfies_tpu.ops import encoding

  B, S, W, DEPTH, F, META = args.batch_size, 128, 128, 6, 6, 8
  pe_dim = 3 + 2 * F * 3

  def stack_fwd(pe, meta, kernels, skips=(4,)):
    h = None
    inputs = [pe, meta]
    ki = 0
    for i in range(DEPTH):
      layer_inputs = inputs if h is None else ([h] + inputs if i in skips
                                               else [h])
      out = None
      for x in layer_inputs:
        k = kernels[ki]; ki += 1
        out = x @ k if out is None else out + x @ k
      h = jax.nn.relu(out)
    return h

  def make_kernels(key, pdim):
    dims = [(pdim, W), (META, W)]
    for i in range(1, DEPTH):
      dims += [(W, W), (pdim, W), (META, W)] if i == 4 else [(W, W)]
    keys = jax.random.split(key, len(dims))
    return [jax.random.normal(k, d, jnp.bfloat16) * 0.05
            for k, d in zip(keys, dims)]

  key = jax.random.PRNGKey(0)
  pts = jax.random.normal(key, (B, S, 3), jnp.float32)
  meta = jax.random.normal(key, (B, 1, META), jnp.bfloat16)
  kernels = make_kernels(key, pe_dim)
  kernels48 = make_kernels(key, 48)

  def v0(pts, meta, kernels):  # current model shape: posenc -> 3D dots
    pe = encoding.posenc(pts, num_freqs=F).astype(jnp.bfloat16)
    return stack_fwd(pe, meta, kernels)

  def v1(pts, meta, kernels):  # flatten samples: 2D dots + per-ray adds
    pe = encoding.posenc(pts, num_freqs=F).astype(jnp.bfloat16)
    pe2 = pe.reshape(B * S, pe_dim)
    h = None
    ki = 0
    for i in range(DEPTH):
      if h is None:
        out = (pe2 @ kernels[0]).reshape(B, S, W) + meta @ kernels[1]
        ki = 2
      elif i == 4:
        k_h, k_pe, k_meta = kernels[ki:ki + 3]; ki += 3
        out = ((h.reshape(B * S, W) @ k_h + pe2 @ k_pe)
               .reshape(B, S, W) + meta @ k_meta)
      else:
        k_h = kernels[ki]; ki += 1
        out = (h.reshape(B * S, W) @ k_h).reshape(B, S, W)
      h = jax.nn.relu(out)
    return h

  def v2(pts, meta, kernels):  # posenc zero-padded to 48 channels
    pe = encoding.posenc(pts, num_freqs=F).astype(jnp.bfloat16)
    pe = jnp.pad(pe, ((0, 0), (0, 0), (0, 48 - pe_dim)))
    return stack_fwd(pe, meta, kernels)

  def bench(name, fwd, kern, n=20):
    def loss(pts, meta, kernels):
      return (fwd(pts, meta, kernels) ** 2).mean()
    f = jax.jit(jax.value_and_grad(loss, argnums=2))
    out = f(pts, meta, kern); sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
      out = f(pts, meta, kern)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    flops_fwd = 2 * B * S * ((pe_dim + META) * W + 4 * W * W
                             + (W + pe_dim + META) * W)
    print(f'{name}: {dt * 1e3:7.2f} ms  ~{3 * flops_fwd / dt / 1e12:6.1f} '
          f'TF/s (fwd+bwd est)', flush=True)

  bench('v0 posenc->3D dots   ', v0, kernels)
  bench('v1 flatten->2D dots  ', v1, kernels)
  bench('v2 pad-to-48->3D dots', v2, kernels48)


# ------------------------------------------------------------ dispatch

def run_dispatch(args):
  del args
  x = jnp.zeros((8, 128), jnp.float32)
  f = jax.jit(lambda x: x + 1.0)
  sync(f(x))
  n = 20
  t0 = time.perf_counter()
  for _ in range(n):
    sync(f(x))
  print(f'sync dispatch round-trip: '
        f'{(time.perf_counter() - t0) / n * 1000:.1f} ms', flush=True)
  t0 = time.perf_counter()
  y = x
  for _ in range(n):
    y = f(y)
  sync(y)
  print(f'async chain of {n}, one sync: '
        f'{(time.perf_counter() - t0) / n * 1000:.1f} ms/dispatch',
        flush=True)


# -------------------------------------------------------------- xplane

def run_xplane(path, top=20):
  """TPU device time by HLO category / op from a jax.profiler xplane.pb.

  Parses the profile directly with TF's xplane proto (the tensorboard
  profile plugin's converter is incompatible with the installed TF).
  """
  import collections
  from tensorflow.tsl.profiler.protobuf import xplane_pb2

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


def main():
  parser = argparse.ArgumentParser(description=__doc__)
  sub = parser.add_subparsers(dest='mode', required=True)

  p_step = sub.add_parser('step')
  p_step.add_argument('--batch_size', type=int, default=6144)
  p_step.add_argument('--preset', choices=['quarterhd', 'fullhd'],
                      default='quarterhd')
  p_step.add_argument('--steps', type=int, default=10)
  p_step.add_argument('--elastic', choices=['weight', 'median', 'off'],
                      default='weight')
  p_step.add_argument('--background', action=argparse.BooleanOptionalAction,
                      default=True)
  p_step.add_argument('--bfloat16', action=argparse.BooleanOptionalAction,
                      default=True)
  p_step.add_argument('--warp_kwargs', default='',
                      help='comma list k=v merged into ModelConfig.'
                           'warp_kwargs, e.g. fuse_branch_heads=false')
  p_step.add_argument('--fused', action=argparse.BooleanOptionalAction,
                      default=True,
                      help='route the step through the fused Pallas MLP '
                           'and warp kernels (ops/fused_mlp, ops/fused_warp)')
  p_step.add_argument('--trace_dir', default='')
  p_step.add_argument('--bwd_tile', type=int, default=0,
                      help='override the fused kernels\' backward row '
                           'tile (sets NERFIES_FUSED_BWD_TILE before the '
                           'kernel modules import; 0 = keep default)')

  p_render = sub.add_parser('render')
  p_render.add_argument('--render_size', type=int, default=384)
  p_render.add_argument('--chunk', type=int, default=8192)
  p_render.add_argument('--bfloat16', action=argparse.BooleanOptionalAction,
                        default=True)
  p_render.add_argument('--trace_dir', default='')

  sub.add_parser('dispatch')

  p_layout = sub.add_parser('layout')
  p_layout.add_argument('--batch_size', type=int, default=6144)

  p_x = sub.add_parser('xplane')
  p_x.add_argument('path')
  p_x.add_argument('--top', type=int, default=20)

  args = parser.parse_args()
  if getattr(args, 'bwd_tile', 0):
    import os
    os.environ['NERFIES_FUSED_BWD_TILE'] = str(args.bwd_tile)
  if args.mode == 'step':
    run_step(args)
  elif args.mode == 'render':
    run_render(args)
  elif args.mode == 'dispatch':
    run_dispatch(args)
  elif args.mode == 'layout':
    run_layout(args)
  elif args.mode == 'xplane':
    run_xplane(args.path, args.top)


if __name__ == '__main__':
  main()
