"""Fused warp-trunk Pallas kernels: primal + Jacobian tangents, one pass.

The elastic regularizer needs the warp field's spatial Jacobian at every
sample: under autodiff that is one primal pass plus three `jax.linearize`
tangent passes through the 128-wide warp MLP, and a backward pass through
all four — ~12 HBM-bound traversals of the same small weight matrices,
profiled at 29-59 TF/s under XLA's per-layer schedule (docs/SCALING.md).

These kernels run ALL directions per VMEM row tile with the weights
resident: the forward computes the primal chain and the three tangent
chains (tangent propagation reuses the primal's ReLU masks — the exact
`jax.linearize` semantics, since d(relu)/dx = 1[x>0] and the mask's own
derivative is zero almost everywhere, which is also what autodiff uses),
and the custom VJP recomputes activations tile-wise and accumulates f32
weight gradients across the grid, exactly like
`fused_mlp.nerf_mlp_train`.

Second-order correctness: the loss differentiates THROUGH the Jacobian,
so the backward of the tangent chains must be exact. With ReLU trunks
the tangent chain is linear in (tangents, weights) given the masks, and
the masks' parameter-derivative is zero a.e. — the VJP below implements
exactly that, and is pinned against `jax.grad` through
`jax.linearize` of the flax field in tests/test_fused_warp.py.

The per-ray metadata embedding enters as an (N, F) operand consumed at
layer 0 and each skip layer (the SplitDense rows beyond the PE rows);
its weight-block gradients accumulate in-kernel and its own cotangent
(d_embed) is returned for the GLO table.

Static `n_tangents` (0 for the plain warp of the fine level, 3 for the
Jacobian warp of the coarse level) and `need_dx` (False when the input
encodings carry no parameter dependence — the coarse level under both
sampling modes — which skips three (N, C) f32 cotangent writes).
"""

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfies_tpu.ops.fused_mlp import (_BWD_TILE, _dot, _dot_at, _dot_t,
                                       _pad_last, _pad_rows, _wrow)


def _pack(params: dict, c_in: int, f_embed: int, trunk_depth: int,
          skips: Tuple[int, ...]):
  """Warp-trunk params -> flat bf16 operand list + name metadata.

  `params` = {'trunk': {'hidden_i': {kernel, bias}},
              'head': {'logit': {kernel, bias}}} with SplitDense row
  order [prev | pe | embed] (layer 0: [pe | embed]).
  """
  c_pad = 128 * ((c_in + 127) // 128)
  trunk = params['trunk']
  width = trunk['hidden_0']['kernel'].shape[1]
  head = params['head']['logit']
  out_ch = head['kernel'].shape[1]

  ops, names = [], []

  def add(name, arr):
    ops.append(arr.astype(jnp.bfloat16))
    names.append(name)

  for i in range(trunk_depth):
    k = trunk[f'hidden_{i}']['kernel']
    if i == 0:
      add('w0', _pad_rows(k[:c_in], c_pad))
      add('we0', k[c_in:c_in + f_embed])
    elif i in skips:
      add(f'w{i}', k[:width])
      add(f'wx{i}', _pad_rows(k[width:width + c_in], c_pad))
      add(f'we{i}', k[width + c_in:width + c_in + f_embed])
    else:
      add(f'w{i}', k)
    add(f'b{i}', _wrow(trunk[f'hidden_{i}']['bias']))
  add('wh', _pad_last(head['kernel'], 8))
  add('bh', _wrow(_pad_last(head['bias'], 8)))
  meta = {'c_in': c_in, 'c_pad': c_pad, 'width': width,
          'f_embed': f_embed, 'out_ch': out_ch,
          'trunk_depth': trunk_depth, 'skips': tuple(skips),
          'names': names}
  return ops, meta


def _fwd_tile(xt, et, tts, w, meta, save_acts=False):
  """Primal + tangent chains on one tile (trace-time python).

  xt (tile, c_pad), et (tile, F), tts: list of tangent tiles.
  Returns (out, jouts, acts).
  """
  names = meta['names']
  get = lambda n: w[names.index(n)][:]
  acts = {}
  h, ths = None, [None] * len(tts)
  for i in range(meta['trunk_depth']):
    if i == 0:
      acc = _dot(xt, get('w0')) + _dot(et, get('we0'))
      taccs = [_dot(t, get('w0')) for t in tts]
    elif i in meta['skips']:
      acc = (_dot(h, get(f'w{i}')) + _dot(xt, get(f'wx{i}'))
             + _dot(et, get(f'we{i}')))
      taccs = [_dot(ths[j], get(f'w{i}')) + _dot(tts[j], get(f'wx{i}'))
               for j in range(len(tts))]
    else:
      acc = _dot(h, get(f'w{i}'))
      taccs = [_dot(ths[j], get(f'w{i}')) for j in range(len(tts))]
    acc = acc + get(f'b{i}').astype(jnp.float32)
    # ReLU + mask in f32 (Mosaic rejects cmpf on packed bf16 vectors).
    mask = (acc > 0.0)
    h = jnp.where(mask, acc, 0.0).astype(xt.dtype)
    ths = [(t * mask).astype(xt.dtype) for t in taccs]
    if save_acts:
      acts[f'h{i}'] = h
      for j, t in enumerate(ths):
        acts[f't{j}h{i}'] = t
  out = _dot(h, get('wh')) + get('bh').astype(jnp.float32)
  jouts = [_dot(t, get('wh')) for t in ths]
  return out, jouts, acts


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def warp_mlp_train(x, embed, tangents, params, trunk_depth, skips,
                   need_dx=True, interpret=False):
  """Fused warp trunk + head with n in {0, 3} tangent chains.

  Args:
    x: (N, C) PE rows (any float dtype; used in bf16).
    embed: (N, F) per-row metadata embeddings.
    tangents: tuple of 0 or 3 (N, C) tangent encodings (the posenc JVP
      columns d pe / d x_j).
    params: {'trunk': ..., 'head': {'logit': ...}} (see _pack).
    trunk_depth / skips / need_dx / interpret: static.

  Returns:
    (out (N, 8) f32, jouts: tuple of len(tangents) (N, 8) f32) — the
    head output and its directional derivatives (first `out_ch` columns
    meaningful).
  """
  return _warp_fwd(x, embed, tangents, params, trunk_depth, skips,
                   need_dx, interpret)[0]


def _warp_fwd(x, embed, tangents, params, trunk_depth, skips, need_dx,
              interpret):
  n, c_in = x.shape
  f_embed = embed.shape[1]
  ops, meta = _pack(params, c_in, f_embed, trunk_depth, skips)
  c_pad = meta['c_pad']
  dtype = jnp.bfloat16

  xp = _pad_last(x, c_pad).astype(dtype)
  ep = embed.astype(dtype)
  tps = [_pad_last(t, c_pad).astype(dtype) for t in tangents]

  tile = min(1024, n)
  pad_n = (-n) % tile
  if pad_n:
    xp = jnp.pad(xp, ((0, pad_n), (0, 0)))
    ep = jnp.pad(ep, ((0, pad_n), (0, 0)))
    tps = [jnp.pad(t, ((0, pad_n), (0, 0))) for t in tps]
  n_padded = n + pad_n
  nt = len(tps)

  def kernel(*refs):
    x_ref, e_ref = refs[0], refs[1]
    t_refs = refs[2:2 + nt]
    w_refs = refs[2 + nt:2 + nt + len(ops)]
    out_refs = refs[2 + nt + len(ops):]
    out, jouts, _ = _fwd_tile(x_ref[:], e_ref[:],
                              [t[:] for t in t_refs], w_refs, meta)
    out_refs[0][:] = out
    for j in range(nt):
      out_refs[1 + j][:] = jouts[j]

  row = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

  in_specs = [row(c_pad), row(f_embed)] + [row(c_pad)] * nt
  operands = [xp, ep] + tps
  for wop in ops:
    in_specs.append(const(wop.shape))
    operands.append(wop)

  out_shapes = [jax.ShapeDtypeStruct((n_padded, 8), jnp.float32)
                for _ in range(1 + nt)]
  out_specs = [row(8)] * (1 + nt)

  outs = pl.pallas_call(
      kernel,
      out_shape=out_shapes,
      grid=(n_padded // tile,),
      in_specs=in_specs,
      out_specs=out_specs,
      interpret=interpret,
  )(*operands)
  out = outs[0][:n]
  jouts = tuple(o[:n] for o in outs[1:])
  return (out, jouts), (x, embed, tangents, params)


def _warp_bwd(trunk_depth, skips, need_dx, interpret, residuals, grads):
  x, embed, tangents, params = residuals
  g_out, g_jouts = grads
  n, c_in = x.shape
  f_embed = embed.shape[1]
  ops, meta = _pack(params, c_in, f_embed, trunk_depth, skips)
  c_pad = meta['c_pad']
  names = meta['names']
  dtype = jnp.bfloat16
  nt = len(tangents)

  xp = _pad_last(x, c_pad).astype(dtype)
  ep = embed.astype(dtype)
  tps = [_pad_last(t, c_pad).astype(dtype) for t in tangents]
  g_out = g_out.astype(jnp.float32)
  g_jouts = [g.astype(jnp.float32) for g in g_jouts]

  tile = min(_BWD_TILE, n)
  pad_n = (-n) % tile
  if pad_n:
    pad2 = lambda a: jnp.pad(a, ((0, pad_n), (0, 0)))
    xp, ep = pad2(xp), pad2(ep)
    tps = [pad2(t) for t in tps]
    g_out = pad2(g_out)
    g_jouts = [pad2(g) for g in g_jouts]
  n_padded = n + pad_n

  # dx outputs: x cotangent + one per tangent (only when requested).
  n_dx = (1 + nt) if need_dx else 0

  def kernel(*refs):
    idx = 0
    x_ref = refs[idx]; idx += 1
    e_ref = refs[idx]; idx += 1
    t_refs = refs[idx:idx + nt]; idx += nt
    go_ref = refs[idx]; idx += 1
    gj_refs = refs[idx:idx + nt]; idx += nt
    w_refs = refs[idx:idx + len(ops)]; idx += len(ops)
    out_refs = refs[idx:]
    de_ref = out_refs[0]
    dx_refs = out_refs[1:1 + n_dx]
    dw_refs = out_refs[1 + n_dx:]

    get = lambda nm: w_refs[names.index(nm)][:]
    xt, et = x_ref[:], e_ref[:]
    tts = [t[:] for t in t_refs]
    _, _, acts = _fwd_tile(xt, et, tts, w_refs, meta, save_acts=True)

    step0 = pl.program_id(0) == 0

    def acc_dw(nm, val):
      ref = dw_refs[names.index(nm)]

      @pl.when(step0)
      def _():
        ref[:] = val

      @pl.when(jnp.logical_not(step0))
      def _():
        ref[:] = ref[:] + val

    go = go_ref[:].astype(dtype)
    gjs = [g[:].astype(dtype) for g in gj_refs]

    last = trunk_depth - 1
    h_l = acts[f'h{last}']
    dwh = _dot_at(h_l, go)
    for j in range(nt):
      dwh = dwh + _dot_at(acts[f't{j}h{last}'], gjs[j])
    acc_dw('wh', dwh)
    acc_dw('bh', jnp.sum(go.astype(jnp.float32), axis=0, keepdims=True))

    g_h = _dot_t(go, get('wh')).astype(dtype)
    g_ts = [_dot_t(g, get('wh')).astype(dtype) for g in gjs]
    g_e = jnp.zeros((xt.shape[0], f_embed), jnp.float32)
    if need_dx:
      g_x = jnp.zeros((xt.shape[0], c_pad), jnp.float32)
      g_txs = [jnp.zeros((xt.shape[0], c_pad), jnp.float32)
               for _ in range(nt)]

    for i in range(trunk_depth - 1, -1, -1):
      mask = (acts[f'h{i}'].astype(jnp.float32) > 0.0)
      g_pre = (g_h.astype(jnp.float32) * mask).astype(dtype)
      g_tpres = [(g_ts[j].astype(jnp.float32) * mask).astype(dtype)
                 for j in range(nt)]
      src = xt if i == 0 else acts[f'h{i - 1}']
      dw = _dot_at(src, g_pre)
      for j in range(nt):
        tsrc = tts[j] if i == 0 else acts[f't{j}h{i - 1}']
        dw = dw + _dot_at(tsrc, g_tpres[j])
      acc_dw(f'w{i}', dw)
      acc_dw(f'b{i}', jnp.sum(g_pre.astype(jnp.float32), axis=0,
                              keepdims=True))
      if i in meta['skips'] and i != 0:
        dwx = _dot_at(xt, g_pre)
        for j in range(nt):
          dwx = dwx + _dot_at(tts[j], g_tpres[j])
        acc_dw(f'wx{i}', dwx)
        acc_dw(f'we{i}', _dot_at(et, g_pre))
        g_e = g_e + _dot_t(g_pre, get(f'we{i}'))
        if need_dx:
          g_x = g_x + _dot_t(g_pre, get(f'wx{i}'))
          for j in range(nt):
            g_txs[j] = g_txs[j] + _dot_t(g_tpres[j], get(f'wx{i}'))
      if i == 0:
        acc_dw('we0', _dot_at(et, g_pre))
        g_e = g_e + _dot_t(g_pre, get('we0'))
        if need_dx:
          g_x = g_x + _dot_t(g_pre, get('w0'))
          for j in range(nt):
            g_txs[j] = g_txs[j] + _dot_t(g_tpres[j], get('w0'))
      else:
        g_h = _dot_t(g_pre, get(f'w{i}')).astype(dtype)
        g_ts = [_dot_t(g_tpres[j], get(f'w{i}')).astype(dtype)
                for j in range(nt)]

    de_ref[:] = g_e
    if need_dx:
      dx_refs[0][:] = g_x
      for j in range(nt):
        dx_refs[1 + j][:] = g_txs[j]

  row = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
  const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

  in_specs = ([row(c_pad), row(f_embed)] + [row(c_pad)] * nt
              + [row(8)] * (1 + nt))
  operands = [xp, ep] + tps + [g_out] + g_jouts
  for wop in ops:
    in_specs.append(const(wop.shape))
    operands.append(wop)

  out_shapes = [jax.ShapeDtypeStruct((n_padded, f_embed), jnp.float32)]
  out_specs = [row(f_embed)]
  for _ in range(n_dx):
    out_shapes.append(jax.ShapeDtypeStruct((n_padded, c_pad), jnp.float32))
    out_specs.append(row(c_pad))
  for wop in ops:
    out_shapes.append(jax.ShapeDtypeStruct(wop.shape, jnp.float32))
    out_specs.append(const(wop.shape))

  outs = pl.pallas_call(
      kernel,
      out_shape=out_shapes,
      grid=(n_padded // tile,),
      in_specs=in_specs,
      out_specs=out_specs,
      interpret=interpret,
  )(*operands)

  d_embed = outs[0][:n].astype(embed.dtype)
  if need_dx:
    d_x = outs[1][:n, :c_in].astype(x.dtype)
    d_tangents = tuple(outs[2 + j][:n, :c_in].astype(tangents[j].dtype)
                       for j in range(nt))
  else:
    d_x = jnp.zeros_like(x)
    d_tangents = tuple(jnp.zeros_like(t) for t in tangents)
  dws = dict(zip(names, outs[1 + n_dx:]))

  # Scatter weight grads back into the param-tree layout.
  trunk = params['trunk']
  width = meta['width']
  d_trunk = {}
  for i in range(trunk_depth):
    if i == 0:
      kernel_grad = jnp.concatenate(
          [dws['w0'][:c_in], dws['we0']], axis=0)
    elif i in skips:
      kernel_grad = jnp.concatenate(
          [dws[f'w{i}'], dws[f'wx{i}'][:c_in], dws[f'we{i}']], axis=0)
    else:
      kernel_grad = dws[f'w{i}']
    d_trunk[f'hidden_{i}'] = {'kernel': kernel_grad,
                              'bias': dws[f'b{i}'][0]}
  out_ch = meta['out_ch']
  d_head = {'logit': {'kernel': dws['wh'][:, :out_ch],
                      'bias': dws['bh'][0, :out_ch]}}
  dparams = {'trunk': d_trunk, 'head': d_head}
  dparams = jax.tree.map(lambda g, p: g.astype(p.dtype), dparams,
                         {'trunk': {k: dict(v) for k, v in trunk.items()},
                          'head': {'logit': dict(params['head']['logit'])}})
  return d_x, d_embed, d_tangents, dparams


warp_mlp_train.defvjp(_warp_fwd, _warp_bwd)
