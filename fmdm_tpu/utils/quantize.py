"""
Post-training int8 quantization transform (calibration + params rewrite).

Beyond-reference subsystem — see ops/quant.py for the compute path. This
module turns a trained float params tree into a mixed tree in which the
convolutions that profit from the v5e's 2x int8 MXU rate carry
``QuantizedConvWeight`` bundles, and everything else stays float:

    model, params = build_diffusion_model(cfg, ckpt)
    qparams = quantize_model_params(model_apply, params, example_args)
    engine(qparams, ...)   # conv_nd dispatches on the weight type

Calibration runs the model's forward eagerly on CPU over one or more example
batches, recording each conv's input absmax (-> static per-tensor activation
scale) and input geometry (-> the quantize/skip policy). Static activation
scales keep the in-graph quantize a fused elementwise op — no per-call max
reductions on the TPU.

Policy defaults come from the measured shape table
(BENCHMARKS.md "int8 conv probe"): int8 wins for spatial kernels at
>= 32x32 spatial extent with >= 64 input channels; 1x1 convs and the tiny
deep-stage convs stay bf16, as do ``conv_in``/``conv_out`` (quality-sensitive
first/last layers, standard practice).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import numpy as np

import fmdm_tpu.nn.layers as _layers
from fmdm_tpu.nn.module import Params
from fmdm_tpu.ops.quant import (QuantizedConvWeight, make_quantized,
                                make_quantized_linear)


class _ConvRecord:
    __slots__ = ("kind", "absmax", "min_hw", "cin", "kernel", "calls")

    def __init__(self, kind="conv"):
        self.kind = kind
        self.absmax = 0.0
        self.min_hw = 1 << 30  # convs: min spatial extent; linears: min token count
        self.cin = 0
        self.kernel = ()
        self.calls = 0


@contextlib.contextmanager
def _record_conv_inputs(records: Dict[int, _ConvRecord]):
    """Patch the module-level conv_nd / linear_nd call sites (nn/layers.py)
    with recording wrappers keyed by the identity of the weight leaf."""
    orig = _layers.conv_nd
    orig_linear = _layers.linear_nd

    def recording_conv_nd(x, weight, bias=None, **kwargs):
        rec = records.setdefault(id(weight), _ConvRecord("conv"))
        rec.absmax = max(rec.absmax, float(jax.numpy.max(jax.numpy.abs(x))))
        rec.min_hw = min(rec.min_hw, int(min(x.shape[2:])))
        rec.cin = int(x.shape[1])
        rec.kernel = tuple(int(k) for k in weight.shape[2:])
        rec.calls += 1
        return orig(x, weight, bias, **kwargs)

    def recording_linear_nd(x, weight, bias=None):
        rec = records.setdefault(id(weight), _ConvRecord("linear"))
        rec.absmax = max(rec.absmax, float(jax.numpy.max(jax.numpy.abs(x))))
        tokens = 1
        for d in x.shape[:-1]:
            tokens *= int(d)
        rec.min_hw = min(rec.min_hw, tokens)
        rec.cin = int(x.shape[-1])
        rec.kernel = (1,)
        rec.calls += 1
        return orig_linear(x, weight, bias)

    _layers.conv_nd = recording_conv_nd
    _layers.linear_nd = recording_linear_nd
    try:
        yield
    finally:
        _layers.conv_nd = orig
        _layers.linear_nd = orig_linear


def _cpu_device():
    try:
        return jax.local_devices(backend="cpu")[0]
    except Exception:
        return None


def quantize_model_params(
    forward_fn: Callable[..., Any],
    params: Params,
    example_args: Sequence[Tuple[Any, ...]],
    *,
    min_hw: int = 32,
    min_channels: int = 64,
    skip_paths: Sequence[str] = ("conv_in", "conv_out"),
    quantize_linear: bool = False,
    linear_min_tokens: int = 1024,
    linear_min_features: int = 128,
    verbose: bool = False,
) -> Params:
    """Calibrate on ``example_args`` and return a params tree with eligible
    conv weights replaced by int8 ``QuantizedConvWeight`` bundles.

    forward_fn: called as ``forward_fn(params, *args)`` for each entry of
        ``example_args`` (a list of positional-arg tuples, e.g.
        ``[(x, t)]`` or ``[(x, t, context)]``). Run eagerly on CPU.
    params: the trained float tree (device or host).
    min_hw / min_channels: a conv is quantized only if every calibrated call
        saw input spatial extent >= min_hw and channels >= min_channels, and
        its kernel is spatial (max(k) > 1).
    skip_paths: dotted-path substrings to keep float regardless of policy.
    quantize_linear: also quantize ``nn.layers.Linear`` weights (attention
        to_q/to_k/to_v/to_out projections etc.) whose every calibrated call
        carried >= linear_min_tokens tokens and >= linear_min_features input
        features. Token gating keeps the per-sample time-embed MLPs
        (tokens == batch) float — no MXU win there, only quality risk.
    """
    host_params = jax.tree_util.tree_map(np.asarray, params)

    records: Dict[int, _ConvRecord] = {}
    cpu = _cpu_device()
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx, _record_conv_inputs(records):
        for args in example_args:
            host_args = jax.tree_util.tree_map(np.asarray, tuple(args))
            forward_fn(host_params, *host_args)

    if not records:
        raise ValueError(
            "calibration recorded no conv calls — forward_fn did not route "
            "through nn/layers.Conv (is this a conv model?)"
        )

    quantized = {"n": 0, "kept": 0}

    def _walk(node, path: str):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, value in node.items():
            sub_path = f"{path}.{name}" if path else name
            if isinstance(value, dict):
                out[name] = _walk(value, sub_path)
                continue
            rec = records.get(id(value))
            if rec is None or name != "weight":
                out[name] = value
                continue
            if rec.kind == "linear":
                eligible = (
                    quantize_linear
                    and rec.min_hw >= linear_min_tokens
                    and rec.cin >= linear_min_features
                    and not any(s in sub_path for s in skip_paths)
                )
                maker = make_quantized_linear
            else:
                eligible = (
                    rec.min_hw >= min_hw
                    and rec.cin >= min_channels
                    and max(rec.kernel, default=1) > 1
                    and not any(s in sub_path for s in skip_paths)
                )
                maker = make_quantized
            if eligible:
                out[name] = maker(value, rec.absmax)
                quantized["n"] += 1
                if verbose:
                    print(f"  int8 {rec.kind}: {sub_path}  absmax={rec.absmax:.4g} "
                          f"minhw/tokens={rec.min_hw} cin={rec.cin}")
            else:
                out[name] = value
                quantized["kept"] += 1
        return out

    qtree = _walk(host_params, "")
    if quantized["n"] == 0:
        raise ValueError(
            f"policy quantized 0 of {quantized['kept']} calibrated convs — "
            f"relax min_hw ({min_hw}) / min_channels ({min_channels})"
        )
    if verbose:
        print(f"quantized {quantized['n']} convs, kept {quantized['kept']} float")
    # Residency discipline: calibration walked a HOST tree (numpy leaves); a
    # host tree handed to a jitted sampler re-uploads every leaf on every
    # call (~110M params/batch through the TPU tunnel — measured 4x slower
    # than bf16 end-to-end before this line existed). Return device-resident
    # committed leaves; QuantizedConvWeight is a registered pytree so its
    # int8/scale children are placed too.
    return jax.device_put(qtree, jax.devices()[0])
