"""
Per-strategy collective signatures from compiled HLO (VERDICT r4 #7).

Each parallel strategy must compile to a characteristic set of XLA
collectives; a resharding regression (an accidentally replicated weight, a
grad sync that stops happening, a ring that stops ppermuting) changes the
signature and fails here — without needing multi-chip hardware. Uses the
same leg builders as scripts/collective_accounting.py, compiled on the
8-device virtual CPU mesh.

Measured baseline (tiny UNet, 8 devices — scripts/collective_accounting.py,
commit introducing this file):
  dp:      all-reduce x2 (grad tree + loss scalars), ~180 KB — nothing else
  dp_tp:   all-gather + all-reduce + collective-permute (+all-to-all reshards)
  fsdp:    all-gather x~185 (per-layer weight gathers fwd+bwd), small ARs
  dp_sp:   collective-permute x16 (ring attention hops) + DP grad all-reduce
  tp_fsdp: both families composed
"""

import numpy as np
import pytest

import jax

from fmdm_tpu.parallel.hlo_stats import (collective_summary,
                                         ici_bytes_per_device,
                                         parse_collectives)


@pytest.fixture(scope="module")
def leg_collectives():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    from collective_accounting import LEGS, compiled_hlo_for_leg

    out = {}
    for leg in LEGS:
        out[leg] = parse_collectives(compiled_hlo_for_leg(leg))
    return out


@pytest.fixture(scope="module")
def param_bytes():
    from collective_accounting import TINY_UNET
    from fmdm_tpu.models.factories import DiffusionUNetFactory

    model = DiffusionUNetFactory().build(TINY_UNET, conditioning="concatenate",
                                         channels=1)
    params = model.init(jax.random.PRNGKey(0))
    return sum(int(np.prod(l.shape)) * 4 for l in jax.tree_util.tree_leaves(params))


def test_dp_signature_is_grad_allreduce_only(leg_collectives, param_bytes):
    """Pure DP: the ONLY cross-device traffic is the gradient all-reduce
    (plus the loss/count scalar reduction). No weight gathers, no ring."""
    cols = leg_collectives["dp"]
    kinds = {c["kind"] for c in cols}
    assert kinds == {"all-reduce"}, kinds
    ar_bytes = sum(c["bytes"] for c in cols)
    # the grad tree is f32 the size of the params; scalars add a few bytes
    assert param_bytes <= ar_bytes <= param_bytes * 1.1 + 4096, \
        (ar_bytes, param_bytes)


def test_fsdp_signature_has_weight_gathers(leg_collectives, param_bytes):
    """FSDP: per-layer weight all-gathers must appear (forward + backward
    re-gather), totaling at least the full parameter footprint; no ring
    permutes."""
    cols = leg_collectives["fsdp"]
    kinds = {c["kind"] for c in cols}
    assert "all-gather" in kinds
    assert "collective-permute" not in kinds
    ag_bytes = sum(c["bytes"] for c in cols if c["kind"] == "all-gather")
    ag_count = sum(1 for c in cols if c["kind"] == "all-gather")
    assert ag_bytes >= param_bytes, (ag_bytes, param_bytes)
    assert ag_count >= 20  # per-tensor gathers, not one fused blob


def test_dp_tp_signature_has_activation_reductions(leg_collectives):
    """DP x TP: tensor-parallel matmuls/convs force activation all-reduces
    beyond the DP grad sync, and weight shards are gathered."""
    cols = leg_collectives["dp_tp"]
    kinds = {c["kind"] for c in cols}
    assert "all-reduce" in kinds and "all-gather" in kinds
    ar_count = sum(1 for c in cols if c["kind"] == "all-reduce")
    assert ar_count > 2  # strictly more reduction points than pure DP's 2


def test_dp_sp_signature_has_ring_permutes(leg_collectives):
    """DP x SP: the ring attention must lower to collective-permute hops
    (K/V rotation), alongside the DP grad all-reduce."""
    cols = leg_collectives["dp_sp"]
    kinds = {c["kind"] for c in cols}
    assert "collective-permute" in kinds, kinds
    assert "all-reduce" in kinds
    cp_count = sum(1 for c in cols if c["kind"] == "collective-permute")
    # fwd + bwd rings, >= (sp-1) hops each, across attention blocks
    assert cp_count >= 4, cp_count


def test_tp_fsdp_composes_both_signatures(leg_collectives):
    cols = leg_collectives["tp_fsdp"]
    kinds = {c["kind"] for c in cols}
    assert {"all-gather", "all-reduce", "collective-permute"} <= kinds


def test_ici_model_orders_strategies_sensibly(leg_collectives):
    """Modeled per-device ICI traffic: DP must be the cheapest signature on
    this tiny model (weight traffic dwarfs its one grad all-reduce in every
    other strategy); the TP-containing legs must cost more than pure FSDP."""
    ici = {leg: ici_bytes_per_device(cols)
           for leg, cols in leg_collectives.items()}
    assert ici["dp"] > 0
    assert ici["dp"] == min(ici.values()), ici
    assert ici["dp_tp"] > ici["fsdp"], ici
    assert ici["tp_fsdp"] >= ici["dp_tp"] * 0.8, ici  # composition adds, not removes


def test_hlo_stats_self_tests():
    from fmdm_tpu.parallel.hlo_stats import run_self_tests

    run_self_tests()
