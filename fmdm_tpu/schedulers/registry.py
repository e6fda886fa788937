"""
Scheduler registry, builder and CLI alias resolution.

Mirrors the reference's pipeline helpers
(/root/reference/src/pipelines/utils.py:22-90): same registry names, same
alias table (ddpm/ddim/dpmsolver1/dpmsolver2/dpmsolver++/dpmsolversde/unipc/
flowmatch/flow_match_euler), same ctor-kwarg filtering by signature.
"""

from __future__ import annotations

import inspect
import json
from typing import Dict, Optional, Tuple

from fmdm_tpu.schedulers.base import Scheduler
from fmdm_tpu.schedulers.ddim import DDIMScheduler
from fmdm_tpu.schedulers.ddpm import DDPMScheduler
from fmdm_tpu.schedulers.dpm import DPMSolverMultistepScheduler
from fmdm_tpu.schedulers.dpm_sde import DPMSolverSDEScheduler
from fmdm_tpu.schedulers.flow_match import FlowMatchEulerDiscreteScheduler
from fmdm_tpu.schedulers.unipc import UniPCMultistepScheduler


SCHEDULER_REGISTRY: Dict[str, type] = {
    "ddpm": DDPMScheduler,
    "ddim": DDIMScheduler,
    "dpm_multistep": DPMSolverMultistepScheduler,
    "dpm_sde": DPMSolverSDEScheduler,
    "unipc": UniPCMultistepScheduler,
    "flow_match_euler": FlowMatchEulerDiscreteScheduler,
    "flowmatch": FlowMatchEulerDiscreteScheduler,
}


def resolve_conditioning_mode(value) -> Optional[str]:
    if value is None:
        return None
    value = str(value).strip().lower()
    return value if value else None


def build_scheduler(spec: Optional[Dict], training_cfg: Optional[Dict]) -> Tuple[Scheduler, int]:
    """Instantiate a scheduler from config dicts; returns (scheduler, num_inference)."""
    scheduler_cfg = dict(spec or {})
    training_cfg = dict(training_cfg or {})
    name = scheduler_cfg.get("name") or training_cfg.get("scheduler") or "ddpm"
    key = str(name).lower()
    if key not in SCHEDULER_REGISTRY:
        available = ", ".join(SCHEDULER_REGISTRY.keys())
        raise ValueError(f"Unknown scheduler '{name}'. Available: {available}")
    cls = SCHEDULER_REGISTRY[key]
    num_train_steps = int(
        scheduler_cfg.get("num_train_timesteps") or training_cfg.get("num_train_timesteps") or 1000
    )
    params = dict(scheduler_cfg.get("params", {}))
    # Filter ctor kwargs by signature like the reference (pipelines/utils.py:55-60);
    # create(**params) already swallows extras via **_unused, but mirror the
    # reference behavior for strictness-sensitive params.
    sig = inspect.signature(cls.create)
    allowed = set(sig.parameters.keys())
    if not any(p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()):
        params = {k: v for k, v in params.items() if k in allowed}
    scheduler = cls.create(num_train_timesteps=num_train_steps, **params)
    num_inference = int(
        scheduler_cfg.get("num_inference_steps")
        or training_cfg.get("num_inference_steps")
        or num_train_steps
    )
    return scheduler, num_inference


def resolve_scheduler_override(name: Optional[str]) -> Optional[Dict]:
    """Map user-facing scheduler aliases into scheduler config overrides
    (pipelines/utils.py:65-90)."""
    if not name:
        return None
    key = str(name).strip().lower()
    if not key:
        return None
    # optional query-string params: "dpmsolver++?thresholding=true,order=3"
    # (values parsed as JSON literals, bare words kept as strings) — lets the
    # CLI reach the full scheduler config surface without new flags
    extra: Dict = {}
    if "?" in key:
        key, _, qs = key.partition("?")
        for kv in filter(None, qs.split(",")):
            k, _, v = kv.partition("=")
            try:
                extra[k] = json.loads(v)
            except (json.JSONDecodeError, ValueError):
                extra[k] = v
    alias = {
        "ddpm": {"name": "ddpm"},
        "ddim": {"name": "ddim"},
        "dpmsolver1": {"name": "dpm_multistep", "params": {"solver_order": 1, "algorithm_type": "dpmsolver"}},
        "dpmsolver2": {"name": "dpm_multistep", "params": {"solver_order": 2, "algorithm_type": "dpmsolver"}},
        "dpmsolver++": {"name": "dpm_multistep", "params": {"solver_order": 2, "algorithm_type": "dpmsolver++"}},
        "dpmsolversde": {"name": "dpm_sde"},
        "unipc": {"name": "unipc"},
        "flowmatch": {"name": "flow_match_euler"},
        "flow_match_euler": {"name": "flow_match_euler"},
    }
    cfg = None
    if key in alias:
        cfg = dict(alias[key])
    elif key in SCHEDULER_REGISTRY:
        cfg = {"name": key}
    else:
        available = ", ".join(sorted(alias.keys()))
        raise ValueError(f"Unknown scheduler override '{name}'. Available: {available}")
    if extra:
        cfg["params"] = {**cfg.get("params", {}), **extra}
    return cfg


def run_self_tests() -> None:
    """Embedded self-test: registry names + alias resolution parity."""
    assert set(SCHEDULER_REGISTRY) == {
        "ddpm", "ddim", "dpm_multistep", "dpm_sde", "unipc",
        "flow_match_euler", "flowmatch",
    }
    assert resolve_scheduler_override("dpmsolver1")["params"]["solver_order"] == 1
    assert resolve_scheduler_override("dpmsolversde") == {"name": "dpm_sde"}
    q = resolve_scheduler_override("dpmsolver++?thresholding=true")
    assert q["params"]["thresholding"] is True and q["params"]["solver_order"] == 2
    assert "thresholding" not in resolve_scheduler_override("dpmsolver++").get("params", {})
    sched, n = build_scheduler({"name": "ddim"}, {"num_inference_steps": 7})
    assert n == 7
