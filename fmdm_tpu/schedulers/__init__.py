"""Pure-JAX schedulers composable inside jax.lax.scan (SURVEY.md §7.1.3)."""

from fmdm_tpu.schedulers.base import Scheduler
from fmdm_tpu.schedulers.ddpm import DDPMScheduler
from fmdm_tpu.schedulers.ddim import DDIMScheduler
from fmdm_tpu.schedulers.dpm import DPMSolverMultistepScheduler
from fmdm_tpu.schedulers.unipc import UniPCMultistepScheduler
from fmdm_tpu.schedulers.flow_match import FlowMatchEulerDiscreteScheduler
from fmdm_tpu.schedulers.registry import (
    DPMSolverSDEScheduler,
    SCHEDULER_REGISTRY,
    build_scheduler,
    resolve_conditioning_mode,
    resolve_scheduler_override,
)

__all__ = [
    "Scheduler",
    "DDPMScheduler",
    "DDIMScheduler",
    "DPMSolverMultistepScheduler",
    "DPMSolverSDEScheduler",
    "UniPCMultistepScheduler",
    "FlowMatchEulerDiscreteScheduler",
    "SCHEDULER_REGISTRY",
    "build_scheduler",
    "resolve_conditioning_mode",
    "resolve_scheduler_override",
]
